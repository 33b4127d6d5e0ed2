"""REST source (S5): driver-side fetch + distributed mapInPandas fetch
with an injected deterministic fake fetcher (no network in tests)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources import (
    rest,
)

SCHEMA = T.StructType(
    [
        T.StructField("milestone_id", T.LongType()),
        T.StructField("object_id", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)


def _fake_fetcher(url: str, params: dict | None = None) -> list[dict]:
    page = int(url.rsplit("/", 1)[-1])
    n = int((params or {}).get("n", 2))
    return [
        {
            "milestone_id": page * 100 + i,
            "object_id": f"c:{page}",
            "description": f"line1\nline2 p{page} i{i}",
        }
        for i in range(n)
    ]


def test_fetch_json_driver_side(spark):
    df = rest.fetch_json(
        spark, "http://api/x/7", SCHEMA, params={"n": 3}, fetcher=_fake_fetcher
    )
    rows = sorted(r["milestone_id"] for r in df.collect())
    assert rows == [700, 701, 702]
    assert df.schema == SCHEMA


def test_fetch_partitioned_distributed(spark):
    # self-contained local def, not the module-level fake: cloudpickle
    # ships closures by value, while module functions pickle by
    # reference and the test module is not importable on executors
    def fake_fetcher(url: str, params: dict | None = None) -> list[dict]:
        page = int(url.rsplit("/", 1)[-1])
        n = int((params or {}).get("n", 2))
        return [
            {
                "milestone_id": page * 100 + i,
                "object_id": f"c:{page}",
                "description": f"p{page} i{i}",
            }
            for i in range(n)
        ]

    specs = spark.createDataFrame(
        [(f"http://api/x/{p}", {"n": "2"}) for p in range(10)],
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("params", T.MapType(T.StringType(), T.StringType())),
            ]
        ),
    ).repartition(4)
    out = rest.fetch_partitioned(specs, SCHEMA, fetcher=fake_fetcher)
    assert out.count() == 20
    got = {r["milestone_id"] for r in out.collect()}
    assert got == {p * 100 + i for p in range(10) for i in range(2)}
    # rows flow through Spark (not the driver): plan contains the UDF op
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()


def test_default_fetcher_scrubs_newlines(spark):
    df = rest.fetch_json(spark, "http://api/x/1", SCHEMA, fetcher=_fake_fetcher)
    descs = [r["description"] for r in df.collect()]
    # the fake returns newlines; scrubbing is the *default* fetcher's
    # job (reference parity) — fetch_json with an injected fetcher
    # passes values through untouched
    assert all("\n" in d for d in descs)
    cleaned = df.select(
        F.regexp_replace("description", r"\n", " ").alias("d")
    ).collect()
    assert all("\n" not in r["d"] for r in cleaned)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
