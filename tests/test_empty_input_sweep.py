"""Empty-input sweep: every oracle-bearing query runs on EMPTY tables
and still hash-matches DuckDB.

The reference's cadence is a daily incremental batch
(dags/vcapital_staging/run.py:16-17) — an empty day is a legitimate
input, not an error. A 100 TB engine meets empty partitions, empty
date slices and empty filter survivors constantly; an operator that
crashes (or silently diverges from SQL semantics — global aggregates
return ONE null row on empty input, GROUP BY returns zero) on the
empty frame is wrong at scale. This is SURVEY §2 P4 (empty-input
short-circuit) promoted to a whole-surface gate.

Queries whose semantics are undefined on empty corpora (driver-side
fitted state like k-means centroids over zero vectors) are listed in
EMPTY_UNDEFINED with the reason; everything else must run AND match.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from test_oracle_tail import _canon_frame

pytestmark = pytest.mark.slow

# queries that cannot define an output on empty input: they fit
# driver-side state from the data itself and have no rows to fit on.
EMPTY_UNDEFINED: dict[str, str] = {}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA,
    )

    d = tmp_path_factory.mktemp("empty_sf")
    for name, schema in TESTDATA.items():
        spark.createDataFrame([], schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    return str(d)


@pytest.fixture(scope="module")
def duck_empty(empty_dir):
    import duckdb

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _oracle_queries() -> list[str]:
    oracles = entry_mod.oracle_sql()
    return [q for q in entry_mod.queries() if q in oracles]


@pytest.mark.parametrize("name", _oracle_queries())
def test_empty_input_matches_oracle(spark, empty_dir, duck_empty, name):
    if name in EMPTY_UNDEFINED:
        pytest.skip(f"undefined on empty input: {EMPTY_UNDEFINED[name]}")
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, empty_dir).toPandas()
    odf = duck_empty.execute(sql).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rowcount on EMPTY input spark={len(sdf)} oracle={len(odf)}"
    )
    srows = _canon_frame(sdf)
    orows = _canon_frame(odf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        raise AssertionError(f"{name}: empty-input values differ: {diffs}")
