"""Stream-static join: a streaming fact enriched by a broadcast
static dimension must match its batch twin — the continuous version
of the reference's fact⋈dim joins (SURVEY.md §2.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark.sql import types as T

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import schemas
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
    events_ts_unit,
    read_table,
)


def test_stream_static_join_matches_batch(spark, sf_dir, tmp_path):
    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("signup", "convert"), ("error", "ops")],
        ["event_type", "category"],
    )

    batch = read_table(spark, sf_dir, "events")
    want = {
        (r["category"], r["n"])
        for r in batch.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # stream the same parquet through the identical plan, honoring the
    # same ts-unit contract as sources.io.read_table (ns encodings scan
    # as long and floor to micros; us/ms read directly)
    src = tmp_path / "events_src"
    src.mkdir()
    (src / "events.parquet").write_bytes(
        open(f"{sf_dir}/events.parquet", "rb").read()
    )
    if events_ts_unit(sf_dir) == "ns":
        phys = T.StructType(
            [
                T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
                for f in schemas.TESTDATA["events"].fields
            ]
        )
        stream = (
            spark.readStream.schema(phys)
            .parquet(str(src))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    else:
        stream = (
            spark.readStream.schema(schemas.TESTDATA["events"]).parquet(str(src))
        )
    agg = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["category"], r["n"])
        for r in spark.sql("SELECT category, n FROM ss_join_out").collect()
    }
    assert got == want

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
