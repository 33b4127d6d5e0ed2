"""Watermarked streaming dedup: duplicates across micro-batches are
dropped; state is bounded by the watermark."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.streaming import (
    incremental as INC,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def test_stream_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    chk = tmp_path / "chk"
    t0 = datetime(2024, 1, 1, 10, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    # batch 1: ids 1,2 (id 2 twice inside the same batch)
    write_batch("b1", [(1, t0, 1.0), (2, t0, 2.0), (2, t0, 2.5)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = INC.dedup_stream(stream, ["event_id"], "ts", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(chk))
        .start()
    )
    q.processAllAvailable()

    # batch 2: id 2 replayed (within watermark -> dropped), id 3 new
    write_batch("b2", [(2, datetime(2024, 1, 1, 10, 30), 9.9), (3, t0, 3.0)])
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT event_id, value FROM dedup_out").collect()
    got = sorted((r["event_id"], r["value"]) for r in rows)
    assert [eid for eid, _ in got] == [1, 2, 3]  # one row per key
    assert dict(got)[2] == 2.0  # first arrival won, replay dropped
