"""Watermarked stream-stream join: purchases joined to the views that
preceded them within an hour, per user — both sides streaming, state
bounded by the watermark + time-range condition. Must match the batch
twin exactly."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _rows(kind_offset: int):
    t0 = datetime(2024, 1, 1, 12, 0, 0)
    return [
        (kind_offset + i, i % 3, t0 + timedelta(minutes=7 * i)) for i in range(30)
    ]


def test_stream_stream_join_matches_batch(spark, tmp_path):
    views, purchases = _rows(0), _rows(1000)
    vdir, pdir = tmp_path / "views", tmp_path / "purch"
    for d, rows in ((vdir, views), (pdir, purchases)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d))

    def batch_pairs():
        v = spark.createDataFrame(views, SCHEMA).alias("v")
        p = spark.createDataFrame(purchases, SCHEMA).alias("p")
        joined = p.join(
            v,
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("v.ts") <= F.col("p.ts"))
            & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
        )
        return {
            (r["pid"], r["vid"])
            for r in joined.select(
                F.col("p.event_id").alias("pid"), F.col("v.event_id").alias("vid")
            ).collect()
        }

    v_stream = (
        spark.readStream.schema(SCHEMA).parquet(str(vdir))
        .withWatermark("ts", "2 hours").alias("v")
    )
    p_stream = (
        spark.readStream.schema(SCHEMA).parquet(str(pdir))
        .withWatermark("ts", "2 hours").alias("p")
    )
    joined = p_stream.join(
        v_stream,
        (F.col("p.user_id") == F.col("v.user_id"))
        & (F.col("v.ts") <= F.col("p.ts"))
        & (F.col("v.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR")),
    ).select(F.col("p.event_id").alias("pid"), F.col("v.event_id").alias("vid"))
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (r["pid"], r["vid"])
        for r in spark.sql("SELECT pid, vid FROM ssj_out").collect()
    }
    want = batch_pairs()
    assert got == want and len(want) > 0

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
