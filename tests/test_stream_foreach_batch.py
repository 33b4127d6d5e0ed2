"""Streaming → warehouse via foreachBatch + key-upsert: the
keyed continuous load path (fixes the reference's append-rerun
duplicate quirk §2.9.4 in streaming form). Each key holds exactly one
row after any number of micro-batches; a replayed key UPDATES in
place (pangres ``if_row_exists='update'`` parity — new batch wins,
with latest-ts-wins inside a batch via ``order_by``)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources import (
    io as SIO,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    tgt = str(tmp_path / "warehouse")
    src.mkdir()

    def emit(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    emit([(1, datetime(2024, 1, 1, 10), 1.0), (2, datetime(2024, 1, 1, 10), 2.0)])

    def sink(batch_df, batch_id):
        merged = SIO.upsert_parquet(
            batch_df.sparkSession, batch_df, tgt, keys=["k"], order_by="ts"
        )
        # localCheckpoint: materialize BEFORE overwriting the dir we read
        merged.localCheckpoint().write.mode("overwrite").parquet(tgt)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()

    # batch 2: key 2 replayed with NEWER ts (update), key 3 new
    emit([(2, datetime(2024, 1, 1, 11), 9.0), (3, datetime(2024, 1, 1, 10), 3.0)])
    q.processAllAvailable()
    mid = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert mid == {1: 1.0, 2: 9.0, 3: 3.0}  # update applied, no dup rows

    # batch 3: key 2 again, two rows in one batch -> latest-ts row of
    # the batch wins the in-batch dedup, then replaces the stored row
    emit([(2, datetime(2024, 1, 1, 12), 7.0), (2, datetime(2024, 1, 1, 11, 30), 6.0)])
    q.processAllAvailable()
    q.stop()

    rows = {r["k"]: r["v"] for r in spark.read.parquet(tgt).collect()}
    assert rows == {1: 1.0, 2: 7.0, 3: 3.0}
    assert spark.read.parquet(tgt).count() == 3  # one row per key, always


def test_streaming_dim_merge_key_continuity(spark, tmp_path):
    """Streaming staging → warehouse dim via foreachBatch + the
    incremental dim-merge contract: unseen natural keys append with
    surrogate keys continuing from max(existing); replayed keys never
    re-assign. This is the streaming form of the daily pipeline's
    dim merge (plans/pipeline.run_warehouse_table)."""
    from pyspark.sql import functions as F

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.surrogate import (
        add_surrogate_key,
        max_key,
    )

    src = tmp_path / "stg_stream"
    src.mkdir()
    tgt = str(tmp_path / "dim_stream")
    schema = T.StructType([
        T.StructField("nk", T.StringType()),
        T.StructField("name", T.StringType()),
    ])

    def emit(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def sink(batch_df, batch_id):
        s = batch_df.sparkSession
        old = SIO.read_parquet_if_exists(s, tgt)
        if old is None:
            SIO.write_parquet(add_surrogate_key(batch_df, "sk", ["nk"]), tgt)
            return
        unseen = batch_df.join(old.select("nk"), on="nk", how="left_anti")
        fresh = add_surrogate_key(
            unseen, "sk", ["nk"], offset=max_key(old, "sk")
        ).select("sk", "nk", "name")
        SIO.replace_parquet_atomic(s, old.select("sk", "nk", "name").unionByName(fresh), tgt)

    emit([("c:1", "one"), ("c:2", "two")])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk2"))
        .start()
    )
    q.processAllAvailable()
    first = {r["nk"]: r["sk"] for r in spark.read.parquet(tgt).collect()}
    assert sorted(first.values()) == [1, 2]

    emit([("c:2", "two-again"), ("c:3", "three")])  # replay + new key
    q.processAllAvailable()
    q.stop()
    final = {r["nk"]: r["sk"] for r in spark.read.parquet(tgt).collect()}
    assert final["c:1"] == first["c:1"] and final["c:2"] == first["c:2"]
    assert final["c:3"] == 3  # sequence continued, replay did not burn a key
    assert spark.read.parquet(tgt).count() == 3

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
