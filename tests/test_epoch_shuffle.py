"""Deterministic epoch shuffle (sampling.epoch_shuffle, round 10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    sampling as SMP,
)


def _docs(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _order(spark, epoch, n=200, n_shards=4):
    out = SMP.epoch_shuffle(_docs(spark, n), epoch=epoch, n_shards=n_shards)
    return [
        r["doc_id"]
        for r in out.orderBy("shard", "pos").collect()
    ]


def test_reproducible_within_epoch(spark):
    assert _order(spark, 1) == _order(spark, 1)


def test_epochs_decorrelated(spark):
    o1, o2 = _order(spark, 1), _order(spark, 2)
    assert sorted(o1) == sorted(o2)  # same corpus
    assert o1 != o2
    # fixed-point fraction of two independent permutations is ~1/n —
    # allow generous slack but reject near-identical orders
    fixed = sum(1 for a, b in zip(o1, o2) if a == b)
    assert fixed < len(o1) * 0.1


def test_positions_dense_per_shard(spark):
    out = SMP.epoch_shuffle(_docs(spark, 100), epoch=5, n_shards=3)
    rows = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    ).collect()
    assert {r["shard"] for r in rows} <= {0, 1, 2}
    for r in rows:
        assert r["mn"] == 1 and r["mx"] == r["n"]  # dense 1..n per shard
    assert sum(r["n"] for r in rows) == 100


def test_null_ids_excluded_and_validation(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "doc_id long")
    out = SMP.epoch_shuffle(df, epoch=0, n_shards=2)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]
    with pytest.raises(ValueError):
        SMP.epoch_shuffle(df, epoch=0, n_shards=0)


def test_shards_reasonably_balanced(spark):
    out = SMP.epoch_shuffle(_docs(spark, 4000), epoch=7, n_shards=8)
    counts = [r["n"] for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)
