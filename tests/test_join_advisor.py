"""Join-strategy advisor (r7): plan_join must (a) recommend the right
strategy in the three regimes, (b) agree with the plan Spark actually
executes in the clear cases, and (c) hand salted_join a fan-out that
row-identically repairs the hot-key shuffle it flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    skew as SKW,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources import (
    read_table,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_broadcast_regime_matches_executed_plan(spark, sf_dir):
    """Tiny dimension side: advisor says broadcast, and Spark's own
    planner (default autoBroadcastJoinThreshold) picks
    BroadcastHashJoin for the same join."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    rec = SKW.plan_join(li, orders, "l_orderkey", "o_orderkey")
    assert rec["strategy"] == "broadcast"
    assert rec["rec_salts"] == 0
    assert rec["evidence"]["small_rows"] <= 100_000
    assert rec["evidence"]["est_join_rows"] > 0
    executed = _plan(li.join(orders, li["l_orderkey"] == orders["o_orderkey"]))
    assert "BroadcastHashJoin" in executed


def test_shuffle_regime_matches_executed_plan(spark, sf_dir):
    """Small side over the row threshold and no hot key: advisor says
    shuffle; with broadcasting off (what the threshold models), Spark
    executes a shuffle join (SortMerge/ShuffledHash), not broadcast."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    rec = SKW.plan_join(
        li, orders, "l_orderkey", "o_orderkey", broadcast_threshold_rows=100
    )
    assert rec["strategy"] == "shuffle"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        executed = _plan(
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" not in executed
    assert "SortMergeJoin" in executed or "ShuffledHashJoin" in executed


def test_salted_regime_fanout_repairs_hot_key(spark):
    """One key holding ~90% of a non-broadcastable fact: advisor says
    salted-shuffle with the diagnostic's fan-out, salted_join with
    that fan-out is row-identical to the plain join, and the salted
    plan's data exchange partitions on (key, salt) — the repaired
    shuffle."""
    big = spark.range(0, 60_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id") % 500)
        .alias("fk"),
        (F.col("id") * 3).alias("payload"),
    )
    small = spark.range(0, 500).select(
        F.col("id").alias("pk"), F.lit("dim").alias("attr")
    )
    rec = SKW.plan_join(
        big,
        small,
        "fk",
        "pk",
        broadcast_threshold_rows=100,
        target_rows_per_task=10_000,
    )
    assert rec["strategy"] == "salted-shuffle"
    assert rec["evidence"]["top_key"] == 7
    assert rec["rec_salts"] >= 2
    assert rec["evidence"]["skew_ratio_x1000"] >= 5_000

    salted = SKW.salted_join(big, small, "fk", "pk", salts=rec["rec_salts"])
    plain = big.join(small, big["fk"] == small["pk"])
    assert salted.count() == plain.count()
    assert (
        salted.groupBy("fk").count().exceptAll(
            plain.groupBy("fk").count()
        ).isEmpty()
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        splan = _plan(SKW.salted_join(big, small, "fk", "pk",
                                      salts=rec["rec_salts"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "__salt" in splan  # the join key includes the salt


def test_advisor_empty_big_side_degrades_cleanly(spark):
    big = spark.createDataFrame([], "fk long, payload long")
    small = spark.range(0, 5).select(F.col("id").alias("pk"))
    rec = SKW.plan_join(big, small, "fk", "pk")
    assert rec["strategy"] == "broadcast"
    assert rec["evidence"]["top_key_rows"] == 0
    assert rec["evidence"]["est_join_rows"] == 0.0
