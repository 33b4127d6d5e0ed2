"""Tests for operators/rollup: hypertable continuous aggregates."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    rollup as RU,
)


def test_rollup_reagg_equals_direct(spark):
    rows = [
        ("a", datetime(2024, 1, 1, h, m), float(h * 60 + m))
        for h in range(0, 13)
        for m in (0, 17, 43)
    ] + [("b", datetime(2024, 1, 2, 5, 5), 7.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    levels = RU.rollup_hierarchy(
        df, "ts", ["k"], [3600, 21600, 86400],
        sums={"sv": F.col("v").cast("decimal(20,4)")},
        mins={"mn": F.col("v")},
        maxs={"mx": F.col("v")},
    )
    for w, lvl in levels.items():
        direct = df.groupBy(RU.time_bucket_us("ts", w), "k").agg(
            F.sum(F.col("v").cast("decimal(20,4)")).alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        got = {tuple(r) for r in lvl.select(direct.columns).collect()}
        want = {tuple(r) for r in direct.collect()}
        assert got == want, f"grain {w}s diverges from direct aggregation"
    # bucket nesting: every 1d bucket count equals the sum of its 6h children
    day = {(r["k"], r["bucket_us"]): r["n_rows"] for r in levels[86400].collect()}
    child_sum: dict = {}
    for r in levels[21600].collect():
        key = (r["k"], r["bucket_us"] - r["bucket_us"] % (86400 * 1_000_000))
        child_sum[key] = child_sum.get(key, 0) + r["n_rows"]
    assert day == child_sum


def test_rollup_rejects_non_nesting_widths(spark):
    df = spark.createDataFrame([("a", datetime(2024, 1, 1), 1.0)], ["k", "ts", "v"])
    with pytest.raises(ValueError, match="nest"):
        RU.rollup_hierarchy(df, "ts", ["k"], [3600, 5000], sums={"s": F.col("v")})


def test_rollup_union_reuses_finest_exchange(spark, sf_dir):
    """The single-action union of all grains must scan raw once:
    coarser grains re-aggregate the finest partials, which AQE plans
    as ReusedExchange (visible only on the executed plan)."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    ev = read_table(spark, sf_dir, "events")
    levels = RU.rollup_hierarchy(
        ev, "ts", ["event_type"], [3600, 86400],
        sums={"sv": F.col("value").cast("decimal(20,4)")},
    )
    union = levels[3600].select("bucket_us", "event_type", "sv", "n_rows").unionByName(
        levels[86400].select("bucket_us", "event_type", "sv", "n_rows")
    )
    union.collect()
    executed = union._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed


def test_refresh_merge_equals_full_recompute(spark):
    old = [("a", datetime(2024, 1, 1, h), float(h)) for h in range(10)]
    new = [("a", datetime(2024, 1, 1, 9, 30), 99.0),  # touches existing bucket
           ("b", datetime(2024, 1, 1, 12), 5.0)]      # brand-new key+bucket
    old_df = spark.createDataFrame(old, ["k", "ts", "v"])
    new_df = spark.createDataFrame(new, ["k", "ts", "v"])
    spec = dict(
        sums={"sv": F.col("v").cast("decimal(20,4)")},
        mins={"mn": F.col("v")}, maxs={"mx": F.col("v")},
    )
    existing = RU.rollup_hierarchy(old_df, "ts", ["k"], [3600], **spec)[3600]
    merged = RU.refresh_merge(existing, new_df, "ts", ["k"], 3600, **spec)
    full = RU.rollup_hierarchy(old_df.union(new_df), "ts", ["k"], [3600], **spec)[3600]
    cols = sorted(merged.columns)
    assert {tuple(r) for r in merged.select(cols).collect()} == {
        tuple(r) for r in full.select(cols).collect()
    }

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
