"""Z-order layout: morton codes vs a pure-Python reference, and the
clustering property that makes pruning work."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    layout as LYT,
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_morton_code_matches_reference(spark):
    vals = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 7, 100, 65535)]
    df = spark.createDataFrame(vals, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", LYT.morton_code("a", "b")).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b), (a, b)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """After z-order clustering on (user bucket, time bucket), each
    output file must span a small fraction of BOTH dimensions — a
    single-column sort can only achieve that for one."""
    n_users, n_ticks = 64, 64
    rows = [(u, t) for u in range(n_users) for t in range(n_ticks)]
    df = spark.createDataFrame(rows, ["user", "tick"])
    path = str(tmp_path / "z")
    LYT.zorder_write(df, path, F.col("user"), F.col("tick"), files=16, bits=6)

    spans_u, spans_t = [], []
    for f in glob.glob(f"{path}/part-*.parquet"):
        pdf = spark.read.parquet(f).agg(
            F.min("user"), F.max("user"), F.min("tick"), F.max("tick")
        ).collect()[0]
        spans_u.append(pdf[1] - pdf[0] + 1)
        spans_t.append(pdf[3] - pdf[2] + 1)
    # 16 files over a 64x64 grid: z-order quadrants span ≤ half of
    # each dimension; a user-sorted layout would span ALL 64 ticks.
    assert max(spans_u) <= n_users // 2
    assert max(spans_t) <= n_ticks // 2


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the same key/count must sort-merge join
    with no Exchange (and no per-side Sort: one pre-sorted file per
    bucket) — the co-located fact⋈fact layout for 100 TB."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    try:
        LYT.write_bucketed(
            orders, "bkt_orders", str(tmp_path / "bo"), "o_orderkey", buckets=4
        )
        LYT.write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "bkt_lineitem",
            str(tmp_path / "bl"),
            "o_orderkey",
            buckets=4,
        )
        joined = LYT.bucketed_join(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # cross-check the result against the plain (shuffling) join
        want = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_snapshot_diff_on_bucketed_tables_is_shuffle_free(spark, sf_dir, tmp_path):
    """The CDC docstring's scale claim, proven: with both snapshots
    bucketed on the key, the full-outer diff join plans with zero
    Exchange."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        cdc as CDC,
    )
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    orders = read_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0)
    new = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    ).filter(F.col("o_orderkey") % 13 != 0)
    try:
        LYT.write_bucketed(old, "cdc_old", str(tmp_path / "o"), "o_orderkey", buckets=4)
        LYT.write_bucketed(new, "cdc_new", str(tmp_path / "n"), "o_orderkey", buckets=4)
        diff = CDC.snapshot_diff(
            spark.table("cdc_old"),
            spark.table("cdc_new"),
            ["o_orderkey"],
            ["o_totalprice"],
        )
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the changeset is still correct
        want = CDC.snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])
        got = {(r["o_orderkey"], r["change_type"]) for r in diff.collect()}
        assert got == {(r["o_orderkey"], r["change_type"]) for r in want.collect()}
        assert any(c == "update" for _, c in got)
        assert any(c == "insert" for _, c in got)
        assert any(c == "delete" for _, c in got)
    finally:
        spark.sql("DROP TABLE IF EXISTS cdc_old")
        spark.sql("DROP TABLE IF EXISTS cdc_new")

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
