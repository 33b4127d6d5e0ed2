"""df.observe metrics ride the action (no second scan); file-stats
audit detects small-file drift and compaction repairs it."""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    observe as OBS,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources import (
    io as IO,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
    read_table,
)


def test_observed_metrics_match_reference_profile(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    df, obs = OBS.observed(
        orders,
        "orders_load",
        OBS.standard_load_metrics(orders, numeric_cols=["o_totalprice"]),
    )
    n = df.count()  # the action the metrics piggyback on
    got = obs.get
    assert got["n_rows"] == n
    # cross-check two metrics against explicit aggregations
    want_nulls = orders.filter(F.col("o_orderpriority").isNull()).count()
    assert got["nulls_o_orderpriority"] == want_nulls
    want_neg = orders.filter(F.col("o_totalprice") < 0).count()
    assert got["neg_o_totalprice"] == want_neg


def test_file_stats_detect_and_compaction_repairs(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "drip")
    # simulate incremental drip: many tiny files
    li.repartition(24).write.mode("overwrite").parquet(path)
    before = IO.table_file_stats(spark, path)
    assert before["n_files"] == 24

    IO.compact_parquet(spark, path, target_file_mb=256)
    after = IO.table_file_stats(spark, path)
    assert after["n_files"] < before["n_files"]
    assert after["total_bytes"] > 0
    # same rows survive the rewrite
    assert spark.read.parquet(path).count() == li.count()

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
