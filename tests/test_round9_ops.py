"""Round-9 operator behavior: the four ADVICE r8 hardening fixes.

Each was a latent edge-case (NULL ids slipping through decontamination,
opaque errors on empty predicate lists, ambiguous survivorship columns,
spec-legal JPEG fill bytes misparsing) — pinned here so they stay
fixed. JPEG/AVI round-9 coverage lives in test_jpeg_codec.py /
test_avi_mjpeg.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    dedup as DD,
    layout as LAY,
    linkage as LK,
)


def test_decontaminate_drops_null_id_contaminated_docs(spark):
    """ADVICE r8: a NULL-id train doc sharing eval n-grams must NOT
    survive decontamination (the old equi-anti-join was null-rejecting
    and silently passed it through)."""
    train = spark.createDataFrame(
        [
            (None, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no overlap whatsoever here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    kept = DD.decontaminate(train, eval_df, n=5).collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert kept_ids == {2}, kept_ids  # NULL-id contaminated doc dropped too


def test_decontaminate_keeps_clean_null_id_docs(spark):
    train = spark.createDataFrame(
        [(None, "completely unrelated text with no overlap whatsoever here")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    assert DD.decontaminate(train, eval_df, n=5).count() == 1


def test_pruned_read_multi_empty_preds_raises(spark, tmp_path):
    """ADVICE r8: empty predicate list is a caller bug -> clear
    ValueError, not an opaque filter(None) TypeError."""
    path = str(tmp_path / "t")
    spark.range(10).withColumn("v", F.col("id") * 2).write.parquet(path)
    zones = LAY.collect_zone_maps(spark, path, ["v"])
    with pytest.raises(ValueError, match="non-empty"):
        LAY.pruned_read_multi(spark, path, zones, [])


def test_golden_records_overlapping_rule_columns_raise(spark):
    """ADVICE r8: a column assigned to BOTH survivorship rules would
    produce a duplicate/ambiguous output column; fail fast instead."""
    records = spark.createDataFrame(
        [(1, "a"), (2, "b")], "rec_id long, name string"
    )
    components = spark.createDataFrame(
        [(1, 1), (2, 1)], "id long, component long"
    )
    with pytest.raises(ValueError, match="disjoint"):
        LK.golden_records(
            records,
            components,
            "rec_id",
            first_nonnull_cols=["name"],
            mode_cols=["name"],
        )
