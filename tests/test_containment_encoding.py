"""Golden tests for containment dedup and the cluster-size histogram."""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    dedup as DD,
)


def test_containment_catches_subdocument_jaccard_misses(spark):
    para = "alpha beta gamma delta epsilon zeta eta theta"
    page = para + " " + " ".join(f"filler{i} word{i} pad{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, para), (2, page), (3, "totally different text here okay")],
        ["doc_id", "text"],
    )
    jac = DD.ngram_jaccard_pairs(df, n=3, threshold=0.8)
    con = DD.containment_pairs(df, n=3, threshold=0.9)
    assert jac.count() == 0  # Jaccard blind to the paste
    rows = con.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0  # para fully contained
    assert r["contained_id"] == 1  # the smaller side is the contained doc


def test_containment_threshold_excludes_partial_overlap(spark):
    a = "one two three four five six seven eight nine ten"
    b = "one two three four five completely different tail words here"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    res = DD.containment_pairs(df, n=3, threshold=0.9)
    assert res.count() == 0  # only ~3/8 shared shingles
    res_low = DD.containment_pairs(df, n=3, threshold=0.3)
    assert res_low.count() == 1


def test_cluster_size_histogram_shape(spark):
    # two identical pairs -> two clusters of 2; one singleton
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "pack my box with five dozen liquor jugs today"),
            (4, "pack my box with five dozen liquor jugs today"),
            (5, "sphinx of black quartz judge my vow now then"),
        ],
        ["doc_id", "text"],
    )
    pairs = DD.ngram_jaccard_pairs(df, n=3, threshold=0.8)
    comp = DD.connected_components(
        df.select("doc_id"), pairs.select("id_a", "id_b"), id_col="doc_id"
    )
    hist = (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )
    got = {r["cluster_size"]: r["n_clusters"] for r in hist.collect()}
    assert got == {2: 2, 1: 1}

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
