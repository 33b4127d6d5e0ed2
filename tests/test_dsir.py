"""DSIR importance resampling (operators/sampling.dsir_importance_weights
+ dsir_gumbel_topk, round 12; Xie et al. 2023, arXiv:2302.03169).

Pins the semantics the oracle hash alone doesn't isolate: weights
actually rank target-like docs above target-unlike docs, the
quantized-log2 fixed point is exact on powers of two, the Gumbel key
respects deterministic dominance margins, NULL handling, and the
char_gram_hashes carry passthrough.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.functions.text import (
    char_gram_hashes,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    sampling as SMP,
)

# target docs are digit-heavy, one raw doc matches that distribution,
# one is letter-heavy; trigram buckets separate them cleanly
_TARGET_TEXT = "12345 67890 12345 67890 12345 67890"
_LIKE_TARGET = "67890 12345 67890 12345"
_UNLIKE = "quick brown foxes jump over lazy dogs repeatedly"


def _corpus(spark):
    rows = [
        (0, _TARGET_TEXT, True),
        (1, _TARGET_TEXT, True),
        (2, _LIKE_TARGET, False),
        (3, _UNLIKE, False),
        (4, _UNLIKE + " again and again", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")


def _weights(spark, df):
    w = SMP.dsir_importance_weights(df, F.col("is_t"), "doc_id", "text")
    return {r["id"]: r for r in w.collect()}


def test_weights_rank_target_like_above_unlike(spark):
    by_id = _weights(spark, _corpus(spark))
    # only raw-pool docs are scored
    assert set(by_id) == {2, 3, 4}
    assert by_id[2]["logw256"] > by_id[3]["logw256"]
    assert by_id[2]["logw256"] > by_id[4]["logw256"]
    # bits view is exactly logw256/256
    for r in by_id.values():
        assert r["logw_bits"] == r["logw256"] / 256.0


def test_null_id_excluded_null_target_is_raw(spark):
    rows = [
        (None, _TARGET_TEXT, True),
        (10, _TARGET_TEXT, True),
        (11, _LIKE_TARGET, None),  # NULL target flag -> raw pool
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    by_id = _weights(spark, df)
    assert set(by_id) == {11}


def test_featureless_docs_drop_out(spark):
    rows = [
        (0, _TARGET_TEXT, True),
        (1, "!!", False),   # < 3 alnum chars -> no grams
        (2, None, False),   # NULL text
        (3, _LIKE_TARGET, False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    assert set(_weights(spark, df)) == {3}


def test_qlog2_exact_on_powers_of_two(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (256,), (1 << 20,)], "m long"
    ).select(SMP._qlog2_col("m").alias("q"))
    assert [r["q"] for r in df.collect()] == [0, 256, 8 * 256, 20 * 256]


def test_gumbel_topk_dominance_and_ties(spark):
    # gumbel term range: [2048 - qlog2(5120), 2048 - qlog2(1)] ⊂
    # (-1105, 2048] — a logw margin > 3153 dominates any draw
    rows = [(i, 0) for i in range(20)] + [(100, 4000), (101, 4000)]
    w = spark.createDataFrame(rows, "id long, logw256 long")
    top = SMP.dsir_gumbel_topk(w, 2).collect()
    assert [r["id"] for r in top] == [100, 101] or [
        r["id"] for r in top
    ] == [101, 100]
    # k > pool returns everything
    assert SMP.dsir_gumbel_topk(w, 99).count() == 22
    # deterministic: same draw twice -> identical keys
    a = {r["id"]: r["gkey256"] for r in SMP.dsir_gumbel_topk(w, 99).collect()}
    b = {r["id"]: r["gkey256"] for r in SMP.dsir_gumbel_topk(w, 99).collect()}
    assert a == b
    # fresh salt -> different draw (keys change for at least one doc)
    c = {
        r["id"]: r["gkey256"]
        for r in SMP.dsir_gumbel_topk(w, 99, salt="dsir2").collect()
    }
    assert a != c


def test_char_gram_hashes_carry_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "abcd", True), (2, "xyz", False)],
        "doc_id long, text string, flag boolean",
    )
    plain = char_gram_hashes(df, "doc_id", "text").collect()
    carried = char_gram_hashes(df, "doc_id", "text", carry=("flag",)).collect()
    assert sorted((r["id"], r["h"]) for r in plain) == sorted(
        (r["id"], r["h"]) for r in carried
    )
    assert all(r["flag"] == (r["id"] == 1) for r in carried)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
