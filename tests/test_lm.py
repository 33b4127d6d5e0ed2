"""operators/lm.py — trigram stupid-backoff LM scoring (VERDICT r10
#8): hand-computed fixed-point values on a tiny corpus, all four
backoff levels (trigram hit / bigram / unigram / OOV floor), the
degenerate self-trained case, and edge inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    lm as LM,
)

FP = 1 << LM.FP_BITS


def qlog2(m: int) -> int:
    bl = m.bit_length()
    return (bl - 1) * LM.MANT + (m * LM.MANT) // (1 << (bl - 1)) - LM.MANT


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_all_four_backoff_levels_hand_checked(spark):
    # train counts: uni a:3 b:3 c:2 d:1 (T=9); bi (a,b):3 (b,c):2
    # (c,a):1 (b,d):1; tri (a,b,c):2 (b,c,a):1 (c,a,b):1 (a,b,d):1
    train = _docs(spark, [(1, "a b c a b c"), (2, "a b d")])
    score = _docs(
        spark,
        [
            # (a,b,c): trigram hit  m = 2*FP//3
            # (b,c,d): tri miss, bigram (c,d) miss -> unigram d
            #          m = 4*1*FP // (25*9)
            # (c,d,z): d seen, (d,z) unseen, z unseen -> OOV m=1
            (10, "a b c d z"),
        ],
    )
    out = (
        LM.lm_score_stupid_backoff(score, train_docs=train)
        .collect()[0]
        .asDict()
    )
    assert out["n_scored"] == 3
    assert (out["n_tri"], out["n_bi"], out["n_uni"], out["n_oov"]) == (
        1, 0, 1, 1,
    )
    expected_qsum = (
        qlog2((2 * FP) // 3)          # (a,b,c) tri: ct=2, c(a,b)=3
        + qlog2((4 * 1 * FP) // (25 * 9))  # (b,c,d) -> unigram d
        + qlog2(1)                    # (c,d,z) -> OOV floor
    )
    assert out["qsum"] == expected_qsum
    assert out["bits_per_token"] == pytest.approx(
        LM.FP_BITS - expected_qsum / (LM.MANT * 3), abs=0
    )


def test_bigram_backoff_level(spark):
    # trigram (c,a,d) unseen, bigram (a,d) SEEN in train via "x a d"
    train = _docs(spark, [(1, "a b c a b c"), (2, "x a d")])
    score = _docs(spark, [(10, "c a d")])
    out = LM.lm_score_stupid_backoff(score, train_docs=train).collect()[0]
    assert (out["n_tri"], out["n_bi"], out["n_uni"], out["n_oov"]) == (
        0, 1, 0, 0,
    )
    # m = (2 * c(a,d) * FP) // (5 * c(a)): c(a,d)=1, c(a)=3
    assert out["qsum"] == qlog2((2 * 1 * FP) // (5 * 3))


def test_self_trained_every_position_is_trigram_hit(spark):
    docs = _docs(spark, [(1, "a b c a b c"), (2, "a b d")])
    rows = {
        r["id"]: r.asDict()
        for r in LM.lm_score_stupid_backoff(docs).collect()
    }
    # self-training: every scored trigram counts itself -> all level 3
    assert rows[1]["n_tri"] == rows[1]["n_scored"] == 4
    assert rows[2]["n_tri"] == rows[2]["n_scored"] == 1
    assert rows[1]["n_oov"] == rows[2]["n_oov"] == 0


def test_perfectly_predictable_doc_scores_zero_bits(spark):
    # every training occurrence of bigram (a,b) continues with c, so
    # S(c | a,b) = c(a,b,c)/c(a,b) = 1 exactly -> m = 2^30 ->
    # q = 30*256 -> bits_per_token = 0 (the "x" prefix keeps (a,b)
    # from ever ending a training doc, which would break S = 1)
    train = _docs(spark, [(i, "x a b c") for i in range(3)])
    score = _docs(spark, [(10, "a b c")])
    out = LM.lm_score_stupid_backoff(score, train_docs=train).collect()[0]
    assert out["n_scored"] == 1 and out["n_tri"] == 1
    assert out["bits_per_token"] == 0.0
    assert out["qsum"] == out["n_scored"] * LM.FP_BITS * LM.MANT


def test_short_null_and_empty_docs_are_unscored(spark):
    train = _docs(spark, [(1, "a b c a b c")])
    score = _docs(
        spark, [(10, "a b"), (11, ""), (12, None), (13, "  !!  ")]
    )
    assert LM.lm_score_stupid_backoff(score, train_docs=train).count() == 0


def test_lower_perplexity_for_in_distribution_text(spark):
    train = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
        + [(100 + i, "pack my box with five dozen liquor jugs") for i in range(5)],
    )
    score = _docs(
        spark,
        [
            (200, "the quick brown fox jumps over the lazy dog"),
            (201, "dog lazy the over jumps fox brown quick the"),
        ],
    )
    rows = {
        r["id"]: r["bits_per_token"]
        for r in LM.lm_score_stupid_backoff(score, train_docs=train).collect()
    }
    assert rows[200] < rows[201]


def test_kneser_ney_hand_checked_three_paths(spark):
    """One scored doc exercising the seen-trigram, seen-context-with-
    interpolation-only, and OOV-floor paths — qsum pinned to the
    hand-computed fixed-point values (the same corpus the backoff
    test uses, so the two scorers' diagnostics are comparable)."""
    train = _docs(spark, [(1, "a b c a b c"), (2, "x a d")])
    score = _docs(spark, [(10, "a b c d z")])
    out = LM.lm_score_kneser_ney(score, train_docs=train).collect()[0]
    # bigram types: (a,b),(b,c),(c,a),(x,a),(a,d) -> nbb = 5
    # position (a,b,c): ct=2, c2(a,b)=2, N1+(ab.)=1;
    #   cc(b,c)=1, ctxm(b)=1, M(b)=1; n1p(c)=1
    m_uni_c = (1 * FP) // 5
    m_bi_bc = (max(4 * 1 - 3, 0) * FP) // 4 + (3 * 1 * m_uni_c) // 4
    m_abc = (max(4 * 2 - 3, 0) * FP) // 8 + (3 * 1 * m_bi_bc) // 8
    # position (b,c,d): trigram unseen, context (b,c) seen (c2=2,
    #   N1+(bc.)=1); (c,d) unseen but ctxm(c)=1, M(c)=1; n1p(d)=1
    m_uni_d = (1 * FP) // 5
    m_bi_cd = 0 + (3 * 1 * m_uni_d) // 4
    m_bcd = 0 + (3 * 1 * m_bi_cd) // 8
    # position (c,d,z): context (c,d) unseen, ctxm(d) absent,
    #   z unseen everywhere -> floor 1
    assert (out["n_tri"], out["n_bi"], out["n_uni"], out["n_oov"]) == (
        1, 0, 1, 1,
    )
    assert out["qsum"] == qlog2(m_abc) + qlog2(m_bcd) + qlog2(1)


def test_kneser_ney_interpolation_beats_backoff_on_unseen_trigram(spark):
    """The point of KN over backoff: an unseen trigram in a
    well-attested context still earns interpolation mass, so its
    perplexity is finite and context-sensitive rather than a flat
    backoff penalty. Both scorers agree on the level diagnostics."""
    train = _docs(
        spark,
        [(i, "the cat sat on the mat") for i in range(5)]
        + [(100, "the cat ran")],
    )
    score = _docs(spark, [(10, "the cat ran")])  # (the,cat,ran) seen once
    kn = LM.lm_score_kneser_ney(score, train_docs=train).collect()[0]
    sb = LM.lm_score_stupid_backoff(score, train_docs=train).collect()[0]
    assert kn["n_scored"] == sb["n_scored"] == 1
    assert kn["n_tri"] == sb["n_tri"] == 1
    # KN discounts the seen trigram (c=1 -> max(4-3,0)/4c2) while
    # backoff gives it full relative frequency -> KN strictly more
    # conservative on singletons
    assert kn["bits_per_token"] > sb["bits_per_token"]


def test_kneser_ney_empty_training_floors_to_oov(spark):
    train = _docs(spark, [(1, "")])
    score = _docs(spark, [(10, "a b c d")])
    out = LM.lm_score_kneser_ney(score, train_docs=train).collect()[0]
    assert out["n_oov"] == out["n_scored"] == 2
    assert out["bits_per_token"] == float(LM.FP_BITS)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
