"""Homoglyph/confusable folding (round 9 continuation) — the
poisoning-defense normalizer: curated TR39 Cyrillic/Greek lookalikes
and fullwidth forms fold to ASCII in one JVM-side translate."""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.functions import (
    text as TX,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_cyrillic_and_greek_lookalikes_fold(spark):
    # 'раураl' spelled with Cyrillic а/р/у and 'Ϝ'?  use mapped chars:
    attacked = "раypаl"  # Cyrillic р + а
    assert _one(spark, TX.fold_homoglyphs(F.lit(attacked))) == "paypal"
    assert _one(spark, TX.fold_homoglyphs(F.lit("ΤΟΚΕΝ"))) is not None
    assert _one(spark, TX.fold_homoglyphs(F.lit("ΑΒΕ"))) == "ABE"


def test_fullwidth_folds_entire_ascii_range(spark):
    fw = "".join(chr(0xFF01 + i) for i in range(94))
    want = "".join(chr(0x21 + i) for i in range(94))
    assert _one(spark, TX.fold_fullwidth(F.lit(fw))) == want


def test_fold_is_idempotent_and_ascii_invariant(spark):
    s = "The quick brown fox 123 !@#"
    assert _one(spark, TX.fold_homoglyphs(F.lit(s))) == s
    attacked = "сустем"  # partially mapped Cyrillic
    once = _one(spark, TX.fold_homoglyphs(F.lit(attacked)))
    twice = _one(spark, TX.fold_homoglyphs(F.lit(once)))
    assert once == twice


def test_legitimate_nonlatin_text_not_destroyed(spark):
    # unmapped Cyrillic (д ж щ) and CJK must survive folding — the
    # table is curated, not a transliterator
    s = "джщ 中文テキスト"
    assert _one(spark, TX.fold_homoglyphs(F.lit(s))) == s


def test_greek_nu_folds_to_v_per_tr39(spark):
    # TR39 confusables map U+03BD (Greek nu) to LATIN 'v', not 'n' —
    # pinned so the curated table can't silently diverge from the
    # cited source again (ADVICE r9).
    assert _one(spark, TX.fold_homoglyphs(F.lit("ν"))) == "v"
    assert dict(zip(TX._HOMOGLYPH_FROM, TX._HOMOGLYPH_TO))["ν"] == "v"


def test_homoglyph_count_signals_poisoning(spark):
    assert _one(spark, TX.homoglyph_count(F.lit("plain ascii"))) == 0
    assert _one(spark, TX.homoglyph_count(F.lit("раypаl"))) == 3


def test_fold_defeats_dedup_evasion(spark):
    """The attack the fold exists for: a confusable-substituted copy
    must exact-dedup against the original AFTER folding."""
    rows = [(1, "free crypto payment now"), (2, "free сrурtо раyment now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    folded = df.select("doc_id", TX.fold_homoglyphs(F.col("text")).alias("t"))
    assert folded.groupBy("t").count().filter(F.col("count") == 2).count() == 1


def test_confusable_table_invariants():
    """Structural laws both engines' translate semantics depend on:
    no duplicate source codepoints (first-occurrence tie-breaking
    could diverge between engines), no overlap with the fullwidth
    fold's range (chained folds must commute), ASCII-only targets,
    and no fixed points (every mapped char actually changes)."""
    from collections import Counter

    src, dst = TX._HOMOGLYPH_FROM, TX._HOMOGLYPH_TO
    assert len(src) == len(dst)
    assert [c for c, n in Counter(src).items() if n > 1] == []
    fw = {chr(0xFF01 + i) for i in range(94)}
    assert set(src) & fw == set()
    assert all(ord(c) < 128 for c in dst)
    assert all(a != b for a, b in zip(src, dst))
    assert all(ord(c) >= 128 for c in src)  # never remaps real ASCII
