"""Round-6 continuation operators: Bloom join pruning, linear
interpolation, rolling z-score anomalies, PMI co-occurrence, int8
embedding quantization. Each op's registry entry is hash-checked
against DuckDB (tests/test_oracle_tail.py); these tests pin the
SEMANTIC laws the oracle can't state (mergeability, no false
negatives, exactness on planted fixtures, invariances)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.functions import (
    text as TX,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    similarity as SIM,
    sketches as SKC,
    timeseries as TS,
)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 300).select(F.col("id").alias("k"))
    bloom = SKC.bloom_build(keys, "k", m_bits=1024, k=4)
    probed = SKC.bloom_probe(bloom, keys, "k", m_bits=1024, k=4)
    n_missed = probed.filter(~F.col("might_contain")).count()
    assert n_missed == 0  # a Bloom filter NEVER false-negatives


def test_bloom_false_positive_rate_small(spark):
    build = spark.range(0, 200).select(F.col("id").alias("k"))
    # disjoint probe set: every might_contain=true is a false positive
    probe = spark.range(10_000, 12_000).select(F.col("id").alias("k"))
    bloom = SKC.bloom_build(build, "k", m_bits=4096, k=5)
    fp = (
        SKC.bloom_probe(bloom, probe, "k", m_bits=4096, k=5)
        .filter(F.col("might_contain"))
        .count()
    )
    # theory: (1 - e^{-kn/m})^k ≈ 0.6% for n=200, m=4096, k=5
    assert fp / 2000 < 0.03


def test_bloom_bitmaps_merge_by_bit_or(spark):
    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(100, 250).select(F.col("id").alias("k"))
    whole = SKC.bloom_build(a.unionByName(b), "k", m_bits=512, k=3)
    merged = (
        SKC.bloom_build(a, "k", m_bits=512, k=3)
        .unionByName(SKC.bloom_build(b, "k", m_bits=512, k=3))
        .groupBy("chunk")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert (
        whole.exceptAll(merged).count() == 0
        and merged.exceptAll(whole).count() == 0
    )


def test_bloom_chunk_count_bounded(spark):
    keys = spark.range(0, 5000).select(F.col("id").alias("k"))
    bloom = SKC.bloom_build(keys, "k", m_bits=256, k=4)
    assert bloom.count() <= 256 // 32  # KB-scale state however big the input


def test_bloom_rejects_bad_params(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        SKC.bloom_build(df, "k", m_bits=100, k=3)  # not multiple of 32
    with pytest.raises(ValueError):
        SKC.bloom_build(df, "k", m_bits=64, k=0)


# ---------------------------------------------------------------------------
# Linear interpolation
# ---------------------------------------------------------------------------


def _daily(spark, rows):
    return spark.createDataFrame(
        [Row(key="a", day=dt.date(2024, 1, d), v=float(v)) for d, v in rows]
    )


def test_interpolate_exact_on_planted_gap(spark):
    daily = _daily(spark, [(1, 10.0), (5, 30.0)])
    out = {
        r["day"].day: (r["v"], r["is_gap"])
        for r in TS.interpolate_linear(daily, ["key"], "day", "v").collect()
    }
    assert out[1] == (10.0, False)
    assert out[2] == (15.0, True)
    assert out[3] == (20.0, True)
    assert out[4] == (25.0, True)
    assert out[5] == (30.0, False)


def test_interpolate_observed_rows_untouched(spark):
    daily = _daily(spark, [(1, 3.25), (2, 9.5), (4, 1.0)])
    out = TS.interpolate_linear(daily, ["key"], "day", "v")
    obs = {
        r["day"].day: r["v"] for r in out.filter(~F.col("is_gap")).collect()
    }
    assert obs == {1: 3.25, 2: 9.5, 4: 1.0}


def test_interpolate_multi_key_isolated(spark):
    daily = spark.createDataFrame(
        [
            Row(key="a", day=dt.date(2024, 1, 1), v=0.0),
            Row(key="a", day=dt.date(2024, 1, 3), v=4.0),
            Row(key="b", day=dt.date(2024, 1, 2), v=100.0),
        ]
    )
    out = TS.interpolate_linear(daily, ["key"], "day", "v")
    assert out.filter((F.col("key") == "a") & F.col("is_gap")).collect()[0][
        "v"
    ] == 2.0
    # key b has a single observation: spine is one day, no gaps
    assert out.filter(F.col("key") == "b").count() == 1


# ---------------------------------------------------------------------------
# Rolling z-score
# ---------------------------------------------------------------------------


def _series(spark, vals):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(key="u", ts=t0 + dt.timedelta(minutes=i), i=i, v=float(v))
            for i, v in enumerate(vals)
        ]
    )


def test_zscore_flags_planted_spike(spark):
    vals = [10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 9.0, 10.0, 500.0]
    out = TS.rolling_zscore(
        _series(spark, vals), ["key"], "ts", "i", "v",
        lookback=20, min_points=8,
    )
    flagged = out.filter(F.abs(F.col("z")) > 3).collect()
    assert [r["i"] for r in flagged] == [9]
    assert flagged[0]["z"] > 100  # spike vs sd≈0.7 baseline


def test_zscore_excludes_current_row_from_baseline(spark):
    # constant history then a spike: if the spike leaked into its own
    # baseline the variance would be huge and z tiny
    vals = [5.0] * 9 + [50.0]
    out = TS.rolling_zscore(
        _series(spark, vals), ["key"], "ts", "i", "v",
        lookback=20, min_points=8,
    ).collect()
    by_i = {r["i"]: r for r in out}
    assert by_i[9]["n_baseline"] == 9
    # sd of constant baseline is 0 → z null (guarded division), not inf
    assert by_i[9]["z"] is None


def test_zscore_matches_hand_computation(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    out = TS.rolling_zscore(
        _series(spark, vals), ["key"], "ts", "i", "v",
        lookback=20, min_points=8,
    ).collect()
    assert len(out) == 1  # only the 9th row has >= 8 priors
    r = out[0]
    base = vals[:8]
    mean = sum(base) / 8
    sd = math.sqrt(sum((x - mean) ** 2 for x in base) / 7)
    assert r["z"] == pytest.approx((9.0 - mean) / sd, rel=1e-12)


def test_zscore_min_points_gate(spark):
    out = TS.rolling_zscore(
        _series(spark, [1.0] * 5), ["key"], "ts", "i", "v",
        lookback=20, min_points=8,
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# PMI co-occurrence
# ---------------------------------------------------------------------------


def test_pmi_exact_on_planted_corpus(spark):
    # alpha+beta co-occur in 3 of 6 docs; gamma floats alone
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta common"),
            Row(doc_id=2, text="alpha beta common"),
            Row(doc_id=3, text="alpha beta common"),
            Row(doc_id=4, text="alpha gamma common"),
            Row(doc_id=5, text="beta gamma common"),
            Row(doc_id=6, text="gamma common"),
        ]
    )
    out = {
        (r["term_a"], r["term_b"]): r
        for r in TX.term_cooccurrence(
            docs, "doc_id", "text", min_df=1, max_terms=10, min_pair_docs=1
        ).collect()
    }
    ab = out[("alpha", "beta")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (3, 4, 4)
    assert ab["lift_num"] == 18 and ab["lift_den"] == 16
    assert ab["lift"] == pytest.approx(18 / 16)
    # 'common' is in every doc: lift with anything is exactly 1.0
    ac = out[("alpha", "common")]
    assert ac["lift"] == pytest.approx(1.0)


def test_pmi_pair_orientation_canonical(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="zebra apple") for i in range(4)]
    )
    out = TX.term_cooccurrence(
        docs, "doc_id", "text", min_df=1, max_terms=10, min_pair_docs=1
    ).collect()
    assert len(out) == 1 and out[0]["term_a"] == "apple"  # a < b once


def test_pmi_vocab_cap_bounds_pairs(spark):
    # 30 terms per doc but vocab capped at 5 → at most C(5,2) pairs
    text = " ".join(f"term{i:02d}" for i in range(30))
    docs = spark.createDataFrame([Row(doc_id=i, text=text) for i in range(3)])
    out = TX.term_cooccurrence(
        docs, "doc_id", "text", min_df=1, max_terms=5, min_pair_docs=1
    )
    assert out.count() == 10


def test_pmi_rejects_bad_params(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        TX.term_cooccurrence(docs, min_df=0)
    with pytest.raises(ValueError):
        TX.term_cooccurrence(docs, max_terms=1)


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------


def test_quantize_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.5, -1.0, 0.25, 0.125])]
    )
    r = SIM.quantize_int8(df, "vec_id", "embedding").collect()[0]
    assert r["scale"] == pytest.approx(1.0 / 127)
    # max reconstruction error of symmetric int8 is half a step
    assert r["max_abs_err"] <= r["scale"] / 2 + 1e-15
    assert r["mse"] <= (r["scale"] / 2) ** 2 + 1e-15


def test_quantize_extremes_hit_127(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[2.0, -2.0, 0.0])])
    r = SIM.quantize_int8(df, "vec_id", "embedding").collect()[0]
    assert r["q"] == [127, -127, 0]


def test_quantize_zero_vector_guarded(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[0.0, 0.0])])
    r = SIM.quantize_int8(df, "vec_id", "embedding").collect()[0]
    assert r["scale"] == 0.0 and r["q"] == [0, 0]
    assert r["mse"] == 0.0 and r["max_abs_err"] == 0.0


def test_quantize_no_shuffle_pure_map(spark, sf_dir):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    plan = (
        SIM.quantize_int8(emb, "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# int8 ANN serving tier
# ---------------------------------------------------------------------------


def test_ann_int8_recall_vs_exact(spark, sf_dir):
    """Quantized top-10 must substantially agree with the float exact
    top-10 (inner product ≈ cosine on same-norm synthetic vectors)."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = SIM.ann_topk_int8(emb, queries, k=10).collect()
    exact = SIM.cosine_topk(emb, queries, k=10).collect()
    by_q_got: dict[int, set] = {}
    by_q_exact: dict[int, set] = {}
    for r in got:
        by_q_got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(by_q_got[q] & by_q_exact[q]) / 10 for q in by_q_exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6


def test_ann_int8_dot_is_exact_integer(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, -1.0, 0.5, 0.0]),
            Row(vec_id=2, embedding=[0.5, 0.5, 0.5, 0.5]),
        ]
    )
    q = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    r = SIM.ann_topk_int8(df, q, k=5).collect()
    assert len(r) == 1
    row = r[0]
    # q(v1) = [127,-127,64,0] (scale 1/127); q(v2) = [127,127,127,127]
    # (scale .5/127); dot = 127*127 - 127*127 + 64*127 = 8128
    assert row["dot_int"] == 8128
    assert row["score"] == pytest.approx(
        8128 * (1.0 / 127) * (0.5 / 127), rel=1e-12
    )


# ---------------------------------------------------------------------------
# positional window co-occurrence
# ---------------------------------------------------------------------------


def test_window_cooccurrence_counts_planted(spark):
    # "alpha beta" adjacent 3×; "alpha ... delta" at distance 5 never
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gap1 gap2 gap3 delta") for i in range(3)]
    )
    out = {
        (r["term_a"], r["term_b"]): r["n_ab"]
        for r in TX.cooccurrence_window(
            docs, "doc_id", "text", window=4, min_count=1
        ).collect()
    }
    assert out[("alpha", "beta")] == 3
    assert ("alpha", "delta") not in out  # distance 5 > window 4
    assert out[("beta", "delta")] == 3  # distance 4 == window


def test_window_cooccurrence_unordered_canonical(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="zeta alpha zeta alpha zeta alpha")]
    )
    out = TX.cooccurrence_window(
        docs, "doc_id", "text", window=2, min_count=1
    ).collect()
    # only one unordered pair key, canonicalized (alpha, zeta)
    assert {(r["term_a"], r["term_b"]) for r in out} == {("alpha", "zeta")}


def test_window_cooccurrence_repeated_term_excluded(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="echo echo echo")])
    out = TX.cooccurrence_window(
        docs, "doc_id", "text", window=3, min_count=1
    ).collect()
    assert out == []  # self-pairs (same term) never counted


def test_window_cooccurrence_rejects_bad_params(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        TX.cooccurrence_window(docs, window=0)


# ---------------------------------------------------------------------------
# skew diagnostics
# ---------------------------------------------------------------------------


def test_skew_diagnose_hot_key_measured(spark):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        skew as SKW,
    )

    # one key holds 80% of rows
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 800, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), F.col("id")))
        .alias("k")
    )
    out = SKW.skew_diagnose(df, "k", top_n=3, target_rows_per_task=100)
    rows = {r["k"]: r for r in out.collect()}
    hot = rows["hot"]
    assert hot["n_rows"] == 800
    assert hot["share_ppm"] == 800_000
    # 201 keys total: hot is 800 / (1000/201) ≈ 160.8× the mean
    assert hot["skew_ratio_x1000"] == 160_800
    assert hot["rec_salts"] == 8


def test_skew_diagnose_uniform_keys_ratio_near_1000(spark):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        skew as SKW,
    )

    df = spark.range(0, 1000).select((F.col("id") % 10).alias("k"))
    out = SKW.skew_diagnose(df, "k", top_n=10).collect()
    assert len(out) == 10
    assert all(r["skew_ratio_x1000"] == 1000 for r in out)
    assert all(r["rec_salts"] == 1 for r in out)


def test_skew_diagnose_rejects_bad_params(spark):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        skew as SKW,
    )

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        SKW.skew_diagnose(df, "k", top_n=0)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
