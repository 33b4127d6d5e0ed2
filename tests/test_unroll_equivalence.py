"""Round-12 optimization guards: the guarded-unrolled arithmetic paths
must be BIT-IDENTICAL to the higher-order-function forms they replace,
including on the degenerate shapes the robustness sweeps mutate into
existence (short arrays, NULL elements, NULL columns), and the
direct-stream meta writer must round-trip through the unchanged
spark.read.text read path.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    similarity as SIM,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0]),
        (2, [4.0, 3.0, 2.0, 1.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero norm
        (4, [1.0, 2.0]),  # short array -> HOF fallback branch
        (5, [1.0, None, 3.0, 4.0]),  # NULL element
        (6, None),  # NULL vector
        (7, [1.5, -2.5, 0.5, 9.0, 7.0]),  # longer than dim
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


def _hof_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def test_unrolled_dot_bit_identical_all_shapes(vec_df):
    pairs = vec_df.alias("a").crossJoin(
        vec_df.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    )
    out = pairs.select(
        "id",
        "id_b",
        _hof_dot(F.col("v"), F.col("vb")).alias("hof"),
        SIM.dot(F.col("v"), F.col("vb"), 4).alias("unrolled"),
    ).collect()
    for r in out:
        assert r["hof"] == r["unrolled"], (r["id"], r["id_b"], r["hof"], r["unrolled"])


def test_cosine_pre_matches_cosine(vec_df):
    pairs = (
        vec_df.select("id", F.col("v").alias("va"), SIM.norm(F.col("v")).alias("na"))
        .crossJoin(
            vec_df.select(
                F.col("id").alias("id_b"),
                F.col("v").alias("vb"),
                SIM.norm(F.col("v")).alias("nb"),
            )
        )
    )
    out = pairs.select(
        SIM.cosine(F.col("va"), F.col("vb")).alias("plain"),
        SIM.cosine_pre(
            F.col("va"), F.col("vb"), F.col("na"), F.col("nb"), 4
        ).alias("pre"),
    ).collect()
    for r in out:
        assert r["plain"] == r["pre"], (r["plain"], r["pre"])


def test_py_norm_matches_jvm_fold(spark):
    cv = [0.1, -2.7, 3.14159, 1e-9, 42.0]
    jvm = (
        spark.range(1)
        .select(
            F.sqrt(
                _hof_dot(
                    F.array(*[F.lit(float(v)) for v in cv]),
                    F.array(*[F.lit(float(v)) for v in cv]),
                )
            ).alias("n")
        )
        .collect()[0]["n"]
    )
    assert SIM._py_norm(cv) == jvm


def test_score_candidates_unroll_matches_hof(spark):
    # signatures incl. an off-length row (sweep shape) and NULL slots
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(30):
        sig = [rnd.randrange(0, 5) for _ in range(8)]
        rows.append((i, sig))
    rows.append((30, [1, 2, 3]))  # off-length -> fallback branch
    rows.append((31, [1, None, 3, 4, 5, 6, 7, 8]))  # NULL slot
    sig = spark.createDataFrame(rows, "id long, signature array<long>")
    cand = (
        sig.select(F.col("id").alias("id_a"))
        .crossJoin(sig.select(F.col("id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators.dedup import (
        _score_candidates,
    )

    got = _score_candidates(cand, sig, sig, 8, 0.0)
    as_int = F.transform(F.col("signature"), lambda x: x.cast("int"))
    sa = sig.select(F.col("id").alias("id_a"), as_int.alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), as_int.alias("sig_b"))
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(8.0)
    want = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= 0.0)
        .select("id_a", "id_b", "est_jaccard")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_write_small_text_roundtrip(spark, tmp_path):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        write_small_text,
    )

    p = str(tmp_path / "meta")
    meta = {"k": 3, "bands": 16}
    write_small_text(spark, p, json.dumps(meta, sort_keys=True))
    rows = spark.read.text(p).collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["value"]) == meta
    # overwrite replaces, never appends
    write_small_text(spark, p, json.dumps({"k": 5}))
    rows = spark.read.text(p).collect()
    assert len(rows) == 1 and json.loads(rows[0]["value"]) == {"k": 5}
