"""Similarity search over an embedding column (BASELINE.json north star).

Embeddings are ``array<float>`` columns. All vector math is built from
``zip_with``/``aggregate`` expressions (JVM-side, codegen) — elements
are cast to double before accumulation so results are deterministic
IEEE-754 left-to-right folds, matching a sequential oracle.

Three tiers:
- ``cosine_topk``       : brute-force exact top-k — the correctness
                          baseline; broadcast the (small) query set, so
                          the corpus is scanned once, no shuffle of the
                          corpus itself.
- ``lsh_ann_topk``      : random-hyperplane LSH buckets → candidates →
                          exact rerank. The 100 TB path: candidate
                          generation is an equi-join on bucket keys.
- ``embedding_near_dup``: all pairs with cosine ≥ threshold via LSH
                          banding over sign bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Σ a[i]·b[i] with double accumulation, sequential fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (query_id, embedding) is broadcast; the corpus streams
    through one scan computing similarities, then a per-query window
    picks the top k (ties broken by corpus id → deterministic).
    Excludes self-matches when ids collide.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def _plane_values(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1):
    md5(seed:plane:j) → uniform double. Generated driver-side once and
    embedded as plan literals — no RNG state, no per-row hashing."""
    import hashlib

    vals = []
    for j in range(dim):
        h = int.from_bytes(
            hashlib.md5(f"{seed}:{plane}:{j}".encode()).digest()[:8], "big"
        )
        vals.append((h % 2000003) / 1000001.5 - 1.0)
    return vals


def lsh_sign_bits(
    vec: F.Column, dim: int, num_planes: int = 16, seed: int = 7
) -> F.Column:
    """Random-hyperplane signature as a '0'/'1' bit string: char p =
    sign(vec · plane_p). The planes are literal constant arrays, so the
    whole signature is one codegen'd expression over the vector."""
    planes = F.array(
        *[
            F.array(*[F.lit(v) for v in _plane_values(seed, p, dim)])
            for p in range(num_planes)
        ]
    )
    bits = F.transform(
        planes, lambda pl: F.when(dot(vec, pl) > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.array_join(bits, "")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: corpus and queries are bucketed by bands of
    hyperplane sign bits; only same-bucket candidates are scored, then
    exact cosine reranks. Recall is tunable via planes/bands; candidate
    join is an equi-join on (band, bucket) → shuffles only keys+ids,
    scales out linearly."""
    bits_per_band = num_planes // bands

    def with_bands(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sig = lsh_sign_bits(F.col(vec_col), dim, num_planes, seed)
        return df.select(
            F.col(idc).alias(out_id), F.col(vec_col).alias(f"__{out_id}_vec"), sig.alias("__sig")
        ).select(
            out_id,
            f"__{out_id}_vec",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.substring(
                                F.col("__sig"), b * bits_per_band + 1, bits_per_band
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(out_id, f"__{out_id}_vec", "bb.band", "bb.bucket")

    cb = with_bands(corpus, id_col, "neighbor_id")
    qb = with_bands(queries, query_id_col, "query_id")
    cand = (
        cb.join(qb, on=["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__query_id_vec", "__neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine_sim", cosine(F.col("__query_id_vec"), F.col("__neighbor_id_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def embedding_near_dup(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold, generated via
    sign-bit band collisions + exact rerank (high-cosine pairs collide
    in some band with high probability)."""
    bits_per_band = num_planes // bands
    sig = lsh_sign_bits(F.col(vec_col), dim, num_planes, seed)
    b_df = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), sig.alias("__sig")
    ).select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(
                            F.col("__sig"), b * bits_per_band + 1, bits_per_band
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "vec", "bb.band", "bb.bucket")

    a, b = b_df.alias("a"), b_df.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cosine_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
