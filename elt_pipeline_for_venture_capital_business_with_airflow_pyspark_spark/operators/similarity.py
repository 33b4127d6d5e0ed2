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


def _band_entries(
    df: DataFrame,
    idc: str,
    out_id: str,
    vec_col: str,
    dim: int,
    num_planes: int,
    bands: int,
    seed: int,
    keep_vec: bool = False,
) -> DataFrame:
    """(id[, vec], band, bucket:int) rows — one per band per vector,
    all computed in the scan stage (the explode is map-side). The
    bucket is the band's sign bits packed into an int directly from
    the hyperplane dot products (no string signature materialized).
    ``keep_vec`` carries the vector in the same rows — used when the
    downstream join is a broadcast (no shuffle pays for the copies);
    shuffle-joined sides leave it off and ship bare ids."""
    bits_per_band = num_planes // bands
    # all plane dot products in ONE higher-order pass over a literal
    # plane matrix (HOF lambdas are interpreted — one pass of 16 dots
    # beats 16 separate aggregate() expression trees ~2×)
    planes = F.array(
        *[
            F.array(*[F.lit(v) for v in _plane_values(seed, p, dim)])
            for p in range(num_planes)
        ]
    )
    dots = F.transform(planes, lambda pl: dot(F.col(vec_col), pl))
    cols = [F.col(idc).alias(out_id)]
    if keep_vec:
        cols.append(F.col(vec_col).alias(f"__{out_id}_vec"))
    staged = df.select(*cols, dots.alias("__dots"))
    buckets = [
        F.struct(
            F.lit(b).alias("band"),
            sum(
                (
                    F.when(
                        F.element_at("__dots", b * bits_per_band + j + 1) > 0,
                        F.lit(1 << j),
                    ).otherwise(F.lit(0))
                    for j in range(bits_per_band)
                ),
                start=F.lit(0),
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    out = staged.select(
        out_id,
        *([f"__{out_id}_vec"] if keep_vec else []),
        F.explode(F.array(*buckets)).alias("bb"),
    )
    keep = [out_id] + ([f"__{out_id}_vec"] if keep_vec else [])
    return out.select(*keep, "bb.band", "bb.bucket")


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
    exact cosine reranks. Recall is tunable via planes/bands.

    Scale shape: **one corpus scan, score-in-map, tiny shuffle.** Band
    entries for the (small) query set are broadcast WITH their vectors;
    the corpus streams through the broadcast join and cosine is
    computed immediately, so the only shuffled bytes are
    (query_id, neighbor_id, sim) triples — the multi-band duplicate
    collisions collapse in a groupBy (max = first, the values are
    identical) that doubles as the dedup, then the per-query window
    ranks. The corpus vector never crosses a shuffle boundary."""
    cb = _band_entries(
        corpus, id_col, "neighbor_id", vec_col, dim, num_planes, bands, seed,
        keep_vec=True,
    )
    qb = _band_entries(
        queries, query_id_col, "query_id", vec_col, dim, num_planes, bands, seed,
        keep_vec=True,
    )
    scored = (
        cb.join(F.broadcast(qb), on=["band", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim", cosine(F.col("__query_id_vec"), F.col("__neighbor_id_vec"))
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_source: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the partition-pruning
    complement to hyperplane LSH: the corpus is bucketed once by
    nearest centroid; each query probes only its ``n_probe`` nearest
    cells, so the scored fraction is ~n_probe/n_centroids of the
    corpus regardless of scale.

    Centroids are a deterministic hash-ordered sample of the corpus
    (collected to the driver as plan literals — centroid metadata is
    KB-sized, exactly like the LSH plane matrix; swap in k-means
    centroids offline for better cell balance, the query path is
    unchanged). Pass ``centroid_source`` to pick centroids from a
    plain id-ordered frame instead of the hash sample — that variant
    is SQL-replicable end to end (see the ``embedding_ivf_sqlcheck``
    oracle query). Cluster assignment = argmax centroid cosine, ties
    to the lowest cell index — deterministic. At 100 TB the assigned
    corpus would be written ``partitionBy(cell)`` so a probe prunes
    parquet partitions instead of filtering a scan.
    """
    if centroid_source is not None:
        cent_rows = (
            centroid_source.select(
                F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
            )
            .orderBy("cid")
            .limit(n_centroids)
            .collect()
        )
    else:
        cent_rows = (
            corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
            .withColumn("__h", F.xxhash64(F.col("cid").cast("string")))
            .orderBy("__h", "cid")
            .limit(n_centroids)
            .collect()
        )
    cmat = F.array(
        *[F.array(*[F.lit(float(v)) for v in r["cv"]]) for r in cent_rows]
    )

    def with_sims(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        sims = F.transform(cmat, lambda c: cosine(F.col(vec_col), c))
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(f"__{out_id}_vec"),
            sims.alias("__sims"),
        )

    assigned = with_sims(corpus, id_col, "neighbor_id").select(
        "neighbor_id",
        "__neighbor_id_vec",
        (F.array_position(F.col("__sims"), F.array_max(F.col("__sims"))) - 1)
        .cast("int")
        .alias("cell"),
    )

    idx_sims = F.transform(
        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
        lambda i: F.struct(
            i.cast("int").alias("idx"),
            F.element_at(F.col("__sims"), (i + 1).cast("int")).alias("sim"),
        ),
    )
    by_sim_desc = F.array_sort(
        idx_sims,
        lambda x, y: F.when(x["sim"] > y["sim"], -1)
        .when(x["sim"] < y["sim"], 1)
        .otherwise(x["idx"] - y["idx"]),
    )
    probes = with_sims(queries, query_id_col, "query_id").select(
        "query_id",
        "__query_id_vec",
        F.explode(
            F.transform(F.slice(by_sim_desc, 1, n_probe), lambda s: s["idx"])
        ).alias("cell"),
    )

    scored = (
        assigned.join(F.broadcast(probes), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine_sim", cosine(F.col("__query_id_vec"), F.col("__neighbor_id_vec"))
        )
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
    in some band with high probability). Band join and pair dedup
    shuffle bare ids; vectors rejoin once per side for the rerank."""
    b_df = _band_entries(corpus, id_col, "id", vec_col, dim, num_planes, bands, seed)
    a, b = b_df.alias("a"), b_df.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
