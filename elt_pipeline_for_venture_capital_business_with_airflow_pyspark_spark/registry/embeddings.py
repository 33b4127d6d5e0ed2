"""Registry family: embeddings (19 queries).

- embedding_topk_bruteforce
- embedding_near_dup_exact
- embedding_near_dup_lsh
- embedding_ann_lsh
- embedding_ivf_topk
- embedding_label_centroids
- embedding_ivf_sqlcheck
- embedding_ivf_persisted
- embedding_ivf_int8
- embedding_pq_codes
- embedding_ivfpq_sqlcheck
- embedding_near_dup_sqlcheck
- embedding_ann_sqlcheck
- embedding_bitext_mine
- embedding_bitext_ivf
- embedding_semantic_dedup
- embedding_quantize_int8
- embedding_ann_int8
- embedding_mmr_rerank
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- similarity search (north star) ------------------------------------------

@_register(
    "embedding_topk_bruteforce",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.qvec, c.cvec)
               / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.cvec, c.cvec)))
               AS cosine_sim
      FROM c, q WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, rank, neighbor_id, ROUND(cosine_sim, 6) AS cosine_sim FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def _embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force exact cosine top-k (k=10) for 5 query vectors —
    the ANN correctness baseline. Similarity rounded to 6dp for
    cross-engine float stability."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # dim unroll deliberately NOT passed: 10k scored pairs — the
    # unrolled tree costs more in plan optimization than it saves in
    # execution at this volume (measured +0.5s); norm-precompute alone
    out = SIM.cosine_topk(emb, queries, k=10, id_col="vec_id", vec_col="embedding")
    return out.select(
        "query_id", "rank", "neighbor_id", F.round("cosine_sim", 6).alias("cosine_sim")
    )


@_register(
    "embedding_near_dup_exact",
    """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec))
                * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec)
          / (sqrt(list_dot_product(a.vec, a.vec))
             * sqrt(list_dot_product(b.vec, b.vec))) >= 0.4
    """,
)
def _embedding_near_dup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (≥0.4)."""
    emb = read_table(spark, sf, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("vec_a"),
        SIM.norm(F.col("embedding")).alias("__na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vec_b"),
        SIM.norm(F.col("embedding")).alias("__nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = SIM.cosine_pre(
        F.col("vec_a"), F.col("vec_b"), F.col("__na"), F.col("__nb"), 64
    )
    return (
        pairs.withColumn("cosine_sim_raw", sim)
        .filter(F.col("cosine_sim_raw") >= 0.4)
        .select("id_a", "id_b", F.round("cosine_sim_raw", 6).alias("cosine_sim"))
    )


@_register("embedding_near_dup_lsh", None)
def _embedding_near_dup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-banded embedding near-dup pairs (≥0.4) — the linear-cost
    variant of embedding_near_dup_exact (rows-only check; recall vs
    the exact pairs asserted in tests)."""
    emb = read_table(spark, sf, "embeddings")
    out = SIM.embedding_near_dup(emb, dim=64, threshold=0.4, num_planes=16, bands=8)
    return out.select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))


@_register("embedding_ann_lsh", None)
def _embedding_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate top-k — the scale path (rows-only
    check; recall vs brute force asserted in tests)."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_ann_topk(
        emb, queries, dim=64, k=10, num_planes=16, bands=8
    )


@_register("embedding_ivf_topk", None)
def _embedding_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest deterministic
    centroid, queries probe n_probe cells — the partition-pruning ANN
    complement to the hyperplane-LSH path (rows-only check; recall vs
    brute force asserted in tests)."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(emb, queries, dim=64, k=10, n_centroids=16, n_probe=8)


@_register(
    "embedding_label_centroids",
    """
    WITH e AS (
      SELECT label, unnest(range(1, 65)) AS pos, embedding
      FROM embeddings
    )
    SELECT label, pos, COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(CAST(embedding[pos] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS centroid_scaled
    FROM e GROUP BY label, pos
    """,
)
def _embedding_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroids (dim-wise means) — the vector
    aggregation IVF/k-means training is built from: posexplode →
    (label, dim) partial sums; the shuffle carries |labels|×dim rows,
    never vectors. Determinism across engines via scale-to-int-floor
    before summing (float→double widening and ×1e6 are IEEE-identical;
    bigint sums are exact)."""
    emb = read_table(spark, sf, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
    return (
        e.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("v").cast("double") * 1_000_000))
                .cast("double") / F.count(F.lit(1))
            ).alias("centroid_scaled"),
        )
        .select("label", "pos", "n", "centroid_scaled")
    )


@_register("embedding_ivf_sqlcheck", _ivf_sqlcheck_sql())
def _embedding_ivf_sqlcheck(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with id-ordered centroids — the oracle-hash-checked
    variant: every cell assignment, probe choice and cosine double is
    bit-identical in ANSI SQL (explicit fold-order arithmetic). The
    hash-sampled-centroid variant stays rows-only
    (embedding_ivf_topk)."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(
        emb,
        queries,
        dim=64,
        k=10,
        n_centroids=16,
        n_probe=8,
        centroid_source=emb.filter(F.col("vec_id") < 16),
    )


@_register("embedding_ivf_persisted", _ivf_sqlcheck_sql())
def _embedding_ivf_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """The PERSISTED-index variant of embedding_ivf_sqlcheck — same
    oracle, bit-identical result, different physical story: the
    corpus is assigned to centroids ONCE and written partitionBy(cell)
    (similarity.build_ivf_index); the probe reads only the probed cell
    DIRECTORIES via a literal partition filter (ivf_probe_index) and
    never re-assigns or re-scans the rest. This is the 100 TB serving
    path the in-flight ivf_topk docstring promises; at daily cadence
    new vectors append against frozen centroids (append_ivf_index),
    the exact analogue of dedup_incremental_lsh."""
    import os

    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = "/tmp/spark_graft_ivf_index_" + os.path.basename(
        os.path.normpath(sf)
    )
    SIM.build_ivf_index(
        emb,
        path,
        n_centroids=16,
        centroid_source=emb.filter(F.col("vec_id") < 16),
    )
    return SIM.ivf_probe_index(queries, path, k=10, n_probe=8)


@_register("embedding_ivf_int8", _ivf_int8_sql())
def _embedding_ivf_int8(spark: SparkSession, sf: str) -> DataFrame:
    """The COMPOSED serving tier (r7): int8 vectors INSIDE the
    persisted IVF index — build_ivf_index(quantize=True) stores
    (id, scale, q) per cell (quantization in the write projection,
    zero extra passes), the probe detects the tier from the cells
    schema, reads 4× fewer bytes from only the probed cell
    DIRECTORIES, and scores with the exact-BIGINT integer dot. Cell
    choice is bit-identical to the float tier; this is the shape a
    100-TB embedding corpus actually serves from (directory pruning ×
    quantized IO). Fully oracle-hash-checked — dots, scores, ranks —
    because the ranking key's integer part is exact cross-engine
    (append==rebuild + recall-vs-float laws pinned in
    tests/test_index_lifecycle.py)."""
    import os

    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = "/tmp/spark_graft_ivf_int8_" + os.path.basename(
        os.path.normpath(sf)
    )
    SIM.build_ivf_index(
        emb,
        path,
        n_centroids=16,
        centroid_source=emb.filter(F.col("vec_id") < 16),
        quantize=True,
    )
    return SIM.ivf_probe_index(queries, path, k=10, n_probe=8)


@_register("embedding_pq_codes", _pq_codes_sql())
def _embedding_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization encode (operators/similarity.pq_codes):
    each 64-dim vector becomes 8 one-byte subspace codes — 32× less
    state than float32 — via exact integer argmin against the
    id-ordered codebook. One shuffle-free map stage; the argmin is an
    array_min over struct(d2, j), pure codegen. Hash-checked against
    the identical integer arithmetic in SQL."""
    emb = read_table(spark, sf, "embeddings")
    return SIM.pq_codes(emb, dim=64).select(
        F.col("id"), F.col("s"), F.col("code")
    )


@_register("embedding_ivfpq_sqlcheck", _ivfpq_sqlcheck_sql())
def _embedding_ivfpq_sqlcheck(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ approximate top-k (operators/similarity.ivfpq_topk): the
    memory-compression ANN scale path — corpus state per vector is one
    cell id + 8 codes; candidates come from an equi-join on probed
    cells; scoring is 8 ADC table lookups per candidate regardless of
    dim. Every cell, code, and score is exact integer arithmetic,
    hash-checked end to end."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivfpq_topk(emb, queries, dim=64, k=10)


@_register("embedding_near_dup_sqlcheck", _near_dup_sqlcheck_sql())
def _embedding_near_dup_sqlcheck(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-banded embedding near-dup pairs, oracle-hash-checked with
    raw (unrounded) cosine doubles — the hash-checked twin of
    embedding_near_dup_lsh."""
    emb = read_table(spark, sf, "embeddings")
    return SIM.embedding_near_dup(
        emb, dim=64, threshold=0.4, num_planes=16, bands=8
    ).select("id_a", "id_b", "cosine_sim")


@_register("embedding_ann_sqlcheck", _ann_lsh_sqlcheck_sql())
def _embedding_ann_sqlcheck(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperplane-LSH ANN, oracle-hash-checked end to end: same plane
    literals, same sign-bit buckets, same band-collision candidates,
    bit-identical cosine rerank (see _ann_lsh_sqlcheck_sql)."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.lsh_ann_topk(emb, queries, dim=64, k=10, num_planes=16, bands=8)


@_register("embedding_bitext_mine", _bitext_sql())
def _embedding_bitext_mine(spark: SparkSession, sf: str) -> DataFrame:
    """Margin-based parallel-pair mining
    (similarity.bitext_margin_mine — the Artetxe & Schwenk ratio
    margin behind CCMatrix-style bitext harvesting): even-label
    vectors play the source language, odd-label the target; each
    source's best forward neighbor is kept iff its cosine, normalized
    by both sides' rank-order-folded k-NN averages, clears margin ≥ 1.
    The backward pass scores only targets the forward pass surfaced.
    Brute-force neighbor lists here (the oracle needs exact); at
    corpus scale swap topk_fn for the persisted-IVF probe — the
    margin stage is unchanged."""
    emb = read_table(spark, sf, "embeddings")
    left = emb.filter(F.col("label") % 2 == 0)
    right = emb.filter(F.col("label") % 2 == 1)
    return SIM.bitext_margin_mine(left, right, k=4, threshold=1.0)


@_register("embedding_bitext_ivf", None)
def _embedding_bitext_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """The ANN-backed scale path of embedding_bitext_mine (its
    hash-checked exact twin — same margin stage, same output schema;
    rows-only here because IVF neighbor lists are approximate by
    design, like the LSH trio): both sides are persisted as IVF
    indexes (corpus partitionBy(cell), frozen deterministic
    centroids), and the forward/backward top-k come from
    ivf_probe_index — each probe reads ONLY the probed cell
    directories via a literal partition filter, so the corpus×corpus
    mining cost drops from |L|·|R| to |L|·(probed cells), the
    sub-quadratic shape CCMatrix-scale harvesting needs. The margin
    re-ranking is unchanged (bitext_margin_mine is oblivious to the
    neighbor source); recall vs the exact twin is pinned ≥0.6 in
    tests/test_llm_ops.py::test_bitext_composes_with_ivf_probe and
    measured in BENCH_SCALING (round-6 addendum)."""
    import os

    emb = read_table(spark, sf, "embeddings")
    left = emb.filter(F.col("label") % 2 == 0)
    right = emb.filter(F.col("label") % 2 == 1)
    tag = os.path.basename(os.path.normpath(sf))
    lp = f"/tmp/spark_graft_bitext_ivf_left_{tag}"
    rp = f"/tmp/spark_graft_bitext_ivf_right_{tag}"
    SIM.build_ivf_index(
        left, lp, n_centroids=8, centroid_source=left.filter(F.col("vec_id") < 20)
    )
    SIM.build_ivf_index(
        right, rp, n_centroids=8, centroid_source=right.filter(F.col("vec_id") < 20)
    )

    def _ann(corpus: DataFrame, qdf: DataFrame, k: int) -> DataFrame:
        path = rp if corpus is right else lp
        return SIM.ivf_probe_index(qdf, path, k=k, n_probe=6)

    return SIM.bitext_margin_mine(left, right, k=4, threshold=1.0, topk_fn=_ann)


@_register(
    "embedding_semantic_dedup",
    f"""
    WITH assign AS ({_kmeans_sql(8, 2, 64)})
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN({{'d2': d2, 'vec_id': vec_id}}).vec_id AS rep_vec_id,
           MIN(d2) AS rep_d2
    FROM assign
    GROUP BY cluster
    """,
)
def _embedding_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic deduplication policy: cluster the embedding space
    (exact integer-quantized Lloyd, same construction as
    cluster_kmeans) and keep ONE representative per cluster — the
    member nearest its centroid, ties to the smallest id. This is the
    coarse semantic-redundancy reducer that complements near-dup LSH
    (LSH kills near-copies; cluster representatives thin out
    *topically* redundant regions). The argmin is a lexicographic
    min(struct(d2, vec_id)) aggregate — no per-cluster sort, one
    partial-agg shuffle over the assignment output."""
    emb = read_table(spark, sf, "embeddings")
    assign = CL.kmeans_fixed_assign(emb, k=8, n_iter=2)
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.min(F.struct("d2", "vec_id"))["vec_id"].alias("rep_vec_id"),
        F.min("d2").alias("rep_d2"),
    )


@_register(
    "embedding_quantize_int8",
    """
    WITH x AS (
      SELECT vec_id, len(embedding) AS n_dims,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
      FROM embeddings
    ), s AS (
      SELECT vec_id, n_dims, xd,
             list_reduce(list_prepend(0.0, list_transform(xd, v -> abs(v))),
                         (a, b) -> greatest(a, b)) AS maxabs
      FROM x
    ), t AS (
      SELECT vec_id, n_dims, xd, maxabs / 127.0 AS scale,
             CASE WHEN maxabs = 0
                  THEN list_transform(xd, v -> 0)
                  ELSE list_transform(xd, v ->
                       CAST(floor(v / (maxabs / 127.0) + 0.5) AS INT))
             END AS q
      FROM s
    ), e AS (
      SELECT vec_id, n_dims, scale, q,
             list_transform(list_zip(xd, q),
                            z -> z[1] - CAST(z[2] AS DOUBLE) * scale)
               AS err
      FROM t
    )
    SELECT vec_id, n_dims, scale,
           array_to_string(q, ',') AS q_str,
           list_reduce(list_prepend(0.0, list_transform(err, v -> v * v)),
                       (a, b) -> a + b) / n_dims AS mse,
           list_reduce(list_prepend(0.0, list_transform(err, v -> abs(v))),
                       (a, b) -> greatest(a, b)) AS max_abs_err
    FROM e
    """,
)
def _embedding_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vector symmetric int8 quantization + reconstruction audit
    (operators/similarity.quantize_int8): the 4×-compression storage
    tier a 100-TB embedding corpus serves from, as a PURE MAP — no
    shuffle, no UDF, one codegen scan. floor(x/scale + 0.5) instead
    of round() (whose half-rule differs across engines); scale, the
    full int8 vector (serialized), MSE and max-abs-err all
    hash-checked bit-for-bit against DuckDB's list_reduce over the
    same fixed-order folds."""
    emb = read_table(spark, sf, "embeddings")
    out = SIM.quantize_int8(emb, "vec_id", "embedding")
    return out.select(
        "vec_id",
        F.col("n_dims").cast("bigint").alias("n_dims"),
        "scale",
        F.array_join(
            F.transform(F.col("q"), lambda v: v.cast("string")), ","
        ).alias("q_str"),
        "mse",
        "max_abs_err",
    )



@_register(
    "embedding_ann_int8",
    """
    WITH xd AS (
      SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd
      FROM embeddings
    ), mx AS (
      SELECT vec_id, xd,
             list_reduce(list_prepend(0.0, list_transform(xd, v -> abs(v))),
                         (a, b) -> greatest(a, b)) AS maxabs
      FROM xd
    ), q8 AS (
      SELECT vec_id, maxabs / 127.0 AS scale,
             CASE WHEN maxabs = 0 THEN list_transform(xd, v -> 0)
                  ELSE list_transform(xd, v ->
                       CAST(floor(v / (maxabs / 127.0) + 0.5) AS INT))
             END AS q
      FROM mx
    ), scored AS (
      SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(list_zip(cc.q, qq.q),
                   z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT))),
               (a, b) -> a + b) AS dot_int,
             cc.scale AS sc, qq.scale AS sq
      FROM q8 cc, q8 qq
      WHERE qq.vec_id < 5 AND cc.vec_id <> qq.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, dot_int,
             dot_int * sc * sq AS score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_int * sc * sq DESC, neighbor_id)
               AS rank
      FROM scored
    )
    SELECT query_id, rank, neighbor_id, dot_int, score
    FROM ranked WHERE rank <= 10
    """,
)
def _embedding_ann_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k retrieval FROM THE QUANTIZED TIER
    (operators/similarity.ann_topk_int8): both sides int8-quantized in
    the scan projection, dots accumulated as exact BIGINTs (no float
    sum anywhere), scores recovered by two fixed-order multiplies —
    so unlike every float ANN path, the ranking key itself is
    oracle-exact with no epsilon. Same single-scan broadcast shape as
    the brute-force baseline; at 100 TB this is the 4×-less-IO serving
    path, with recall vs the float exact top-k pinned in
    tests/test_round6_ops.py."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ann_topk_int8(emb, queries, k=10)


@_register("embedding_mmr_rerank", _mmr_sql(4, 12))
def _embedding_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Diversified retrieval (similarity.mmr_rerank): brute top-12
    cosine candidates per query re-ranked by Maximal Marginal
    Relevance (λ=0.5, k=4) — the serving-tier step that keeps a
    retrieved context from being k near-copies of one document. The
    greedy loop is unrolled into the PLAN as four window+join stages
    over candidate-sized data (no Python, no collect; cost independent
    of corpus size because the input is retrieval output). Oracle:
    the same greedy algebra unrolled as SQL CTEs — every selection
    hash-matched, proving the plan-shaped loop implements the exact
    textbook recurrence."""
    emb = read_table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # no dim unroll: the cand subtree is re-planned in every MMR round
    cand = SIM.cosine_topk(emb, queries, k=12, id_col="vec_id")
    cand = cand.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return SIM.mmr_rerank(cand, k=4, lambda_=0.5)


def _semantic_dedup_sql(dim: int = 64, threshold: float = 0.4) -> str:
    """ANSI-SQL twin of SemDeDup-style semantic dedup, restated
    UNGROUPED (all pairs within a cell) — hash-matching it proves the
    Spark side's identical-vector collapse changes nothing. Same
    explicit fold-order float arithmetic as _ivf_sqlcheck_sql; the
    ``dot(v,v) > 0`` scope predicate is the operator's documented
    corrupt/zero-vector exclusion, restated verbatim."""

    def dot(a: str, b: str) -> str:
        return " + ".join(
            f"CAST({a}[{i}] AS DOUBLE)*CAST({b}[{i}] AS DOUBLE)"
            for i in range(1, dim + 1)
        )

    def cos(a: str, b: str) -> str:
        return f"(({dot(a, b)}) / (sqrt({dot(a, a)}) * sqrt({dot(b, b)})))"

    return f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cv FROM embeddings
      WHERE vec_id < 16 AND embedding IS NOT NULL
    ), live AS (
      SELECT vec_id, embedding AS nv FROM embeddings
      WHERE ({dot("embedding", "embedding")}) > 0
    ), assigned AS (
      SELECT l.vec_id, l.nv, c.cid, {cos("l.nv", "c.cv")} AS sim
      FROM live l CROSS JOIN c
    ), acell AS (
      SELECT vec_id, nv, cid AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        FROM assigned) WHERE rn = 1
    ), pruned AS (
      SELECT a.vec_id, MIN(b.vec_id) AS pruned_by
      FROM acell a JOIN acell b ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE {cos("a.nv", "b.nv")} >= {threshold}
      GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           p.pruned_by IS NULL AS kept, p.pruned_by
    FROM acell a LEFT JOIN pruned p ON a.vec_id = p.vec_id
    """


@_register("embedding_semdedup_prune", _semantic_dedup_sql())
def _embedding_semdedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication, the embedding-space complement of MinHash/SimHash
    (round 10): cluster by nearest id-ordered centroid, then within
    each cluster prune every vector cosine-≥-0.4-similar to a
    lower-id vector (the published greedy keep-first rule). Output is
    a per-vector keep/prune verdict with provenance (pruned_by). The
    oracle restates the UNGROUPED all-pairs-within-cell rule with
    explicit fold-order float arithmetic, so the hash match doubles
    as the grouped==ungrouped equivalence proof for the operator's
    identical-vector hot-bucket guard."""
    emb = read_table(spark, sf, "embeddings")
    return SIM.semantic_dedup(
        emb,
        dim=64,
        n_centroids=16,
        threshold=0.4,
        centroid_source=emb.filter(F.col("vec_id") < 16),
    )
