"""Clustering operators: exact fixed-point Lloyd k-means over an
embedding column.

IVF ANN (`operators/similarity.ivf_topk`) needs trained centroids;
corpus curation needs topic-shaped buckets. Both come from k-means,
implemented here as a fixed-iteration DataFrame loop whose result is
*bit-for-bit deterministic across engines and partitionings*:

- Vectors are quantized ONCE to scaled integers
  (``floor(x * 1e6)`` per dimension; float→double widening and the
  ×1e6 multiply are IEEE-identical everywhere), so every distance is
  an exact BIGINT sum of squared integer diffs and every centroid
  update is an exact integer mean (truncating ``div``) — no float
  accumulation order can leak into the result.
- Seeding is deterministic: the k vectors with the smallest ids are
  the initial centroids, and each cluster is *named by its seed id*
  (no dependence on arrival order, unlike kmeans++ with an RNG).
- Assignment ties break to the smallest cluster id via a
  lexicographic ``min(struct(dist, cluster))``.

Shape at scale (n vectors × d dims, k clusters):

- quantize = one narrow projection (``posexplode`` → (id, pos, q));
- assignment = broadcast join of the k·d centroid rows against the
  exploded vectors, partial-agg on (id, cluster), then argmin agg on
  id — the n·k·d intermediate is the irreducible dense-assignment
  cost and it streams through whole-stage codegen without ever
  materializing per-vector matrices;
- update = one partial-agg shuffle keyed (cluster, pos) carrying
  k·d result rows.

The iteration count is fixed, so the whole loop is ONE lazy plan; no
driver collect, no convergence read-back. Empty clusters drop out of
the centroid frame and later assignments simply ignore them (same
rule in the SQL oracle). For very large n·k·d, sample the update
step (mini-batch) or seed from `embedding_label_centroids` — the
assignment shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fixed_assign", "quantize_vectors"]


def quantize_vectors(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Explode ``vec_col`` to exact scaled-integer components:
    ``(id, pos, q)`` with 1-based ``pos`` and
    ``q = floor(double(x) * scale)`` as BIGINT."""
    return emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("pos0", "_v"),
    ).select(
        id_col,
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("_v").cast("double") * scale).cast("bigint").alias("q"),
    )


def kmeans_fixed_assign(
    emb: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Run ``n_iter`` exact Lloyd iterations and return the final
    assignment ``(id, cluster, d2)``: nearest-centroid cluster (named
    by seed id) and the exact squared quantized distance.

    Sequence: assign with seeds → update → … → update → final assign,
    i.e. ``n_iter`` centroid updates and ``n_iter + 1`` assignment
    passes, all inside one lazy plan.
    """
    q = quantize_vectors(emb, id_col=id_col, vec_col=vec_col, scale=scale)
    seed_ids = emb.select(id_col).orderBy(id_col).limit(k)
    cents = q.join(F.broadcast(seed_ids), id_col, "inner").select(
        F.col(id_col).alias("cluster"), "pos", F.col("q").alias("cq")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        diff = F.col("q") - F.col("cq")
        return (
            q.join(F.broadcast(centroids), "pos")
            .groupBy(id_col, "cluster")
            .agg(F.sum(diff * diff).alias("d2"))
            .groupBy(id_col)
            .agg(F.min(F.struct("d2", "cluster")).alias("_best"))
            .select(id_col, F.col("_best.cluster").alias("cluster"), F.col("_best.d2").alias("d2"))
        )

    for _ in range(n_iter):
        a = assign(cents)
        cents = (
            q.join(a.select(id_col, "cluster"), id_col, "inner")
            .groupBy("cluster", "pos")
            .agg(F.sum("q").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select("cluster", "pos", F.expr("_s div _n").alias("cq"))
        )
    return assign(cents)
