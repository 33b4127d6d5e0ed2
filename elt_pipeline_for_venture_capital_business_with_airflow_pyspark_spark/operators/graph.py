"""Graph operators: fixed-iteration PageRank over an edge DataFrame.

The reference's star schema encodes a graph it never analyzes —
investments link companies to funds exactly the way lineitems link
customers to suppliers (`dataset/warehouse/init_dwh.sql:75-114`,
FK pairs at :172-177). Entity-importance ranking over that bipartite
FK graph (which funds/suppliers sit at the center of the network) is
a standard warehouse ask, and on Spark it is a pure DataFrame loop —
no GraphX, no RDDs.

Design for scale:

- One iteration = join ``ranks`` to ``edges`` on the source key
  (shuffle keyed by ``src``) + ``groupBy(dst)`` partial-agg shuffle.
  Both shuffles are on stable keys, so AQE reuses the edge exchange
  across iterations; per-iteration state is one BIGINT per node —
  never adjacency lists in memory.
- The iteration count is FIXED (power iteration truncated at
  ``n_iter``), not convergence-tested: no driver-side loop condition
  reads data, so the whole multi-iteration plan is still a single
  lazy DAG and the driver never collects anything.
- All arithmetic is scaled-integer fixed point: ranks start at
  ``scale`` (1e9), contributions are ``rank div outdeg`` and the
  update is ``((100-d)·scale) div 100 + (d·Σcontrib) div 100`` with
  integer truncating division — bit-identical across engines and
  partitionings (no float accumulation order anywhere). With
  BIGINT ranks the sums stay exact past 1e6 nodes × 1e9 scale.

Dangling nodes (no out-edges) simply leak their mass, the classic
truncated-power-iteration simplification; feed an undirected
(symmetrized) edge list to avoid dangling nodes entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pagerank_fixed",
    "symmetrize_edges",
    "khop_min_dist",
    "triangle_counts",
]


def symmetrize_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of a directed distinct edge list: each edge
    emitted in both directions. Input must already be distinct pairs;
    the output is then distinct too (a→b and b→a collide only if both
    directions were present, so a final dedup is still applied for
    safety — one shuffle shared with the downstream degree agg)."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_fixed(
    edges: DataFrame,
    *,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Truncated power-iteration PageRank in exact integer fixed point.

    ``edges`` is a distinct directed edge list. Returns
    ``(node, rank)`` for every node appearing as a source or
    destination, where ``rank`` is the scaled-integer PageRank after
    ``n_iter`` iterations (initial rank = ``scale`` for every node).

    Update rule per iteration (all BIGINT, truncating ``div``)::

        contrib(v)  = rank(v) div outdeg(v)
        rank'(u)    = ((100 - damping_pct) * scale) div 100
                    + (damping_pct * SUM contrib over in-edges) div 100

    Nodes with no in-edges keep only the teleport base; nodes with no
    out-edges contribute nothing (dangling leak — symmetrize first if
    that matters).
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    base = ((100 - damping_pct) * scale) // 100

    ranks = nodes.select("node", F.lit(scale).cast("bigint").alias("rank"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"], "inner")
            .join(outdeg, "src", "inner")
            .select(F.col("dst"), F.expr("rank div _deg").alias("_c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("_c").alias("_s"))
        ranks = nodes.join(inflow, nodes["node"] == inflow["dst"], "left").select(
            "node",
            (
                F.lit(base).cast("bigint")
                + F.expr(f"{damping_pct} * coalesce(_s, 0L) div 100")
            ).alias("rank"),
        )
    return ranks


def khop_min_dist(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    materialize_edges: bool = True,
) -> DataFrame:
    """Bounded-depth BFS: minimum hop distance (≤ ``k``) from a seed
    set over a directed edge list — the DataFrame twin of an ANSI
    ``WITH RECURSIVE`` reachability query (the one recursive shape
    warehouses actually run: org charts, BOM explosions, referral
    chains). The reference's FK graph is static star-schema depth, so
    it never recurses; an engine replacing it must.

    Returns ``(node, dist)`` for every node reachable in ≤ k hops,
    ``dist`` = fewest hops (seeds = 0).

    Scale design: the frontier is ``distinct`` node ids per level —
    per-level state is one row per *vertex*, never per *path*, so a
    cyclic or high-fanout graph cannot blow up the plan the way a
    naive ``UNION ALL`` recursive CTE does (path explosion). Each
    level is one equi-join on the edge key + one distinct shuffle;
    ``k`` is a fixed plan-unrolled bound (no driver-side convergence
    read), and the final min-dist is a k-way union + one groupBy —
    map-side-combined to one row per node.

    ``materialize_edges`` (default True for k ≥ 2): the edge list is
    consumed once per level, and with a derived edge frame (a join +
    distinct upstream) the unrolled plan re-executes that derivation
    every level — exchange reuse does not cross the broadcast-join
    boundary. One eager ``localCheckpoint`` computes it once and every
    level reads the materialized blocks (measured 1.5× end-to-end at
    sf0.1, growing with k). On a real cluster prefer
    ``persist(DISK_ONLY)``/reliable checkpoint for the same effect
    with executor-loss tolerance; pass False to keep the plan fully
    lazy (e.g. for explain-plan inspection).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    if materialize_edges and k >= 2:
        e = e.localCheckpoint()
    frontier = seeds.select(F.col(node).alias("node")).distinct()
    levels = [frontier.select("node", F.lit(0).alias("dist"))]
    for d in range(1, k + 1):
        frontier = (
            frontier.join(e, frontier["node"] == e["_src"], "inner")
            .select(F.col("_dst").alias("node"))
            .distinct()
        )
        levels.append(frontier.select("node", F.lit(d).alias("dist")))
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionByName(lv)
    return all_levels.groupBy("node").agg(F.min("dist").alias("dist"))


def triangle_counts(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    ``edges`` is an undirected edge list (either orientation, self
    loops ignored). Returns ``(node, n_triangles)`` for every node
    that closes ≥ 1 triangle.

    The standard distributed algorithm: canonicalize each edge to
    ``a < b`` (halves the edge set and makes each triangle countable
    exactly once as ``a < b < c``), then wedge-join ``E(a,b) ⋈ E(b,c)``
    on the middle vertex and close with ``E(a,c)``. Both joins are
    hash equi-joins; cost is Σ deg² for the wedge stage — the classic
    bound — and no stage materializes anything per-path beyond the
    wedge frame. High-degree hubs are the skew risk at 100 TB; cap or
    salt hub vertices upstream if the degree distribution is
    power-law (the nation/brand graphs this engine feeds it are
    bounded-cardinality).
    """
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
        )
        .distinct()
    )
    ab = und.select(F.col("a"), F.col("b"))
    bc = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = und.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    return per_node.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
