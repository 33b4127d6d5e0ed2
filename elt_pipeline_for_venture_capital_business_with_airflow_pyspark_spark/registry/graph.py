"""Registry family: graph (4 queries).

- graph_label_propagation
- graph_pagerank
- graph_khop_reachability
- graph_triangle_count
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register("graph_label_propagation", _lpa_sql(2))
def _graph_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Community detection over the customer↔supplier FK graph
    (operators/graph.label_propagation_fixed): 2 synchronous LPA
    iterations — every node simultaneously adopts its in-neighbors'
    most frequent label, ties to the smallest label — then community
    sizes. Sync + total-order tie-break is the determinism-first LPA
    variant (async LPA is visit-order-dependent and unreproducible).
    Round 1 is the operator's MIN(src)-per-dst fast path (identity
    labels + distinct edges ⇒ no join); round 2 is the generic
    edge⋈label join on the stable src key + struct-MIN arg-max over
    the (dst, label) aggregate, per-node state one label. The
    symmetric union skips symmetrize_edges' safety distinct: 'C'/'S'
    prefixes make the two direction spaces disjoint, so the union is
    distinct by construction — one fewer 2×-edge shuffle."""
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    eo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = eo.unionByName(
        eo.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # default disk_persist: the derived edge frame materializes once
    # (2 parquet scans total, 4 hash exchanges in the final plan) —
    # measured as fast as any mode at sf0.1 AND the cluster-safe
    # posture (lazy, recomputable on executor loss; lineage-free
    # "none" re-executes the fact-table derivation per consumer).
    labels = GR.label_propagation_fixed(sym, n_iter=2, symmetric=True)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


@_register("graph_pagerank", _pagerank_sql(3))
def _graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-importance ranking over the customer↔supplier FK graph
    (operators/graph.pagerank_fixed): 3 truncated power iterations in
    exact scaled-integer arithmetic (rank₀ = 1e9; update = teleport
    base + 85% of inflow, truncating div — no float accumulation
    anywhere, so the result is partitioning- and engine-independent).
    The edge list is symmetrized (no dangling leak); each iteration is
    a src-keyed join + dst-keyed partial agg, both on stable keys so
    the edge exchange is reused across iterations. Top-25 short-
    circuits as TakeOrderedAndProject."""
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    eo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    ranks = GR.pagerank_fixed(GR.symmetrize_edges(eo), n_iter=3)
    return ranks.orderBy(F.col("rank").desc(), "node").limit(25)


@_register(
    "graph_khop_reachability",
    """
    WITH RECURSIVE eo AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS src,
                      'S' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (SELECT src, dst FROM eo UNION SELECT dst, src FROM eo),
    seeds AS (
      SELECT DISTINCT 'S' || CAST(s_suppkey AS VARCHAR) AS node
      FROM supplier WHERE s_suppkey <= 2
    ),
    walk(node, d) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT e.dst, w.d + 1
      FROM walk w JOIN edges e ON w.node = e.src
      WHERE w.d < 3
    )
    SELECT node, CAST(MIN(d) AS INTEGER) AS dist
    FROM walk GROUP BY node
    """,
)
def _graph_khop_reachability(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-depth reachability (operators/graph.khop_min_dist): min
    hop distance ≤ 3 from the two lowest-keyed suppliers over the
    symmetrized customer↔supplier FK graph — the DataFrame twin of the
    oracle's ``WITH RECURSIVE`` walk. The frontier is distinct per
    level (one row per vertex, never per path), each level is one
    equi-join + distinct on stable keys, and the depth bound is
    plan-unrolled so the whole BFS is a single lazy DAG. The
    reference's own FK graph is fixed star depth
    (init_dwh.sql:172-177); this is the recursive ask it cannot
    answer."""
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    supp = read_table(spark, sf, "supplier")
    eo = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    seeds = supp.filter(F.col("s_suppkey") <= 2).select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("node")
    )
    return GR.khop_min_dist(GR.symmetrize_edges(eo), seeds, k=3).select(
        "node", F.col("dist").cast("int").alias("dist")
    )


@_register(
    "graph_triangle_count",
    """
    WITH e0 AS (
      SELECT DISTINCT c.c_nationkey AS x, s.s_nationkey AS y
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ),
    und AS (
      SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
      FROM e0 WHERE x <> y
    ),
    tri AS (
      SELECT ab.a, ab.b, bc.b AS c
      FROM und ab
      JOIN und bc ON ab.b = bc.a
      JOIN und ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    pn AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node, COUNT(*) AS n_triangles FROM pn GROUP BY node
    """,
)
def _graph_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_counts) over
    the nation trade-co-occurrence graph (nations linked when a
    customer in one buys from a supplier in the other). Edges
    canonicalized to a<b, wedge equi-join on the middle vertex, closed
    against the third edge — each triangle counted exactly once as
    a<b<c. The graph build is the q7-family 4-way FK join; the
    triangle stage itself is two hash joins on a bounded-cardinality
    vertex set."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer")
    supp = read_table(spark, sf, "supplier")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"], "inner")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"], "inner")
        .select(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
    )
    return GR.triangle_counts(e0)
