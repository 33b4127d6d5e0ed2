"""Registry family: features (7 queries).

- feature_zscore_per_group
- feature_quantile_bins
- user_lifetime_features
- feature_class_weights
- cluster_kmeans
- feature_winsorize
- feature_minmax_scale
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "feature_zscore_per_group",
    """
    WITH s AS (
      SELECT o_orderpriority,
             COUNT(o_totalprice) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s1,
             -- DECIMAL(19,4) forces hugeint storage in DuckDB so the
             -- product doesn't overflow int64; value still exact, same
             -- as Spark's decimal(18,4)^2 -> decimal(37,8)
             SUM(CAST(o_totalprice AS DECIMAL(19,4)) *
                 CAST(o_totalprice AS DECIMAL(19,4))) AS s2
      FROM orders GROUP BY o_orderpriority
    )
    -- DuckDB's wide-DECIMAL -> DOUBLE cast double-rounds (int128 then
    -- /10^scale); routing through VARCHAR gives the correctly-rounded
    -- value Spark's BigDecimal.doubleValue produces.
    SELECT o_orderkey, o.o_orderpriority,
           (CAST(o_totalprice AS DOUBLE) - CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
             / sqrt((CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
                    / (n - 1)) AS zscore
    FROM orders o JOIN s ON o.o_orderpriority IS NOT DISTINCT FROM s.o_orderpriority
    WHERE n >= 2
      AND (CAST(CAST(s2 AS VARCHAR) AS DOUBLE)
           - CAST(CAST(s1 AS VARCHAR) AS DOUBLE)
             * CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n)
            / (n - 1) > 0
      AND o.o_totalprice IS NOT NULL
    """,
)
def _feature_zscore_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Per-segment standardization (operators/features.zscore_per_group):
    group moments as EXACT decimal sums (count, Σx, Σx²) so no double
    accumulation order leaks, then a fixed IEEE expression tree for
    (x-μ)/σ replicated literally in the oracle — 15k doubles
    hash-matching is the proof. KB-sized moment table broadcast back;
    never a window over the fact."""
    orders = read_table(spark, sf, "orders")
    out = FT.zscore_per_group(orders, ["o_orderpriority"], "o_totalprice")
    return out.filter(F.col("zscore").isNotNull()).select(
        "o_orderkey", "o_orderpriority", "zscore"
    )


@_register(
    "feature_quantile_bins",
    """
    WITH b AS (
      SELECT o_orderpriority, o_totalprice,
             CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey) AS INT) AS bin
      FROM orders
    )
    SELECT o_orderpriority, bin, COUNT(*) AS n_rows,
           MIN(o_totalprice) AS bin_min, MAX(o_totalprice) AS bin_max
    FROM b GROUP BY o_orderpriority, bin
    """,
)
def _feature_quantile_bins(spark: SparkSession, sf: str) -> DataFrame:
    """Equal-frequency discretizer (operators/features.quantile_bins):
    per-priority price quartiles with per-bin count/min/max. The NTILE
    ordering carries the order key as tiebreak so bin membership is a
    total order — identical in any engine. Window shuffle is reused by
    the summary agg; the 100 TB path swaps in approx-percentile cut
    points (documented in the operator)."""
    orders = read_table(spark, sf, "orders")
    return FT.quantile_bins(
        orders, ["o_orderpriority"], "o_totalprice", "o_orderkey", n_bins=4
    )


@_register(
    "user_lifetime_features",
    """
    WITH g AS (
      SELECT user_id, ts, event_type, value,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_active_days,
           epoch_us(MIN(ts)) AS first_ts_us,
           epoch_us(MAX(ts)) AS last_ts_us,
           CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 30*60*1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                                  THEN CAST(value AS DECIMAL(20,4)) END)
                         AS DOUBLE), 0.0) AS purchase_value
    FROM g GROUP BY user_id
    """,
)
def _user_lifetime_features(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user lifetime ML feature vector
    (operators/analytics.user_lifetime_features): volume, active-day
    span, 30-min-gap session count, and decimal-exact purchase
    aggregates. Lag window and final agg share the user-key shuffle.
    Equal-timestamp ties are session-count-neutral (gap 0 either
    order), so no tiebreak is needed for determinism."""
    ev = read_table(spark, sf, "events")
    return ANA.user_lifetime_features(ev)


@_register(
    "feature_class_weights",
    """
    WITH per AS (
      SELECT label, COUNT(*) AS n_rows FROM embeddings GROUP BY label
    )
    SELECT label, n_rows,
           CAST(SUM(n_rows) OVER () AS DOUBLE)
             / CAST(COUNT(*) OVER () * n_rows AS DOUBLE) AS weight
    FROM per
    """,
)
def _feature_class_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Inverse-frequency class weights (operators/features.class_weights)
    for imbalance-corrected training: total / (k · n_label). One
    aggregation; the windowed totals run over the k-row label frame
    (post-agg, free). The weight is a single bigint→double division —
    bit-identical across engines."""
    emb = read_table(spark, sf, "embeddings")
    return FT.class_weights(emb, "label")


@_register("cluster_kmeans", _kmeans_sql(8, 2, 64))
def _cluster_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact fixed-point Lloyd k-means over the embedding table
    (operators/clustering.kmeans_fixed_assign): k=8 seeded by the 8
    smallest vec_ids (clusters named by seed id), 2 centroid updates,
    final assignment (vec_id, cluster, d2). Vectors quantize once to
    floor(x·1e6) BIGINTs so distances and centroid means are exact
    integer arithmetic — bit-identical to the DuckDB oracle running
    the same iterations. Assignment = broadcast k·d centroid join +
    (id, cluster) partial agg + lexicographic min(struct) argmin;
    update = one (cluster, pos) shuffle carrying k·d rows."""
    emb = read_table(spark, sf, "embeddings")
    return CL.kmeans_fixed_assign(emb, k=8, n_iter=2)


@_register(
    "feature_winsorize",
    """
    WITH b AS (
      SELECT o_orderpriority,
             ROUND(quantile_cont(o_totalprice, 0.01), 4) AS lo,
             ROUND(quantile_cont(o_totalprice, 0.99), 4) AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority, o_totalprice,
           CASE WHEN o_totalprice < lo THEN lo
                WHEN o_totalprice > hi THEN hi
                ELSE o_totalprice END AS winsorized,
           CAST(o_totalprice < lo OR o_totalprice > hi AS BOOLEAN) AS clipped
    FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
    """,
)
def _feature_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Winsorization (clip to the [p01, p99] band per segment) — the
    outlier treatment that keeps the row but bounds its leverage,
    standard before regression/scaling. Exact percentile bounds
    (4-dp-rounded), one-row-per-group broadcast back; the clip is a
    pure CASE so values pass through bit-identical when unclipped."""
    orders = read_table(spark, sf, "orders")
    b = orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.01)), 4).alias("lo"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.99)), 4).alias("hi"),
    )
    v = F.col("o_totalprice")
    return orders.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.when(v < F.col("lo"), F.col("lo"))
        .when(v > F.col("hi"), F.col("hi"))
        .otherwise(v)
        .alias("winsorized"),
        ((v < F.col("lo")) | (v > F.col("hi"))).alias("clipped"),
    )


@_register(
    "feature_minmax_scale",
    """
    WITH b AS (
      SELECT o_orderpriority,
             MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderkey, o.o_orderpriority,
           CASE WHEN mx = mn THEN CAST(0.5 AS DOUBLE)
                ELSE (o_totalprice - mn) / (mx - mn) END AS scaled
    FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority
    """,
)
def _feature_minmax_scale(spark: SparkSession, sf: str) -> DataFrame:
    """Min-max feature scaling to [0,1] per segment. min/max are exact
    selections of input doubles, the transform is one subtraction and
    one division — both single IEEE ops, so scaled values are
    bit-identical across engines with no decimal scaffolding.
    Degenerate (constant) groups map to 0.5. Same broadcast-stats
    shape as every normalizer here."""
    orders = read_table(spark, sf, "orders")
    b = orders.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    v = F.col("o_totalprice")
    return orders.join(F.broadcast(b), "o_orderpriority").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("mx") == F.col("mn"), F.lit(0.5).cast("double"))
        .otherwise((v - F.col("mn")) / (F.col("mx") - F.col("mn")))
        .alias("scaled"),
    )
