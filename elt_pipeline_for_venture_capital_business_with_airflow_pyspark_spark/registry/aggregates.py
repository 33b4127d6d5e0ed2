"""Registry family: aggregates (21 queries).

- agg_rollup
- agg_weighted_median
- agg_cube
- agg_grouping_sets
- agg_distinct_count
- agg_approx_distinct
- agg_stats
- agg_percentiles
- pivot_status_matrix
- correlated_above_avg
- agg_collect_sorted
- unpivot_measures
- agg_exact_median
- agg_histogram
- agg_corr_exact
- agg_mode_deterministic
- agg_incremental_maintenance
- agg_filter_clause
- agg_regression_slope
- agg_percentile_disc_cont
- agg_group_by_all
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def _agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical subtotals — free generalization of the reference's
    aggregation surface (SURVEY.md §2.4 closing note).

    ANSI empty-input note: Spark's ROLLUP emits ZERO rows on an empty
    table, but the standard (and DuckDB/Postgres) emit the grand-total
    row — the () grouping set is a global aggregate, and a global
    aggregate over nothing is one row. So the rollup is expressed as
    its non-() grouping sets UNION an always-present global aggregate:
    identical to ROLLUP on any non-empty input, and standard-correct
    on the empty daily slice (caught by tests/test_empty_input_sweep)."""
    li = read_table(spark, sf, "lineitem")
    aggs = [
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_quantity")).alias("sum_qty"),
    ]
    li.createOrReplaceTempView("lineitem_v")
    parts = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
        """
    )
    total = li.agg(*aggs).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        "n_items",
        "sum_qty",
    )
    return parts.unionByName(total)


@_register(
    "agg_weighted_median",
    """
    WITH base AS (
      SELECT l_returnflag,
             l_extendedprice AS v,
             CAST(l_quantity AS DECIMAL(20,4)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    ), scanned AS (
      SELECT l_returnflag, v, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS totw,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM base
    )
    SELECT l_returnflag,
           MIN(v) AS wmedian,
           CAST(MAX(totw) AS DOUBLE) AS total_weight,
           MAX(n) AS n_rows
    FROM scanned
    WHERE 2 * cumw >= totw
    GROUP BY l_returnflag
    """,
)
def _agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted median (operators/analytics.weighted_median): median
    unit price weighted by quantity per returnflag — the smallest
    price whose cumulative sold quantity reaches half the group total.
    Exact-decimal cumulative weights make the ``2·cumw ≥ totw``
    threshold an exact comparison (a float cumsum would make the
    boundary row partition-order-dependent); one shuffle on the group
    key serves both window passes and the final group-by min.
    ``validate=False``: l_quantity is non-negative by the TPC-H data
    contract (and by the testdata generator), so the negative-weight
    guard is opted out for the codegen-fusion win the docstring
    describes."""
    li = read_table(spark, sf, "lineitem")
    return ANA.weighted_median(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", validate=False
    )


# --- grouped-agg generalizations (cube / grouping sets / distinct / stats) ---

@_register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def _agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations (Spark expands grouping
    sets map-side — no extra scan per set). Expressed as the non-()
    sets UNION an always-present global aggregate so the empty table
    yields the standard's grand-total row — Spark's native CUBE emits
    zero rows there, DuckDB/Postgres one (see _agg_rollup note)."""
    orders = read_table(spark, sf, "orders")
    orders.createOrReplaceTempView("orders_cube_v")
    parts = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
        FROM orders_cube_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )
    total = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("revenue"),
    ).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n_orders",
        "revenue",
    )
    return parts.unionByName(total)


@_register(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def _agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() null-vs-subtotal markers,
    via the SQL entry point (spark.sql over a registered view). The ()
    set is carried as an always-present global aggregate union so the
    empty table yields the standard's one-row grand total (see
    _agg_rollup note)."""
    orders = read_table(spark, sf, "orders")
    orders.createOrReplaceTempView("orders_v")
    parts = spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )
    total = orders.agg(F.count(F.lit(1)).alias("n_orders")).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit(1).cast("int").alias("g_status"),
        F.lit(1).cast("int").alias("g_priority"),
        "n_orders",
    )
    return parts.unionByName(total)


@_register(
    "agg_distinct_count",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def _agg_distinct_count(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one result (Spark plans an
    Expand + two-phase agg — still a single scan)."""
    orders = read_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@_register(
    "agg_approx_distinct",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_custs, TRUE AS approx_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
)
def _agg_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ sketch cardinality (the 100 TB path for distinct counts —
    mergeable, constant memory). The oracle checks the accuracy
    contract: the sketch estimate must land within 5% of exact
    (rsd=0.01 makes that bound safe deterministically)."""
    orders = read_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("exact_custs"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.01)
                - F.countDistinct("o_custkey")
            )
            <= F.countDistinct("o_custkey") * 0.05
        ).alias("approx_within_5pct"),
    )


@_register("agg_stats", _STATS_SQL)
def _agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Variance/stddev/covariance/correlation via exact decimal power
    sums (single pass, map-side partials — the distributed moment-sketch
    shape, deterministic under any partitioning)."""
    li = read_table(spark, sf, "lineitem")
    qd = F.col("l_quantity").cast("decimal(19,2)")
    pdm = F.col("l_extendedprice").cast("decimal(19,2)")
    # sums round to cents before the double cast — see _STATS_SQL note
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("sq"),
        F.round(F.sum(qd * qd), 2).cast("double").alias("sq2"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("sp"),
        F.round(F.sum(pdm * pdm), 2).cast("double").alias("sp2"),
        F.round(F.sum(qd * pdm), 2).cast("double").alias("sqp"),
    )
    n, sq, sq2 = F.col("n"), F.col("sq"), F.col("sq2")
    sp, sp2, sqp = F.col("sp"), F.col("sp2"), F.col("sqp")
    return sums.select(
        "l_returnflag",
        "n",
        F.round(sq / n, 6).alias("mean_qty"),
        F.round(F.sqrt((sq2 - sq * sq / n) / (n - 1)), 6).alias("stddev_qty"),
        F.round((sqp - sq * sp / n) / (n - 1), 4).alias("covar_qty_price"),
        F.round(
            (n * sqp - sq * sp)
            / (F.sqrt(n * sq2 - sq * sq) * F.sqrt(n * sp2 - sp * sp)),
            6,
        ).alias("corr_qty_price"),
    )


@_register(
    "agg_percentiles",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def _agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (both engines sort exactly and
    linearly interpolate; at 100 TB swap for approx_percentile — same
    API shape, mergeable t-digest)."""
    orders = read_table(spark, sf, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
    )


@_register(
    "pivot_status_matrix",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def _pivot_status_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an explicit value list (never inferred — inference
    costs an extra distinct scan and breaks plan caching at scale)."""
    orders = read_table(spark, sf, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@_register(
    "correlated_above_avg",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey
    )
    """,
)
def _correlated_above_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape), decorrelated the
    way Catalyst itself would: per-key aggregate + equi-join — one
    scan feeds both sides, no per-row subquery execution ever."""
    orders = read_table(spark, sf, "orders")
    avgs = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,3)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        orders.join(avgs, orders["o_custkey"] == avgs["k"])
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@_register(
    "agg_collect_sorted",
    """
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_nationkey
    """,
)
def _agg_collect_sorted(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic array aggregation: collect_set + sort_array (an
    unsorted collect is partitioning-dependent — never comparable),
    serialized to a comma-joined string for the driver canonicalizer."""
    customer = read_table(spark, sf, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
            "segments"
        ),
        F.count(F.lit(1)).alias("n_customers"),
    )


@_register(
    "unpivot_measures",
    """
    SELECT l_orderkey, l_linenumber, measure, val FROM (
      SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    """,
)
def _unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt: wide measure columns → long (measure, val) rows —
    the inverse of pivot_status_matrix, a single-pass Generate (no
    self-union of 4 scans like the naive SQL)."""
    li = read_table(spark, sf, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@_register(
    "agg_exact_median",
    """
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5) AS median_price,
           quantile_cont(o_totalprice, 0.9) AS p90_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def _agg_exact_median(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (median + p90) per group via
    operators/features.exact_quantiles — the distinct-value histogram
    + two-phase bucketed cumulative count, whose "cont" interpolation
    mirrors Spark percentile()'s IEEE expression exactly (and DuckDB's
    quantile_cont). Unlike the builtin — whose aggregation buffer
    holds every distinct value of a group in ONE task — every stage
    here is partition-parallel even with 5 giant groups: the
    histogram shuffle carries distinct values, the cumsum is bucketed
    on the value, and only the KB-sized (group × bucket) totals see a
    per-group window. (The approx_percentile family is covered
    separately in agg_percentiles.)"""
    orders = read_table(spark, sf, "orders")
    return FT.exact_quantiles(
        orders,
        "o_totalprice",
        [0.5, 0.9],
        group_cols=["o_orderpriority"],
        out_cols=["median_price", "p90_price"],
    ).select(
        "o_orderpriority",
        "median_price",
        "p90_price",
        F.col("n_rows").alias("n"),
    )


@_register(
    "agg_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 20000.0) AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
)
def _agg_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram (bucket = floor(x/w)): one groupBy with
    map-side partials — the shuffle carries |buckets| rows. Float
    division + floor are IEEE-identical across engines."""
    orders = read_table(spark, sf, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 20000.0).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
    )


@_register(
    "agg_corr_exact",
    """
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,4))), 2) AS DOUBLE) AS sx,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,4))), 2) AS DOUBLE) AS sy,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,2)) * CAST(l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE) AS sxy,
             CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(19,2)) * CAST(l_quantity AS DECIMAL(19,2))), 2) AS DOUBLE) AS sxx,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(l_extendedprice AS DECIMAL(19,2))), 2) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((n*sxy - sx*sy) / (sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy)), 12) AS corr
    FROM s
    """,
)
def _agg_corr_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation per group, cross-engine deterministic: the
    five moments accumulate in EXACT decimal arithmetic (order-free),
    and only the final closed-form expression runs in IEEE doubles —
    unlike built-in corr(), whose partial-aggregation float order
    differs between engines. The same trick generalizes to covariance
    and regression slopes."""
    li = read_table(spark, sf, "lineitem")
    q = F.col("l_quantity").cast("decimal(19,2)")
    p = F.col("l_extendedprice").cast("decimal(19,2)")
    # DECIMAL(19,2) operands + round-to-cents before the double cast:
    # identical no-op arithmetic on the money domain, but keeps
    # DuckDB's physical multiply in INT128 and the converted unscaled
    # value under 2^53 at extreme magnitudes (see _STATS_SQL note)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("sx"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(20,4)")), 2)
        .cast("double")
        .alias("sy"),
        F.round(F.sum(q * p), 2).cast("double").alias("sxy"),
        F.round(F.sum(q * q), 2).cast("double").alias("sxx"),
        F.round(F.sum(p * p), 2).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    corr = (n * F.col("sxy") - sx * sy) / (
        F.sqrt(n * F.col("sxx") - sx * sx) * F.sqrt(n * F.col("syy") - sy * sy)
    )
    # the moments are exact; only this closed-form expression runs in
    # IEEE doubles, where engines may differ in the last bit — round
    # both sides identically (12 digits ≫ the 1-ulp noise floor)
    return s.select("l_returnflag", "n", F.round(corr, 12).alias("corr"))


@_register(
    "agg_mode_deterministic",
    """
    WITH counts AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY n DESC, o_orderstatus) AS rn
      FROM counts
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, n AS n_rows
    FROM ranked WHERE rn = 1
    """,
)
def _agg_mode_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie rule (max count, then
    smallest value) — the built-in mode() is tie-arbitrary in both
    engines, so it can never be oracle-compared; count+rank is the
    portable formulation and is two partial-agg shuffles at any
    scale."""
    orders = read_table(spark, sf, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("n").desc(), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("n").alias("n_rows"),
        )
    )


@_register(
    "agg_incremental_maintenance",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY o_orderpriority
    """,
)
def _agg_incremental_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental materialized-view maintenance: the standing agg over
    history (< 1996-01-01) is REFRESHED by merging in one quarter's
    delta partial-agg — never rescanning history rows. count/sum are
    self-mergeable (sum of counts, sum of decimal partial sums), which
    is exactly why a 100 TB daily rollup costs one day's scan, not the
    table's. The oracle recomputes the merged window from scratch —
    proving partial-merge == full recompute. Both partials keep exact
    decimal sums; the double cast happens once, after the merge."""
    orders = read_table(spark, sf, "orders")
    cut, hi = F.lit("1996-01-01").cast("timestamp"), F.lit("1996-04-01").cast("timestamp")

    def partial(df):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("ps"),
        )

    hist = partial(orders.filter(F.col("o_orderdate") < cut))
    delta = partial(
        orders.filter((F.col("o_orderdate") >= cut) & (F.col("o_orderdate") < hi))
    )
    return (
        hist.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("pn").alias("n_orders"),
            F.sum("ps").cast("double").alias("total_price"),
        )
    )


@_register(
    "agg_filter_clause",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def _agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI FILTER-clause aggregates — several differently-predicated
    aggregates off ONE scan and ONE shuffle (the alternative, one
    subquery per predicate, re-scans per metric). Expressed through
    spark.sql to exercise the SQL surface; Catalyst compiles each
    FILTER to the same conditional partial agg the DataFrame
    when().otherwise() form produces."""
    read_table(spark, sf, "orders").createOrReplaceTempView("v_orders_fc")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
                 AS finished_total
        FROM v_orders_fc
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# TPC-H remainder (round 3): every spec query the testdata schema can
# express. The driver's tables lack `partsupp` and several spec columns
# (l_commitdate/l_receiptdate/l_shipmode, p_container, c_phone,
# ps_supplycost), so q2/q11/q16/q20 are out of reach and q4/q9/q12/
# q21/q22 are ADAPTED to the available columns — each docstring states
# the substitution. The point is shape coverage: EXISTS / NOT-EXISTS
# decorrelation, scalar subqueries, correlated-aggregate gates,
# disjunctive multi-clause pushdown, count-distribution double aggs —
# the query classes the reference's SQL surface (SURVEY §2 S9) implies
# but its own workload never exercises.
# ---------------------------------------------------------------------------


@_register(
    "agg_regression_slope",
    """
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
             ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS sx,
             ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS sy,
             ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))
                 * CAST(l_quantity AS DECIMAL(12,4))), 2) AS sxx,
             ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))
                 * CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    ORDER BY l_returnflag
    """,
)
def _agg_regression_slope(spark: SparkSession, sf: str) -> DataFrame:
    """OLS fit (price ~ quantity) per return flag in ONE pass via
    sufficient statistics — n, Σx, Σy, Σx², Σxy accumulate as exact
    decimals (map-side partials, one shuffle), and only the final
    slope/intercept arithmetic drops to double on identical operands
    (so cross-engine bit-identical). The streaming/mergeable-partials
    shape: the same five sums union across 1000 executors or across
    incremental batches without revisiting rows — Spark's built-in
    regr_slope keeps running doubles instead, whose totals are
    partition-order-dependent and can't be oracle-checked.

    The five SUMS are exact decimals (that's what shuffles and
    merges); the n·Σxy cross-products are NOT kept decimal — at sf0.1
    they already overflow decimal(38) and Spark and DuckDB round the
    overflow differently (caught by the sf0.1 sweep). Each sum casts
    to double FIRST (exact value → correctly-rounded double, identical
    in both engines), then slope/intercept combine in pure IEEE
    arithmetic over identical operands — bit-identical at any scale."""
    li = read_table(spark, sf, "lineitem")
    # (12,4) x (12,2): products need 25 digits — exactly representable
    # in BOTH engines (decimal(20,4) squares need 41 > 38 and each
    # engine rounds the overflow differently; the sf0.1 sweep caught it)
    x = F.col("l_quantity").cast("decimal(12,4)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    # sums round to cents before the double cast (no-op on the
    # integral-qty / 2-decimal-money domain): keeps the converted
    # unscaled value under 2^53 at extreme magnitudes, where DuckDB's
    # unscaled/10^scale conversion double-rounds 1 ulp off Spark's
    # correctly-rounded BigDecimal path (extreme-values sweep)
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(x), 2).alias("sx"),
        F.round(F.sum(y), 2).alias("sy"),
        F.round(F.sum(x * x), 2).alias("sxx"),
        F.round(F.sum(x * y), 2).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    num = nd * sxyd - sxd * syd
    den = nd * sxxd - sxd * sxd
    slope = num / den
    intercept = (syd - slope * sxd) / nd
    return stats.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# round-5 additions: percentile disc/cont parity, GROUP BY ALL/ordinal,
# q20-adapted correlated-scalar-subquery shape
# ---------------------------------------------------------------------------


@_register(
    "agg_percentile_disc_cont",
    """
    SELECT l_returnflag,
           ROUND(quantile_disc(l_quantity, 0.25), 4) AS q25_disc,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25_cont,
           ROUND(quantile_disc(l_quantity, 0.75), 4) AS q75_disc,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75_cont
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _agg_percentile_disc_cont(spark: SparkSession, sf: str) -> DataFrame:
    """PERCENTILE_DISC vs PERCENTILE_CONT parity per group — the
    profiling module's completeness-threshold generalized (A4 checks a
    fixed 90% gate; analysts ask for the actual distribution points).
    DISC returns a value that EXISTS in the data (the first value
    whose cumulative distribution reaches p); CONT linearly
    interpolates between the two straddling values. Distinguishing
    them matters for skewed columns: on a heavy-tailed price column
    CONT can report a price nobody ever paid. Both are exact
    sort-based aggregates here; at 100 TB swap CONT for
    approx_percentile (mergeable t-digest) — DISC has no sketch twin,
    which is exactly why the parity pair is worth pinning."""
    li = read_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr(
                "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)"
            ),
            4,
        ).alias("q25_disc"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25_cont"),
        F.round(
            F.expr(
                "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)"
            ),
            4,
        ).alias("q75_disc"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75_cont"),
    )


@_register(
    "agg_group_by_all",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY 1, 2
    """,
)
def _agg_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL / ordinal resolution (S9 — SQL exec surface): the
    Spark side groups with GROUP BY ALL (every non-aggregate select
    item becomes a key), the oracle with ordinals GROUP BY 1, 2 — both
    sugar forms must resolve to the identical (l_returnflag,
    l_linestatus) grouping. Pure analyzer features: the physical plan
    is the same single partial/final hash aggregate as an explicit
    GROUP BY, nothing new at scale."""
    read_table(spark, sf, "lineitem").createOrReplaceTempView(
        "lineitem_gba_v"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_lines
        FROM lineitem_gba_v
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        GROUP BY ALL
        """
    )
