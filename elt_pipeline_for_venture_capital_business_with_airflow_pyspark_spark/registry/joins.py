"""Registry family: joins (13 queries).

- join_inner_fk_agg
- join_left_null_retention
- join_self_dual_role
- join_named_key_left
- join_semi
- join_anti_orphan_audit
- join_null_safe
- join_asof_backward
- join_range_interval
- join_lateral_topk
- join_asof_nearest
- join_full_outer_reconcile
- join_incremental_view
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- joins (J1-J10 shapes) --------------------------------------------------

@_register(
    "join_inner_fk_agg",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def _join_inner_fk_agg(spark: SparkSession, sf: str) -> DataFrame:
    """J2/J3 shape: inner join to a broadcast dim = FK filter."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@_register(
    "join_left_null_retention",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN rich.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_rich_cust
    FROM orders LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) rich
      ON o_custkey = rich.c_custkey
    GROUP BY o_orderstatus
    """,
)
def _join_left_null_retention(spark: SparkSession, sf: str) -> DataFrame:
    """J1/J7 shape: left join keeps unmatched facts with NULL dim attrs."""
    orders = read_table(spark, sf, "orders")
    rich = (
        read_table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    return (
        orders.join(F.broadcast(rich), orders["o_custkey"] == rich["c_custkey"], "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0)).alias(
                "n_no_rich_cust"
            ),
        )
    )


@_register(
    "join_self_dual_role",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY cn.n_name, sn.n_name
    """,
)
def _join_self_dual_role(spark: SparkSession, sf: str) -> DataFrame:
    """J8/J9: the same dimension joined twice in two roles via
    column-renamed selects (the reference's acquiring/acquired
    dim_company pattern)."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    supplier = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation")
    cust_nation = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    df = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
    )
    return df.groupBy("cust_nation", "supp_nation").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_revenue_dec()).cast("double").alias("revenue"),
    )


@_register(
    "join_named_key_left",
    """
    SELECT big.o_orderpriority AS priority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM lineitem LEFT JOIN (
      SELECT o_orderkey AS l_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 200000
    ) big USING (l_orderkey)
    GROUP BY big.o_orderpriority
    """,
)
def _join_named_key_left(spark: SparkSession, sf: str) -> DataFrame:
    """J5: left join with ``on=<name>`` (key column deduplicated)."""
    li = read_table(spark, sf, "lineitem")
    big = (
        read_table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    return (
        li.join(big, on="l_orderkey", how="left")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@_register(
    "join_semi",
    """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def _join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """left_semi (EXISTS) — used by the engine's upsert/audit patterns."""
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    nation = read_table(spark, sf, "nation")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@_register(
    "join_anti_orphan_audit",
    """
    SELECT n_name, COUNT(*) AS n_customers_inactive_1997
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    )
    GROUP BY n_name
    """,
)
def _join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """left_anti (NOT EXISTS) — the orphan-audit the engine adds on top
    of the reference's silent inner-join FK filtering (SURVEY.md §1.4).
    Scoped to one order-year so the audit is non-empty at every sf."""
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation = read_table(spark, sf, "nation")
    return (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers_inactive_1997"))
    )


@_register(
    "join_null_safe",
    """
    WITH l AS (
      SELECT p_partkey, CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_brand END AS brand
      FROM part WHERE p_partkey <= 400
    ), r AS (
      SELECT CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END AS brand,
             COUNT(*) AS n_r
      FROM part WHERE p_partkey <= 400 GROUP BY 1
    )
    SELECT l.p_partkey, l.brand, r.n_r
    FROM l JOIN r ON l.brand IS NOT DISTINCT FROM r.brand
    """,
)
def _join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — still hash-partitionable
    (NULLs co-locate), unlike a general non-equi condition."""
    part = read_table(spark, sf, "part").filter(F.col("p_partkey") <= 400)
    left = part.select(
        "p_partkey",
        F.when(F.col("p_partkey") % 5 == 0, F.lit(None)).otherwise(F.col("p_brand")).alias("brand"),
    )
    right = (
        part.select(
            F.when(F.col("p_partkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("p_brand"))
            .alias("rbrand")
        )
        .groupBy("rbrand")
        .agg(F.count(F.lit(1)).alias("n_r"))
    )
    return (
        left.join(right, left["brand"].eqNullSafe(right["rbrand"]))
        .select("p_partkey", "brand", "n_r")
    )


# --- temporal joins / history (beyond-reference: as-of, range, SCD2) -------

@_register(
    "join_asof_backward",
    """
    WITH v AS (
      SELECT user_id, ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS purchase_us,
           v.view_id AS view_id, epoch_us(v.ts) AS view_us,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM events p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    WHERE p.event_type = 'purchase'
    """,
)
def _join_asof_backward(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (backward, inclusive): each purchase gets the latest
    view at-or-before it per user — single-shuffle union-sweep plan
    (operators/temporal.asof_join), checked against DuckDB's native
    ASOF JOIN as an independent implementation. Ties on (user, ts)
    resolve to the max event_id in both engines."""
    ev = read_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    res = TMP.asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={
            "view_id": F.col("event_id"),
            "view_us": F.unix_micros(F.col("ts")),
        },
        tiebreak="event_id",
    )
    return res.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "view_id",
        "view_us",
        (F.unix_micros("ts") - F.col("view_us")).alias("gap_us"),
    )


@_register(
    "join_range_interval",
    """
    SELECT e.event_id AS err_id, c.event_id AS click_id, c.user_id,
           epoch_us(c.ts) - epoch_us(e.ts) AS offset_us
    FROM events e JOIN events c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 4 HOUR
    WHERE e.event_type = 'error' AND c.event_type = 'click'
    """,
)
def _join_range_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join: clicks inside each error's 4-hour
    window per user. The Spark plan is the binned equi-join of
    operators/temporal.range_join (no per-key cross product); the
    oracle is the naive non-equi join."""
    ev = read_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("i_user"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 4 HOURS")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    res = TMP.range_join(
        clicks,
        errors,
        event_key="user_id",
        interval_key="i_user",
        ts_col="ts",
        start_col="start_ts",
        end_col="end_ts",
        bin_seconds=3600,
    )
    return res.select(
        "err_id",
        "click_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("start_ts")).alias("offset_us"),
    )


@_register(
    "join_lateral_topk",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
    ) o
    """,
)
def _join_lateral_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT (S9 — SQL
    surface): each customer's 3 priciest orders, the top-k-per-row
    shape users write as a lateral instead of a window. Catalyst
    decorrelates it (DecorrelateInnerQuery) into the same
    join + per-key ranking plan window_topk_per_group builds by hand —
    no per-row re-execution survives into the physical plan, so the
    lateral is purely analyzer sugar at scale."""
    read_table(spark, sf, "customer").createOrReplaceTempView("customer_lat_v")
    read_table(spark, sf, "orders").createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lat_v c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat_v
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        """
    )


@_register(
    "join_asof_nearest",
    """
    WITH t AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'click' AND ts IS NOT NULL
    ), q AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL
    )
    SELECT t.user_id, t.event_id, epoch_us(t.ts) AS ts_us,
           CASE WHEN f.ts IS NULL OR (b.ts IS NOT NULL
                  AND epoch_us(t.ts) - epoch_us(b.ts)
                      <= epoch_us(f.ts) - epoch_us(t.ts))
                THEN b.event_id ELSE f.event_id END AS view_event_id,
           CASE WHEN f.ts IS NULL OR (b.ts IS NOT NULL
                  AND epoch_us(t.ts) - epoch_us(b.ts)
                      <= epoch_us(f.ts) - epoch_us(t.ts))
                THEN epoch_us(b.ts) ELSE epoch_us(f.ts) END AS view_ts_us
    FROM t
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM q
      WHERE q.user_id = t.user_id AND q.ts <= t.ts
      ORDER BY ts DESC, event_id DESC LIMIT 1) b ON TRUE
    LEFT JOIN LATERAL (
      SELECT event_id, ts FROM q
      WHERE q.user_id = t.user_id AND q.ts >= t.ts
      ORDER BY ts ASC, event_id DESC LIMIT 1) f ON TRUE
    """,
)
def _join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-direction as-of join
    (operators/temporal.asof_join_nearest, pandas merge_asof
    ``direction='nearest'``): each click event paired with the
    temporally CLOSEST view by the same user, equidistant resolving
    backward (the causal choice), timestamp ties by greatest event_id.
    Two one-shuffle directional sweeps joined back on the unique left
    id — three shuffles, no non-equi join, one candidate per direction
    per key. The oracle is the LATERAL-limit-1 formulation (fine at
    oracle scale; quadratic per key, which is exactly why the engine
    side doesn't do it that way)."""
    ev = read_table(spark, sf, "events")
    t = ev.filter(
        (F.col("event_type") == "click") & F.col("ts").isNotNull()
    ).select("user_id", "event_id", "ts")
    q = ev.filter(
        (F.col("event_type") == "view") & F.col("ts").isNotNull()
    ).select("user_id", F.col("event_id").alias("view_event_id"), "ts")
    out = TMP.asof_join_nearest(
        t, q, "user_id", "ts", "ts", "event_id",
        payload={
            "view_event_id": F.col("view_event_id"),
            "view_ts_us": F.unix_micros(F.col("ts")),
        },
        tiebreak="view_event_id",
    )
    return out.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
        "view_event_id", "view_ts_us",
    )


@_register(
    "join_full_outer_reconcile",
    """
    WITH sys_a AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 != 0
    ), sys_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 != 0
    )
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS order_key,
           a.o_totalprice AS price_a,
           b.o_totalprice AS price_b,
           CASE WHEN a.o_orderkey IS NULL THEN 'only_b'
                WHEN b.o_orderkey IS NULL THEN 'only_a'
                WHEN a.o_totalprice = b.o_totalprice THEN 'match'
                ELSE 'mismatch' END AS reconcile
    FROM sys_a a FULL OUTER JOIN sys_b b ON a.o_orderkey = b.o_orderkey
    """,
)
def _join_full_outer_reconcile(spark: SparkSession, sf: str) -> DataFrame:
    """Two-system reconciliation: FULL OUTER join on the business key,
    COALESCE'd key, presence/value classification — the audit query
    every dual-write migration runs. Full outer cannot broadcast
    (both sides must survive), so it is the one join shape that
    rightfully sort-merges: single co-partitioned shuffle on the
    key; with both extracts bucketed it goes shuffle-free
    (tests/test_layout.py proves that shape for snapshot_diff)."""
    orders = read_table(spark, sf, "orders")
    a = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    aa, bb = a.alias("a"), b.alias("b")
    return (
        aa.join(bb, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "order_key"
            ),
            F.col("a.o_totalprice").alias("price_a"),
            F.col("b.o_totalprice").alias("price_b"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("only_b"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("only_a"))
            .when(
                F.col("a.o_totalprice") == F.col("b.o_totalprice"), F.lit("match")
            )
            .otherwise(F.lit("mismatch"))
            .alias("reconcile"),
        )
    )


# --- incremental JOIN view maintenance (operators/cdc.py) ------------------

@_register(
    "join_incremental_view",
    """
    SELECT o_orderpriority, l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, l_returnflag
    """,
)
def _join_incremental_view(spark: SparkSession, sf: str) -> DataFrame:
    """Materialized-JOIN-view refresh under insert-only deltas
    (operators/cdc.incremental_join_refresh): the standing
    orders⋈lineitem view is maintained when a tail of recent orders
    (o_orderdate ≥ 1998-05-01) and late-shipping lineitems
    (l_shipdate ≥ 1998-08-01) arrive — Δ(A⋈B) = ΔA⋈B_old ∪ A_old⋈ΔB
    ∪ ΔA⋈ΔB, each delta term a BROADCAST join against the unshuffled
    big side, the old big⋈big join never recomputed. The oracle joins
    the full tables from scratch: delta algebra == full recompute,
    the invariant that lets a 100-TB fact⋈fact view cost one day's
    delta per refresh. Exact count + decimal-sum output; double cast
    once at the end."""
    a = read_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority", "o_orderdate"
    )
    b = read_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_returnflag", "l_quantity",
        "l_shipdate",
    )
    a_cut = F.lit("1998-05-01").cast("timestamp")
    b_cut = F.lit("1998-08-01").cast("timestamp")
    # Partition law: old ∪ delta must equal the table EXACTLY. A bare
    # `< cut` / `>= cut` split drops NULL-dated rows from BOTH slices
    # (both predicates are false for NULL), silently losing them from the
    # maintained view while the full-recompute oracle keeps them (the
    # join key is the non-null orderkey). NULLs go to the old side.
    old_a = a.filter((F.col("o_orderdate") < a_cut) | F.col("o_orderdate").isNull())
    delta_a = a.filter(F.col("o_orderdate") >= a_cut)
    old_b = b.filter((F.col("l_shipdate") < b_cut) | F.col("l_shipdate").isNull())
    delta_b = b.filter(F.col("l_shipdate") >= b_cut)
    old_result = old_a.join(old_b, ["okey"])
    refreshed = CDC.incremental_join_refresh(
        old_result, old_a, old_b, delta_a, delta_b, on=["okey"]
    )
    return refreshed.groupBy("o_orderpriority", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)"))
        .cast("double")
        .alias("sum_qty"),
    )
