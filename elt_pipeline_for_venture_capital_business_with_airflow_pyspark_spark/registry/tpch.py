"""Registry family: tpch (23 queries).

- q1_pricing_summary
- q3_shipping_priority
- q5_local_supplier_volume
- q10_returned_items
- q18_large_volume_customer
- q14_promo_revenue
- q4_priority_exists
- q6_forecast_revenue
- q7_volume_shipping
- q8_market_share
- q9_product_profit
- q12_priority_by_delay
- q13_customer_distribution
- q15_top_supplier
- q17_small_quantity_revenue
- q19_disjunctive_revenue
- q21_waiting_supplier
- q22_dormant_customers
- q20_share_of_part
- q2_min_cost_supplier
- q11_important_stock
- q16_supplier_part_counts
- q20_excess_stock
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- aggregations (A1-A8 generalized) --------------------------------------

@_register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS DECIMAL(18,4))
                    * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(20,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: the headline scan+agg (map-side partials, two
    grouping columns, 8 aggregates in one pass)."""
    li = read_table(spark, sf, "lineitem")
    disc_price = _revenue_dec()
    charge = disc_price.cast("decimal(18,4)") * (
        F.lit(1) + F.col("l_tax").cast("decimal(3,2)")
    )
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / cnt).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (_dsum(F.col("l_discount")) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@_register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
           epoch_us(o_orderdate) AS orderdate_us,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def _q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides, revenue agg,
    global top-10 (TopK sort — no full global sort at scale)."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = read_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_micros("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_register(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation    ON s_nationkey = n_nationkey
    JOIN region    ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def _q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: six-table star join with the local-supplier
    residual (customer and supplier share a nation), region filter,
    revenue rollup per nation. The big side is lineitem⋈orders (one
    fact-fact shuffle); supplier/nation/region/customer broadcast —
    customer only after the date filter prunes orders. The
    c_nationkey = s_nationkey condition rides the supplier join as a
    residual equi-clause, never a post-join filter on a wider
    product."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    supp = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .join(
            F.broadcast(supp),
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@_register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def _q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over one
    quarter, top-20. Both filters (order date, returnflag) push into
    their scans before the fact-fact join; nation broadcasts; the
    top-20 is a TakeOrderedAndProject, not a global sort."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    nation = read_table(spark, sf, "nation")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = li.filter(F.col("l_returnflag") == "R")
    j = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@_register(
    "q18_large_volume_customer",
    """
    SELECT c_custkey, o_orderkey,
           epoch_us(o_orderdate) AS orderdate_us,
           o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > 300
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def _q18_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as a semi-join
    gate (orders whose total quantity exceeds 300), then re-join the
    facts for the detail rows. The gate aggregates lineitem FIRST
    (map-side partial sums shrink the shuffle to one row per order)
    and semi-joins orders on the surviving keys — at scale the gate
    output is tiny, so AQE turns the semi join into a broadcast.
    Top-100 is TakeOrderedAndProject."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("_sq"))
        .filter(F.col("_sq") > 300)
        .select("l_orderkey")
    )
    o = orders.join(big, orders["o_orderkey"] == big["l_orderkey"], "left_semi")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(cust), o["o_custkey"] == cust["c_custkey"]
    )
    return (
        j.groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate")).alias("orderdate_us"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@_register(
    "q14_promo_revenue",
    f"""
    SELECT
      CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END) AS DOUBLE)
        AS promo_revenue,
      CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS total_revenue,
      CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL} END) AS DOUBLE)
        / CAST(SUM({_REVENUE_SQL}) AS DOUBLE) * 100.0 AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def _q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promotion revenue share for one month — a
    conditional aggregate over a fact⋈dim join collapsing to ONE row.
    The date filter pushes into the lineitem scan, part broadcasts,
    and both sums come off one pass (no separate promo query). The
    final percentage is computed from the two decimal-exact sums with
    a fixed double expression order, so it is bit-identical across
    engines."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    )
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _revenue_dec())
    ).cast("double")
    total = F.sum(_revenue_dec()).cast("double")
    return j.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        (promo / total * F.lit(100.0)).alias("promo_pct"),
    )


@_register(
    "q4_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def _q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the testdata has no l_commitdate /
    l_receiptdate, so "late" is l_shipdate > o_orderdate + 90 days).
    The correlated EXISTS decorrelates to a left-semi join whose
    condition mixes both sides; the quarter filter pushes into the
    orders scan BEFORE the semi join so the probe side is one
    quarter's orders, not the whole table."""
    orders = read_table(spark, sf, "orders")
    li = read_table(spark, sf, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def _q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown showcase — every predicate is
    sargable and reaches the parquet scan (year slice, discount band,
    quantity cap), the projection is two columns, and the whole query
    is one map-side partial sum + a single-row final agg. At 100 TB
    this reads only the row groups whose min/max straddle 1996."""
    li = read_table(spark, sf, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(3,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(price * disc).cast("double").alias("revenue"))
    )


@_register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             {_REVENUE_SQL} AS vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def _q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7: volume shipped between a nation PAIR in either
    direction, by ship-year. The disjunctive nation-pair predicate
    cannot push below the joins as written, but each nation lookup
    broadcasts and the supplier/customer sides pre-filter to the two
    nations' keys, so the fact-fact join probes only matching rows.
    The two-year slice pushes into the lineitem scan."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    supp = read_table(spark, sf, "supplier")
    cust = read_table(spark, sf, "customer")
    nation = read_table(spark, sf, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = supp.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c = cust.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    l = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = (
        l.join(orders, l["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"])
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST({_REVENUE_SQL} AS DECIMAL(18,4)) AS vol,
             n1.n_name AS nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def _q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8: one nation's share of a region's market for one part
    type, by order year — conditional aggregate over the full star.
    The selective part-type filter broadcasts and prunes lineitem
    FIRST (smallest fan-in), then orders/customer/region restrict the
    market; the share is a ratio of two exact decimal sums, divided
    in double (identical operands cross-engine, so bit-identical)."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    orders = read_table(spark, sf, "orders")
    cust = read_table(spark, sf, "customer")
    supp = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    p = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    asia_keys = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    c = cust.join(
        F.broadcast(asia_keys), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey")
    vol = _revenue_dec().cast("decimal(18,4)")
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("vol", vol)
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        j.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("vol")).otherwise(zero)).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_register(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST({_REVENUE_SQL} AS DECIMAL(18,4))
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,4)) AS amount
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%gear%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def _q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so line cost is
    p_retailprice * l_quantity instead of ps_supplycost * l_quantity —
    same expression structure, different cost source). Profit per
    supplier nation per order year for parts matching a name pattern.
    The LIKE filter prunes part before its broadcast; profit is exact
    decimal arithmetic summed then cast double."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    supp = read_table(spark, sf, "supplier")
    orders = read_table(spark, sf, "orders")
    nation = read_table(spark, sf, "nation")
    p = part.filter(F.col("p_name").like("%gear%")).select("p_partkey", "p_retailprice")
    amount = _revenue_dec().cast("decimal(18,4)") - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,4)")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        j.groupBy("nation", "o_year")
        # round to cents before the double cast: profit sums at extreme
        # magnitudes push the unscaled decimal past 2^53, where DuckDB's
        # decimal→double conversion double-rounds 1 ulp off Spark's
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@_register(
    "q12_priority_by_delay",
    """
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'prompt'
                  WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'slow'
                  ELSE 'late' END AS delay_bucket
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
    )
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
)
def _q12_priority_by_delay(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode / l_commitdate /
    l_receiptdate, so the grouping key is a derived ship-delay bucket
    instead of ship mode — the query class is identical: CASE-sum
    priority split over a fact-fact join with an IN-list predicate).
    One shuffle for the join, three-row output."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    l = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    j = l.join(orders, l["l_orderkey"] == orders["o_orderkey"])
    bucket = (
        F.when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
            "prompt",
        )
        .when(
            F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
            "slow",
        )
        .otherwise("late")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.withColumn("delay_bucket", bucket)
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@_register(
    "q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def _q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts — the
    double-aggregation shape (left join preserving zero-order
    customers, count per key, then histogram the counts). The
    non-equi residual (priority filter) rides the join condition so
    excluded orders still count the customer with c_count = 0.
    Second agg input is one row per customer — tiny."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@_register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_REVENUE_SQL}) AS total_rev_dec
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev_dec AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def _q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the scalar-
    subquery-max shape. Revenue stays DECIMAL through the max and the
    equality gate (double equality on derived floats is the classic
    cross-engine trap), casting to double only at output. The max is
    a one-row aggregate joined back as a broadcast hash join on the
    decimal value — an equi join, not a nested loop."""
    li = read_table(spark, sf, "lineitem")
    supp = read_table(spark, sf, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue_dec()).alias("total_rev_dec"))
    )
    mx = rev.agg(F.max("total_rev_dec").alias("mx_dec"))
    top = rev.join(F.broadcast(mx), rev["total_rev_dec"] == mx["mx_dec"], "inner")
    return (
        top.join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@_register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) stats ON pk = l_partkey
    WHERE p_brand = 'Brand#12' AND p_size <= 10
      AND CAST(l_quantity AS DECIMAL(20,4)) * 5 * cnt < sum_qty
    """,
)
def _q17_small_quantity_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape (adapted: p_size <= 10 stands in for the
    missing p_container): revenue lost to small-quantity orders —
    the correlated-average gate `l_quantity < 0.2 * avg(l_quantity)
    per part`. Decorrelated as a per-part (sum, count) aggregate and
    the algebraically identical integer-safe inequality
    qty * 5 * cnt < sum — exact decimal on both engines, no float
    average. The per-part stats computation is semi-join-pruned to
    the filtered parts before aggregating, so the stats shuffle only
    covers the brand's parts."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    p = part.filter((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 10)).select(
        "p_partkey"
    )
    pruned = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"], "left_semi")
    stats = pruned.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    qty_dec = F.col("l_quantity").cast("decimal(20,4)")
    gated = pruned.join(F.broadcast(stats), pruned["l_partkey"] == stats["pk"]).filter(
        qty_dec * F.lit(5) * F.col("cnt") < F.col("sum_qty")
    )
    return gated.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


@_register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REVENUE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def _q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: p_size bands stand in for the
    missing p_container lists): revenue under an OR-of-ANDs
    predicate spanning both join sides. Catalyst extracts the common
    join key and pushes the single-side conjuncts it can derive
    (brand/size unions to the part scan, quantity union to the
    lineitem scan) while the full disjunction evaluates post-join —
    the classic disjunctive-pushdown test."""
    li = read_table(spark, sf, "lineitem")
    part = read_table(spark, sf, "part")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.filter(cond).agg(F.sum(_revenue_dec()).cast("double").alias("revenue"))


@_register(
    "q21_waiting_supplier",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def _q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: "kept waiting" is l_shipdate >
    o_orderdate + 60 days, since l_commitdate / l_receiptdate don't
    exist): suppliers who were the SOLE late shipper in a
    multi-supplier finished order. The oracle keeps the spec's
    EXISTS / NOT-EXISTS form; the engine decorrelates BOTH into one
    per-order aggregate and gates on (n_supp >= 2, n_late_supp = 1);
    equivalence: EXISTS(other supplier) = n_supp >= 2, and (l1 late
    AND NOT EXISTS(other late)) = n_late_supp = 1.

    Plan shape: the fact-fact join collapses IMMEDIATELY to a
    per-(order, supplier) aggregate carrying a late-line count —
    every later step (per-order stats, the qualification gate, the
    winner join, the per-supplier total via sum(n_late_lines) ==
    count(*) of qualifying l1 rows) derives from that pairs frame,
    which is orders-of-magnitude smaller than the line level. The
    naive form re-joined raw lineitem against the gate, computing
    the biggest shuffle twice (PLANS.md showed reused: 0)."""
    li = read_table(spark, sf, "lineitem")
    orders = read_table(spark, sf, "orders")
    supp = read_table(spark, sf, "supplier")
    o = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        ).alias("is_late"),
    )
    pairs = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_lines")
    )
    stats = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum((F.col("n_late_lines") > 0).cast("int")).alias("n_late_supp"),
    )
    qual = stats.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)).select(
        "l_orderkey"
    )
    winners = pairs.filter(F.col("n_late_lines") > 0).join(qual, "l_orderkey")
    return (
        winners.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
    )


@_register(
    "q22_dormant_customers",
    """
    WITH avg_bal AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s, COUNT(*) AS c
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_custkey
      FROM customer, avg_bal
      WHERE CAST(c_nationkey % 5 AS BIGINT) IN (0, 1, 3)
        AND CAST(c_acctbal AS DECIMAL(12,2)) * c > s
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
        )
    )
    GROUP BY cntrycode ORDER BY cntrycode
    """,
)
def _q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: c_nationkey % 5 stands in for the
    missing c_phone country code; "dormant" = no order since
    2000-01-01 because every testdata customer has SOME order):
    well-funded customers with no recent orders. The global
    positive-balance average arrives as a ONE-ROW broadcast
    aggregate (the scalar subquery), compared exactly via
    acctbal * count > sum in decimal (no float average); the
    dormancy gate is a left-anti join against the date-pruned
    orders scan."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    bal_dec = F.col("c_acctbal").cast("decimal(12,2)")
    cand = (
        cust.withColumn("cntrycode", (F.col("c_nationkey") % 5).cast("long"))
        .filter(F.col("cntrycode").isin(0, 1, 3))
        .crossJoin(F.broadcast(avg_bal))
        .filter(bal_dec * F.col("c") > F.col("s"))
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    dormant = cand.join(
        recent, cand["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return (
        dormant.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_dec).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@_register(
    "q20_share_of_part",
    """
    WITH sy AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(20,4))) AS s_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM supplier s
    JOIN sy ON sy.l_suppkey = s.s_suppkey
    WHERE sy.s_qty * 2 > (
      SELECT SUM(CAST(l2.l_quantity AS DECIMAL(20,4)))
      FROM lineitem l2
      WHERE l2.l_partkey = sy.l_partkey
        AND l2.l_shipdate >= TIMESTAMP '1995-01-01'
        AND l2.l_shipdate <  TIMESTAMP '1996-01-01'
    )
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def _q20_share_of_part(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape, adapted (testdata has no partsupp; lineitem
    plays the correlated inner the way Q20 uses it against
    ps_availqty): suppliers who shipped MORE THAN HALF of a part's
    1995 volume, counted per supplier. The load-bearing feature is the
    CORRELATED SCALAR SUBQUERY under a comparison — Catalyst
    decorrelates it into an aggregate-then-join (per-part totals
    grouped once, joined back on l_partkey), so the '100 TB' plan is
    two shuffled aggregates and one join, never a per-row re-scan of
    lineitem. Quantities accumulate in exact decimal on both engines;
    the ×2 comparison stays in decimal (no float halving)."""
    li = read_table(spark, sf, "lineitem")
    supp = read_table(spark, sf, "supplier")
    li.createOrReplaceTempView("lineitem_q20_v")
    supp.createOrReplaceTempView("supplier_q20_v")
    return spark.sql(
        """
        WITH sy AS (
          SELECT l_suppkey, l_partkey,
                 SUM(CAST(l_quantity AS DECIMAL(20,4))) AS s_qty
          FROM lineitem_q20_v
          WHERE l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate <  TIMESTAMP '1996-01-01'
          GROUP BY l_suppkey, l_partkey
        )
        SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominated_parts
        FROM supplier_q20_v s
        JOIN sy ON sy.l_suppkey = s.s_suppkey
        WHERE sy.s_qty * 2 > (
          SELECT SUM(CAST(l2.l_quantity AS DECIMAL(20,4)))
          FROM lineitem_q20_v l2
          WHERE l2.l_partkey = sy.l_partkey
            AND l2.l_shipdate >= TIMESTAMP '1995-01-01'
            AND l2.l_shipdate <  TIMESTAMP '1996-01-01'
        )
        GROUP BY s.s_suppkey, s.s_name
        """
    )


# ---------------------------------------------------------------------------
# TPC-H partsupp closure (round 6): the driver testdata has no
# `partsupp`, so q2/q11/q16 and the spec form of q20 were a documented
# ceiling. `plans/tpch_partsupp.py` synthesizes the relation as a pure
# function of the part × supplier keys (TPC-H 4.2.3 supplier schedule +
# affine-mod attributes, integer cents) — generated IDENTICALLY inside
# Spark and inside each DuckDB oracle below, so the four remaining
# spec query classes get real hash-checked oracles. Substitutions per
# query docstring (testdata lacks s_address/s_phone/s_comment/p_mfr).
# ---------------------------------------------------------------------------


@_register(
    "q2_min_cost_supplier",
    f"""
    WITH {PSUP.PARTSUPP_CTE}
    SELECT CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, s.s_name, n.n_name,
           p.p_partkey, p.p_type, s.s_suppkey,
           ps.ps_supplycost_cents
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'ECONOMY' AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost_cents = (
        SELECT MIN(ps2.ps_supplycost_cents)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def _q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier; adapted output columns — the
    testdata has no s_address/s_phone/p_mfr, so p_type/s_suppkey stand
    in). The load-bearing shape is the CORRELATED MIN SUBQUERY over the
    same 4-way join: expressed here pre-decorrelated as a grouped MIN
    joined back on (part, cost) — the plan Catalyst would produce, made
    explicit. Region/nation/supplier are broadcast (≤1k rows at any
    driver sf; at 100 TB supplier stays a broadcastable dim), so the
    only shuffle is the per-part MIN aggregate; the min-cost frame is
    itself broadcast back (|parts in one size×type cell| ≪ |partsupp|).
    Cost is exact int64 cents end-to-end — no float compare.
    LIMIT 100 with a total-order tiebreak (…, p_partkey, s_suppkey)."""
    part = read_table(spark, sf, "part")
    supp = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation")
    region = read_table(spark, sf, "region")
    ps = PSUP.synthetic_partsupp(part, supp)

    eur_supp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eur = ps.join(
        F.broadcast(eur_supp), ps["ps_suppkey"] == eur_supp["s_suppkey"], "inner"
    )
    min_cost = ps_eur.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("ps_min_cost")
    )
    sized = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")).select(
        "p_partkey", "p_type"
    )
    return (
        ps_eur.join(F.broadcast(sized), ps_eur["ps_partkey"] == sized["p_partkey"])
        .join(
            F.broadcast(min_cost.withColumnRenamed("ps_partkey", "mc_partkey")),
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost_cents") == F.col("ps_min_cost")),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            "s_suppkey",
            "ps_supplycost_cents",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


@_register(
    "q11_important_stock",
    f"""
    WITH {PSUP.PARTSUPP_CTE},
      nat_ps AS (
        SELECT ps.ps_partkey,
               ps.ps_supplycost_cents * ps.ps_availqty AS val
        FROM partsupp ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
      )
    SELECT ps_partkey, SUM(val) AS value_cents
    FROM nat_ps
    GROUP BY ps_partkey
    HAVING SUM(val) * 1000 > (SELECT SUM(val) FROM nat_ps)
    ORDER BY value_cents DESC, ps_partkey
    """,
)
def _q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part inventory value within one
    nation, kept where the part's share exceeds 1/1000 of the national
    total (spec uses 0.0001/SF; 0.001 is scaled to the testdata part
    counts). The shape is the UNCORRELATED SCALAR AGGREGATE under
    HAVING: the national total is one broadcastable row computed from
    the SAME filtered frame — one shuffle for the per-part SUM, the
    total reused from a 1-row cross join, never a re-scan. All value
    arithmetic is int64 (cents × qty ≤ 2^30 per row; the ×1000
    threshold compare stays < 2^63 at any driver sf), so both engines
    compare exactly — no float fraction."""
    part = read_table(spark, sf, "part")
    supp = read_table(spark, sf, "supplier")
    nation = read_table(spark, sf, "nation")
    ps = PSUP.synthetic_partsupp(part, supp)

    nat_supp = (
        supp.join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    nat_ps = ps.join(
        F.broadcast(nat_supp), ps["ps_suppkey"] == nat_supp["s_suppkey"]
    ).select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("val"),
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(F.sum("val").alias("value_cents"))
    total = nat_ps.agg(F.sum("val").alias("nat_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("nat_total"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )


@_register(
    "q16_supplier_part_counts",
    f"""
    WITH {PSUP.PARTSUPP_CTE}
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.ps_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def _q16_supplier_part_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct suppliers per
    (brand, type, size) cell over a triple-negative filter. The
    complaint-supplier exclusion is adapted to s_acctbal < 0 (testdata
    has no s_comment) but keeps the spec's NOT-IN shape — expressed as
    a LEFT-ANTI join (s_suppkey is non-null by schema, so anti-join ≡
    NOT IN), with the excluded-supplier frame broadcast. One shuffle:
    the COUNT(DISTINCT) aggregate, which Spark expands to a two-phase
    (partial-distinct then merge) plan — the 100 TB shape, since the
    distinct set per cell is bounded by |supplier|."""
    part = read_table(spark, sf, "part")
    supp = read_table(spark, sf, "supplier")
    ps = PSUP.synthetic_partsupp(part, supp)

    bad_supp = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    filtered_part = part.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ps.join(
            F.broadcast(bad_supp),
            ps["ps_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(filtered_part), ps["ps_partkey"] == filtered_part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@_register(
    "q20_excess_stock",
    f"""
    WITH {PSUP.PARTSUPP_CTE}
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.ps_suppkey
        FROM partsupp ps
        WHERE ps.ps_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND CAST(ps.ps_availqty * 2 AS DECIMAL(20,4)) > (
            SELECT SUM(CAST(l.l_quantity AS DECIMAL(20,4)))
            FROM lineitem l
            WHERE l.l_partkey = ps.ps_partkey
              AND l.l_suppkey = ps.ps_suppkey
              AND l.l_shipdate >= TIMESTAMP '1995-01-01'
              AND l.l_shipdate <  TIMESTAMP '1996-01-01')
      )
    ORDER BY s_name
    """,
)
def _q20_excess_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 in its FULL spec form (the round-3 adaptation
    `q20_share_of_part` kept only the correlated-scalar skeleton; the
    synthetic partsupp restores the real three-level nesting): suppliers
    in one nation holding excess stock (availqty > half the 1995 shipped
    volume) of name-matched parts. Written in SQL so Catalyst performs
    the full decorrelation: the correlated SUM over lineitem becomes a
    grouped aggregate on (l_partkey, l_suppkey) joined back to partsupp
    — ONE pass over lineitem with the date filter pushed to the scan,
    never a per-row re-scan — and both IN subqueries become left-semi
    joins (part-name filter broadcast). Spec's 0.5 factor is flipped to
    an exact ×2 integer compare in decimal; NULL-sum groups (no 1995
    shipments) are excluded by comparison semantics, matching spec."""
    for name, tbl in (
        ("part", "part"),
        ("supplier", "supplier"),
        ("nation", "nation"),
        ("lineitem", "lineitem"),
    ):
        read_table(spark, sf, tbl).createOrReplaceTempView(f"{name}_q20f_v")
    PSUP.synthetic_partsupp(
        read_table(spark, sf, "part"), read_table(spark, sf, "supplier")
    ).createOrReplaceTempView("partsupp_q20f_v")
    return spark.sql(
        """
        SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier_q20f_v s
        JOIN nation_q20f_v n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey
            FROM partsupp_q20f_v ps
            WHERE ps.ps_partkey IN
                    (SELECT p_partkey FROM part_q20f_v WHERE p_name LIKE 'small%')
              AND CAST(ps.ps_availqty * 2 AS DECIMAL(20,4)) > (
                SELECT SUM(CAST(l.l_quantity AS DECIMAL(20,4)))
                FROM lineitem_q20f_v l
                WHERE l.l_partkey = ps.ps_partkey
                  AND l.l_suppkey = ps.ps_suppkey
                  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l.l_shipdate <  TIMESTAMP '1996-01-01')
          )
        ORDER BY s_name
        """
    )
