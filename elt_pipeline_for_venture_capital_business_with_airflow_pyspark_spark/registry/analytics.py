"""Registry family: analytics (4 queries).

- attribution_last_touch
- basket_pair_brands
- customer_rfm_segments
- pareto_abc_lineitem
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "attribution_last_touch",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, event_id AS cid,
             'ch' || CAST(CAST(json_extract_string(props, '$.k') AS INT) % 5
                          AS VARCHAR) AS channel
      FROM events WHERE event_type = 'click'
    ), j AS (
      SELECT p.event_id, p.value, c.channel,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.cid DESC) AS rn
      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT COALESCE(channel, 'none') AS channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS revenue
    FROM j WHERE rn = 1 GROUP BY COALESCE(channel, 'none')
    """,
)
def _attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    latest click at-or-before it (per user), channel derived from the
    click's props JSON. The Spark side is the single-shuffle union-sweep
    AS-OF join (operators/temporal.asof_join — no purchase×click
    row amplification, unlike the oracle's quadratic LEFT JOIN
    formulation, which is the point: same result, scale-safe plan).
    Unattributed purchases land in channel 'none'."""
    ev = read_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("cid"),
        F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").cast("int") % 5).cast("string"),
        ).alias("channel"),
    )
    attributed = TMP.asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"channel": F.col("channel")},
        tiebreak="cid",
    )
    return (
        attributed.groupBy(F.coalesce("channel", F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(20,4)")).cast("double").alias("revenue"),
        )
    )


@_register(
    "basket_pair_brands",
    """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, p_brand AS i
      FROM lineitem JOIN part ON l_partkey = p_partkey
    )
    SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_baskets
    FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
    GROUP BY a.i, b.i
    ORDER BY n_baskets DESC, item_a ASC, item_b ASC
    LIMIT 20
    """,
)
def _basket_pair_brands(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket co-occurrence (operators/analytics.basket_pairs):
    top-20 brand pairs bought inside the same order. The pair join is
    blocked on the order key — cost is sum(k choose 2) per basket
    (k ≤ 7 in TPC-H), linear at any scale, and the dedup'd
    basket×item frame's hash partitioning is reused by the join.
    Ranking tiebreak is lexical so the LIMIT cut is total."""
    li = read_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    part = read_table(spark, sf, "part").select("p_partkey", "p_brand")
    bi = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    return ANA.basket_pairs(bi, "l_orderkey", "p_brand", top_n=20)


@_register(
    "customer_rfm_segments",
    """
    WITH per AS (
      SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE), DATE '1998-09-01')
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey
    ), b AS (
      SELECT
        ROUND(quantile_cont(recency_days, 0.2), 4) AS r1,
        ROUND(quantile_cont(recency_days, 0.4), 4) AS r2,
        ROUND(quantile_cont(recency_days, 0.6), 4) AS r3,
        ROUND(quantile_cont(recency_days, 0.8), 4) AS r4,
        ROUND(quantile_cont(frequency, 0.2), 4) AS f1,
        ROUND(quantile_cont(frequency, 0.4), 4) AS f2,
        ROUND(quantile_cont(frequency, 0.6), 4) AS f3,
        ROUND(quantile_cont(frequency, 0.8), 4) AS f4,
        ROUND(quantile_cont(monetary, 0.2), 4) AS m1,
        ROUND(quantile_cont(monetary, 0.4), 4) AS m2,
        ROUND(quantile_cont(monetary, 0.6), 4) AS m3,
        ROUND(quantile_cont(monetary, 0.8), 4) AS m4
      FROM per
    ), s AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             6 - (1 + CAST(recency_days > r1 AS INT) + CAST(recency_days > r2 AS INT)
                    + CAST(recency_days > r3 AS INT) + CAST(recency_days > r4 AS INT))
               AS r_score,
             1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
               + CAST(frequency > f3 AS INT) + CAST(frequency > f4 AS INT) AS f_score,
             1 + CAST(monetary > m1 AS INT) + CAST(monetary > m2 AS INT)
               + CAST(monetary > m3 AS INT) + CAST(monetary > m4 AS INT) AS m_score
      FROM per, b
    )
    SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm_cell
    FROM s
    """,
)
def _customer_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation (operators/analytics.rfm_scores):
    recency/frequency/monetary per customer scored 1-5 against corpus
    quintile cut points. The cut points are one row of exact
    percentiles broadcast back — no global ntile sort (which would
    single-reduce the customer set at scale)."""
    orders = read_table(spark, sf, "orders")
    return ANA.rfm_scores(orders, "1998-09-01")


@_register(
    "pareto_abc_lineitem",
    """
    WITH rev AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS w
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT SUM(w) AS total FROM rev
    ), cum AS (
      SELECT l_partkey, w,
             SUM(w) OVER (ORDER BY w DESC, l_partkey) AS c
      FROM rev
    )
    SELECT l_partkey,
           CAST(w AS DOUBLE) AS weight,
           CAST(c AS DOUBLE) AS cum_weight,
           CASE WHEN c * 5 <= total * 4 THEN 'A'
                WHEN c * 20 <= total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum, tot
    """,
)
def _pareto_abc_lineitem(spark: SparkSession, sf: str) -> DataFrame:
    """ABC / Pareto revenue-concentration classes per part
    (operators/features.pareto_class): rank parts by descending
    revenue, class A while the running share stays ≤80%, B ≤95%,
    else C. The running total is the two-phase partitioned cumsum (no
    single-reducer sort — the same prefix-offset construction as the
    surrogate-key builder) and the share cut is exact cross-multiplied
    decimal (cum·5 ≤ total·4), so boundary rows never float-flip."""
    li = read_table(spark, sf, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(20,4)")).alias("w")
    )
    return FT.pareto_class(rev, "l_partkey", "w")
