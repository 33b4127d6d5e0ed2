"""Registry family: skew (3 queries).

- skew_salted_agg
- skew_salted_join
- skew_diagnose_events
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "skew_salted_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _skew_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-stage aggregation == plain aggregation (the oracle
    proves row-identical results; the salt spreads a hot key across 16
    partitions in stage 1 — l_returnflag has 3 values, the worst
    possible key skew)."""
    li = read_table(spark, sf, "lineitem")
    out = SKW.salted_sum_count(
        li,
        ["l_returnflag"],
        {"sum_qty": F.col("l_quantity").cast("decimal(20,4)")},
        salts=16,
    )
    return out.select(
        "l_returnflag", F.col("sum_qty").cast("double").alias("sum_qty"), "n_rows"
    )


@_register(
    "skew_salted_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
    ) big ON l_orderkey = big.o_orderkey
    GROUP BY o_orderpriority
    """,
)
def _skew_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    """Salted join == plain join (deterministic salt on the big side,
    small side replicated saltsx) — the pre-AQE skew remedy, still
    needed when one key dominates a sort-merge join."""
    li = read_table(spark, sf, "lineitem")
    big_orders = (
        read_table(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_orderpriority")
    )
    joined = SKW.salted_join(li, big_orders, "l_orderkey", "o_orderkey", salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@_register(
    "skew_diagnose_events",
    """
    WITH c AS (
      SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY 1
    ), t AS (
      SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c
    ), top AS (
      SELECT * FROM c ORDER BY n_rows DESC, event_type NULLS FIRST LIMIT 10
    )
    SELECT event_type, n_rows,
           CAST(floor(n_rows * 1000000 / total) AS BIGINT) AS share_ppm,
           CAST(floor(n_rows * n_keys * 1000 / total) AS BIGINT)
             AS skew_ratio_x1000,
           CAST(ceil(CAST(n_rows AS DOUBLE) / 10000) AS BIGINT) AS rec_salts
    FROM top, t
    """,
)
def _skew_diagnose_events(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew diagnostic (operators/skew.skew_diagnose): the
    measurement that decides whether salted_join / AQE skew handling
    is needed BEFORE a 100-TB shuffle finds out the hard way — top
    keys with exact row counts, ppm share, skew ratio vs the mean key
    (the quantity AQE's skewedPartitionFactor thresholds against) and
    the recommended salt fan-out for salted_join. One count
    aggregation + a KB-scale TakeOrdered + a one-row totals
    broadcast; floor (not a bigint cast) for the ratios because
    double→int casts round on some engines and truncate on others."""
    ev = read_table(spark, sf, "events")
    return SKW.skew_diagnose(
        ev, "event_type", top_n=10, target_rows_per_task=10_000
    )
