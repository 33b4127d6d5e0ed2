"""Registry family: setops (5 queries).

- set_union_distinct
- set_except
- set_intersect
- set_except_all
- set_intersect_all
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def _set_union(spark: SparkSession, sf: str) -> DataFrame:
    c = read_table(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@_register(
    "set_except",
    """
    SELECT p_partkey AS partkey FROM part
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
)
def _set_except(spark: SparkSession, sf: str) -> DataFrame:
    """Parts never shipped before 1996 — EXCEPT (distinct) semantics
    (``subtract``; ``exceptAll`` would keep surplus duplicates)."""
    p = read_table(spark, sf, "part").select(F.col("p_partkey").alias("partkey"))
    li = (
        read_table(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select(F.col("l_partkey").alias("partkey"))
    )
    return p.subtract(li)


@_register(
    "set_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def _set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT (distinct) — customers with both finished and open
    orders; completes the set-op family (union/except/intersect)."""
    orders = read_table(spark, sf, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@_register(
    "set_except_all",
    """
    SELECT l_partkey AS partkey
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    EXCEPT ALL
    SELECT l_partkey
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def _set_except_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): keeps SURPLUS duplicates —
    a part shipped 5× after and 3× before 1997 survives exactly
    twice. Complements `set_except` (distinct semantics): Spark
    plans `exceptAll` as a tagged union + count-difference
    aggregation + generator replay, one shuffle on the value —
    linear, no join blow-up."""
    li = read_table(spark, sf, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")
    after = li.filter(F.col("l_shipdate") >= cut).select(
        F.col("l_partkey").alias("partkey")
    )
    before = li.filter(F.col("l_shipdate") < cut).select(
        F.col("l_partkey").alias("partkey")
    )
    return after.exceptAll(before)


@_register(
    "set_intersect_all",
    """
    SELECT l_partkey AS partkey
    FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    INTERSECT ALL
    SELECT l_partkey
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def _set_intersect_all(spark: SparkSession, sf: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each part appears
    min(count-after, count-before) times. Same tagged-count plan
    family as `set_except_all` — one value shuffle, linear."""
    li = read_table(spark, sf, "lineitem")
    cut = F.lit("1997-01-01").cast("timestamp")
    after = li.filter(F.col("l_shipdate") >= cut).select(
        F.col("l_partkey").alias("partkey")
    )
    before = li.filter(F.col("l_shipdate") < cut).select(
        F.col("l_partkey").alias("partkey")
    )
    return after.intersectAll(before)
