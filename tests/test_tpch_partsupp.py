"""Synthetic partsupp (round 6): TPC-H 4.2.3 spec properties, and the
bit-level proof that the Spark generator and the DuckDB oracle CTE
produce the IDENTICAL relation — the premise the q2/q11/q16/q20
oracles rest on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
    tpch_partsupp as PSUP,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources import (
    read_table,
)


@pytest.fixture(scope="module")
def ps(spark, sf_dir):
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    return PSUP.synthetic_partsupp(part, supp)


def test_four_distinct_suppliers_per_part(spark, sf_dir, ps):
    n_parts = read_table(spark, sf_dir, "part").count()
    per_part = ps.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("ps_suppkey").alias("nd"),
    )
    assert per_part.count() == n_parts
    bad = per_part.filter((F.col("n") != 4) | (F.col("nd") != 4)).count()
    assert bad == 0, "spec schedule must yield exactly 4 distinct suppliers"


def test_keys_and_attribute_bounds(spark, sf_dir, ps):
    s_max = read_table(spark, sf_dir, "supplier").count()
    row = ps.agg(
        F.min("ps_suppkey").alias("k_lo"),
        F.max("ps_suppkey").alias("k_hi"),
        F.min("ps_availqty").alias("q_lo"),
        F.max("ps_availqty").alias("q_hi"),
        F.min("ps_supplycost_cents").alias("c_lo"),
        F.max("ps_supplycost_cents").alias("c_hi"),
    ).collect()[0]
    assert 1 <= row.k_lo and row.k_hi <= s_max
    assert 1 <= row.q_lo and row.q_hi <= 9999
    assert 100 <= row.c_lo and row.c_hi <= 100000


def test_generator_matches_duckdb_cte_bit_for_bit(ps, sf_dir):
    con = duckdb.connect()
    for t in ("part", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = con.execute(
        f"WITH {PSUP.PARTSUPP_CTE} SELECT ps_partkey, ps_suppkey, "
        "ps_availqty, ps_supplycost_cents FROM partsupp "
        "ORDER BY ps_partkey, ps_suppkey"
    ).fetchall()
    mine = [
        (r.ps_partkey, r.ps_suppkey, r.ps_availqty, r.ps_supplycost_cents)
        for r in ps.orderBy("ps_partkey", "ps_suppkey").collect()
    ]
    assert [tuple(int(v) for v in row) for row in oracle] == mine


def test_deterministic_across_invocations(ps, spark, sf_dir):
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    again = PSUP.synthetic_partsupp(part, supp)
    assert ps.exceptAll(again).count() == 0
    assert again.exceptAll(ps).count() == 0


def test_rejects_fewer_than_four_suppliers(spark):
    """|supplier| < 4 collapses the four supplier offsets (S div 4 ==
    0) into duplicate (ps_partkey, ps_suppkey) rows — the documented
    precondition is enforced by an assert_true folded into the
    supplier-count aggregate, raising at job time."""

    part = spark.range(1, 11).select(F.col("id").alias("p_partkey"))
    supplier = spark.range(1, 4).select(F.col("id").alias("s_suppkey"))
    ps = PSUP.synthetic_partsupp(part, supplier)
    with pytest.raises(Exception) as exc:
        ps.collect()
    assert "requires |supplier| >= 4" in str(exc.value)


def test_exactly_four_suppliers_is_valid(spark):
    """The boundary S=4 must pass the guard and keep the PK unique."""
    part = spark.range(1, 51).select(F.col("id").alias("p_partkey"))
    supplier = spark.range(1, 5).select(F.col("id").alias("s_suppkey"))
    ps = PSUP.synthetic_partsupp(part, supplier)
    assert ps.count() == 200
    assert ps.select("ps_partkey", "ps_suppkey").distinct().count() == 200

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
pytestmark = pytest.mark.slow
