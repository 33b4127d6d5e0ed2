"""Ties/skew sweep: every oracle query runs on tables where ~40% of
each payload column collapses to ONE constant and still hash-matches
DuckDB.

Two failure families hide behind mostly-distinct testdata:

- **Ordering ties.** Every ranking/window/top-k in this engine claims
  a total-order tiebreak (the determinism convention in
  ``__spark_entry__``): with distinct values that claim is never
  exercised — an ORDER BY missing its tiebreak column produces
  identical results by luck. Collapsing 40% of every sort key to one
  value makes tie blocks the common case, so any
  partition-order-dependent pick diverges between engines (and
  between Spark runs).
- **Hot keys.** A 40%-constant group/join column is exactly the
  skewed-key distribution that breaks naive plans at 100 TB. At
  sweep scale it cannot break *performance*, but it does force every
  groupBy/join through the one-giant-group path (partial aggregation,
  per-group windows over thousands of equal rows), where
  count/offset arithmetic bugs live.

Key/id columns stay dense (unique-key contracts) — identical _KEEP
set as the null sweep, plus the JSON/vector contract columns.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from test_oracle_tail import _canon_frame

pytestmark = pytest.mark.slow

SRC_DIR = "/root/testdata/sf0.001"
TIE_PCT = 40

_KEEP = {
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "c_custkey", "s_suppkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey",
    "event_id", "user_id", "doc_id", "vec_id",
    "embedding", "label",
    "props",
}

# one constant per type; domain-contract columns get in-range values.
# Column objects need an active session, so these are built lazily.
def _tie_const(col: str, base_type: str):
    overrides = {
        "l_discount": F.lit(0.05),
        "l_tax": F.lit(0.04),
        "l_quantity": F.lit(25.0),
    }
    if col in overrides:
        return overrides[col]
    consts = {
        "string": F.lit("the tied constant value"),
        "double": F.lit(1234.56),
        "bigint": F.lit(77),
        "int": F.lit(77),
        "timestamp": F.lit("2024-06-15 12:00:00").cast("timestamp"),
    }
    return consts.get(base_type)


@pytest.fixture(scope="module")
def tied_dir(spark, tmp_path_factory):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    d = tmp_path_factory.mktemp("tied_sf")
    for name in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SRC_DIR}/{name}.parquet")
        out = df
        for i, (col, dtype) in enumerate(df.dtypes):
            if col in _KEEP:
                continue
            base = dtype.split("(")[0]
            const = _tie_const(
                col, "timestamp" if base.startswith("timestamp") else base
            )
            if const is None:
                continue
            gate = (
                F.abs(F.hash(F.col(col).cast("string"), F.lit(i * 4801 + 3))) % 100
            ) < TIE_PCT
            out = out.withColumn(
                col, F.when(gate, const).otherwise(F.col(col)).cast(dtype)
            )
        out.coalesce(1).write.parquet(str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_tied(tied_dir):
    import duckdb

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tied_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _oracle_queries() -> list[str]:
    oracles = entry_mod.oracle_sql()
    return [q for q in entry_mod.queries() if q in oracles]


@pytest.mark.parametrize("name", _oracle_queries())
def test_ties_skew_match_oracle(spark, tied_dir, duck_tied, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, tied_dir).toPandas()
    odf = duck_tied.execute(sql).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rowcount on tied input spark={len(sdf)} oracle={len(odf)}"
    )
    srows = _canon_frame(sdf)
    orows = _canon_frame(odf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        raise AssertionError(f"{name}: tied-value results differ: {diffs}")
