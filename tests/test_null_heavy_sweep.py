"""Null-heavy sweep: every oracle query runs on tables whose payload
columns are ~30% NULL and still hash-matches DuckDB.

SQL NULL semantics are the classic cross-engine divergence surface —
three-valued logic in filters, nulls ignored by aggregates but not by
string concat, null join keys dropping from equi joins, null arrays
under higher-order functions, null text under tokenizers. The driver's
testdata is fully dense, so none of that is exercised; at 100 TB,
sparse columns are the NORM (the reference's own staging tables are
full of nullable payload columns, init_stg.sql).

Construction: copy sf0.001, then NULL a deterministic ~30% slice of
every non-key column (key columns — *key / *_id / doc_id / vec_id —
stay dense: operators like surrogate keys document a non-null unique
key contract, and FK joins stay meaningful). Both engines read the
same nulled parquet, so the comparison isolates engine semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

from test_oracle_tail import _canon_frame

pytestmark = pytest.mark.slow

SRC_DIR = "/root/testdata/sf0.001"
NULL_FRACTION_PCT = 30

# columns that keep their values: identity/join keys and the columns
# operators contractually require non-null
_KEEP = {
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "o_orderkey", "o_custkey", "c_custkey", "s_suppkey", "p_partkey",
    "n_nationkey", "n_regionkey", "r_regionkey",
    "event_id", "user_id", "doc_id", "vec_id",
    # the similarity surface's documented contract: vectors and labels
    # are non-null INDEX INPUTS (null rows are scrubbed upstream by the
    # curation/quarantine stage; the operators additionally guard their
    # driver-side centroid/codebook fits against null vectors)
    "embedding", "label",
}


@pytest.fixture(scope="module")
def nulled_dir(spark, tmp_path_factory):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    d = tmp_path_factory.mktemp("nulled_sf")
    for name in TESTDATA_TABLES:
        df = spark.read.parquet(f"{SRC_DIR}/{name}.parquet")
        out = df
        for i, c in enumerate(df.columns):
            if c in _KEEP:
                continue
            # deterministic per-(column, row) slice: hash of the full
            # row's first key-ish column is unavailable generically, so
            # hash the column value itself plus a per-column salt —
            # rows with equal values null together, which is fine for a
            # parity sweep (both engines read the same files anyway)
            gate = (
                F.abs(F.hash(F.col(c).cast("string"), F.lit(i * 1009 + 7)))
                % 100
            ) < NULL_FRACTION_PCT
            out = out.withColumn(
                c, F.when(gate, F.lit(None)).otherwise(F.col(c))
            )
        out.coalesce(1).write.parquet(str(d / f"{name}.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def duck_nulled(nulled_dir):
    import duckdb

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{nulled_dir}/{t}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _oracle_queries() -> list[str]:
    oracles = entry_mod.oracle_sql()
    return [q for q in entry_mod.queries() if q in oracles]


@pytest.mark.parametrize("name", _oracle_queries())
def test_null_heavy_matches_oracle(spark, nulled_dir, duck_nulled, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, nulled_dir).toPandas()
    odf = duck_nulled.execute(sql).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rowcount on NULL-heavy input spark={len(sdf)} oracle={len(odf)}"
    )
    srows = _canon_frame(sdf)
    orows = _canon_frame(odf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        raise AssertionError(f"{name}: null-heavy values differ: {diffs}")
