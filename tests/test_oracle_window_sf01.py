"""Driver-window oracle sweep at sf0.1 — the SCALE-sensitivity gate.

The tail sweep (test_oracle_tail) runs every oracle at sf0.001; this
one re-runs the 50 driver-window queries at 100× that size. It exists
because of a bug class the small sweep cannot see: operators whose
runtime state depends on data volume (sampled range boundaries,
partition counts, AQE decisions) can be correct at sf0.001/sf0.01 and
silently wrong once partitions multiply — exactly how the surrogate-key
resampled-boundary corruption (operators/surrogate.py module docstring)
shipped through a green sf0.01 window and only failed at sf0.1.

Slow (~3-4 min): window queries only, one SparkSession, one DuckDB.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from test_oracle_tail import _canon_frame

pytestmark = pytest.mark.slow

SF01_DIR = "/root/testdata/sf0.1"


def _window_queries() -> list[str]:
    qs = list(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    window = qs[: entry_mod._DRIVER_WINDOW]
    return [q for q in window if q in oracles]


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.schemas import (
        TESTDATA_TABLES,
    )

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _window_queries())
def test_window_oracle_hash_match_at_sf01(spark, duck_sf01, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, SF01_DIR).toPandas()
    odf = duck_sf01.execute(sql).df()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: rowcount spark={len(sdf)} oracle={len(odf)}"
    )
    srows = _canon_frame(sdf)
    orows = _canon_frame(odf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        raise AssertionError(f"{name}: values differ at sf0.1, first diffs: {diffs}")
