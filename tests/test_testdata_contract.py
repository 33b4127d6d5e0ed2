"""Testdata contract guard: the driver regenerates
/root/testdata between rounds, and silent encoding changes there
surface as deep oracle failures (round 2 lost 14 event queries to a
TIMESTAMP(NANOS)→MICROS switch). This test pins the contract at the
footer level — names exact, types by family — so drift fails HERE,
in the first minute of a round, with a message naming the column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import (
    schemas,
)
from pyspark.sql import types as T

TABLES = sorted(schemas.TESTDATA)


def _family(t) -> str:
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return "binary"
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return "list"
        return t.__class__.__name__
    mapping = {
        T.LongType: "int", T.IntegerType: "int", T.ShortType: "int",
        T.DoubleType: "float", T.FloatType: "float",
        T.DecimalType: "decimal",
        T.TimestampType: "timestamp", T.TimestampNTZType: "timestamp",
        T.StringType: "string", T.BinaryType: "binary",
        T.ArrayType: "list",
    }
    for cls, fam in mapping.items():
        if isinstance(t, cls):
            return fam
    return t.simpleString()


@pytest.mark.parametrize("table", TABLES)
def test_testdata_footer_matches_registered_schema(sf_dir, table):
    footer = pq.read_schema(f"{sf_dir}/{table}.parquet")
    declared = schemas.TESTDATA[table]

    got_names = footer.names
    want_names = [f.name for f in declared.fields]
    assert got_names == want_names, (
        f"{table}: driver testdata columns changed "
        f"(footer {got_names} vs registered {want_names}) — update "
        f"schemas.TESTDATA and audit every query touching this table"
    )

    for f in declared.fields:
        got = _family(footer.field(f.name).type)
        want = _family(f.dataType)
        # events.ts: the reader handles any timestamp unit (and the ns
        # encoding scans as long) — both families acceptable
        if table == "events" and f.name == "ts":
            assert got == "timestamp", f"events.ts no longer a timestamp: {got}"
            continue
        assert got == want, (
            f"{table}.{f.name}: type family drifted — footer {got}, "
            f"registered {want}"
        )
