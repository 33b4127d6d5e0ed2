"""Data-layout clustering: Z-order (Morton) interleaving for
multi-dimensional file/row-group pruning.

The reference writes unsorted parquet (`extract.py:66-71`) — fine at
GBs, fatal at 100 TB where a filter on (user, day) must prune most of
the lake without reading it. Sorting by one column prunes one
predicate; interleaving the bits of two key columns gives a single
sort key whose ranges are simultaneously narrow in BOTH dimensions
(the Delta/Iceberg OPTIMIZE ZORDER technique). Parquet min/max
row-group stats + `repartitionByRange` on the z-value then prune
either-dimension filters.

Pure bit-arithmetic Column expressions — whole-stage-codegen'd, no
UDF, no shuffle beyond the single range partitioning of the write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_code", "zorder_write"]


def morton_code(a: str | Column, b: str | Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    a's bit i → output bit 2i, b's bit i → output bit 2i+1. Values
    must be pre-normalized to [0, 2^bits) (rank or bucket them first —
    morton codes only cluster well on roughly-uniform dimensions)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), parts).alias("z")


def zorder_write(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the z-order of two (normalized)
    dimension expressions: range-partition on the z-value into
    ``files`` output files, sort rows within each by z. Each file's
    min/max stats are then narrow in both dimensions, so a predicate
    on either column prunes most files/row-groups at scan time."""
    z = morton_code(a, b, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
