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

__all__ = [
    "morton_code",
    "zorder_write",
    "write_bucketed",
    "bucketed_join",
    "collect_zone_maps",
    "pruned_read",
    "pruned_read_multi",
    "refresh_zone_maps",
    "attach_quantile_bucket",
]


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


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed (and
    bucket-sorted) on ``key``.

    This is the 100 TB co-location strategy the reference's plain
    parquet writes (`extract.py:66-71`) cannot express: two tables
    bucketed on the same key with the same bucket count join with
    ZERO shuffle — each task zips bucket i with bucket i — and with
    ``sort=True`` the sort-merge join also skips its sorts. A fact ⋈
    fact join (e.g. lineitem ⋈ orders on orderkey) that would shuffle
    200 TB becomes an embarrassingly parallel per-bucket merge.

    One file per bucket: Spark elides the SMJ sort only when every
    bucket is a single pre-sorted file, so we repartition on the key
    first (bucket-count partitions) rather than letting every input
    task emit a file per bucket (which also avoids the small-file
    explosion at scale).
    """
    writer = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key, forcing the
    shuffle-free sort-merge path (broadcast would hide the property
    being exercised). The returned plan must contain no Exchange —
    asserted in tests/test_layout.py."""
    lhs = spark.table(left_table)
    rhs = spark.table(right_table)
    return lhs.hint("merge").join(rhs, key, how)


def collect_zone_maps(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-FILE min/max/count zone maps for ``cols`` — the skipping
    index Delta/Iceberg keep in their commit log, built for plain
    parquet dirs.

    Parquet row-group pruning already consults footer min/max, but it
    happens AFTER every file is listed and its footer fetched — at
    100 TB that is millions of object-store reads before the first
    data byte. A persisted file-level zone map moves the decision to
    the driver's plan time: one small metadata table decides which
    files exist for the query, and unselected files are never listed,
    opened, or scheduled (the same directory-level economics as the
    persisted IVF/LSH indexes in operators/similarity).

    One column-pruned scan computes the map (only ``cols`` are read);
    persist it with a plain ``.write.parquet`` next to the table and
    refresh incrementally on append — the map for immutable files
    never changes, so appends only add rows.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def pruned_read(
    spark,
    path: str,
    zone_maps: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Read only the files whose ``[min_col, max_col]`` zone overlaps
    ``[lo, hi]``, then re-apply the exact predicate to the survivors
    (zones admit false positives, never false negatives — pruning is
    a performance decision, not a correctness one, and the final
    filter guarantees identical results to the full scan).

    The matching-file collect is bounded metadata — one row per data
    file of THIS table, the same cardinality every lakehouse driver
    materializes to plan a scan. An empty survivor set returns an
    empty frame with the table's schema without listing data files.
    """
    lo_lit, hi_lit = F.lit(lo), F.lit(hi)
    survivors = (
        zone_maps.filter(
            (F.col(f"max_{col}") >= lo_lit) & (F.col(f"min_{col}") <= hi_lit)
        )
        .select("file")
        .collect()
    )
    files = [r["file"] for r in survivors]
    predicate = (F.col(col) >= lo_lit) & (F.col(col) <= hi_lit)
    if not files:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files).filter(predicate)


def pruned_read_multi(
    spark,
    path: str,
    zone_maps: DataFrame,
    preds: "list[tuple[str, object, object]]",
) -> DataFrame:
    """Multi-column zone-map pruning: read only files whose zones
    overlap EVERY ``(col, lo, hi)`` range, then re-apply all exact
    predicates. This is what a z-ordered layout exists for — after
    :func:`zorder_write` each file is narrow in BOTH dimensions, so a
    2-D predicate's survivor set is the intersection of two small
    file sets instead of "every file" (the failure mode of 1-D
    clustering, where the second column's values span the full range
    in every file). Same correctness contract as :func:`pruned_read`:
    zones admit false positives only and survivors re-filter.

    ``preds`` must be non-empty — an empty predicate list would mean
    "prune on nothing" and is almost certainly a caller bug (use a
    plain ``spark.read.parquet`` for a full scan)."""
    if not preds:
        raise ValueError("pruned_read_multi: preds must be non-empty")
    cond = None
    predicate = None
    for col, lo, hi in preds:
        c = (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        p = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        cond = c if cond is None else cond & c
        predicate = p if predicate is None else predicate & p
    files = [r["file"] for r in zone_maps.filter(cond).select("file").collect()]
    if not files:
        schema = spark.read.parquet(path).schema
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files).filter(predicate)


def refresh_zone_maps(
    spark, path: str, old_maps: DataFrame, cols: list[str]
) -> DataFrame:
    """Incrementally refresh a persisted zone map after appends: scan
    ONLY files not yet mapped (parquet files are immutable, so an
    existing file's zone never changes) and drop map rows for files
    that disappeared (compaction). Appending a day of files to a
    100-TB table costs a day-sized stats scan, never a re-profile of
    the table — the same append-only economics as the LSH/IVF/HLL
    index family.

    File discovery is driver metadata (``inputFiles`` — one listing,
    no data read), the same cardinality every scan planner holds.
    Equality with a from-scratch ``collect_zone_maps`` is pinned in
    tests/test_round7_ops.py.
    """
    current = set(spark.read.parquet(path).inputFiles())
    known = {r["file"] for r in old_maps.select("file").collect()}
    kept = old_maps.filter(F.col("file").isin(list(known & current) or [""]))
    new_files = sorted(current - known)
    if not new_files:
        return kept
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    fresh = (
        spark.read.parquet(*new_files)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )
    return kept.unionByName(fresh)


def attach_quantile_bucket(
    df: DataFrame,
    key: str,
    id_col: str,
    nbuckets: int,
    out_col: str,
    sample_k: int = 1024,
    salt: str = "qb1",
) -> DataFrame:
    """Value-deterministic, order-preserving, SKEW-BALANCED bucket
    ids (0..nbuckets-1) for a numeric key.

    ``surrogate.attach_order_bucket`` splits [min, max] into uniform
    spans — value-deterministic, but a skewed key (a Zipf price
    column, a hot timestamp range) lands most rows in a few spans and
    the two-phase cumsum/rank family inherits the imbalance. This
    operator takes boundaries from the key's QUANTILES instead,
    estimated on a deterministic uniform row sample: the bottom-k
    rows by md5(salt‖id) (reproducible across engines, executors,
    retries and re-evaluations — the property repartitionByRange's
    re-sampled boundaries cannot give, see partitioned_cumsum's
    docstring), sorted, with boundary j = sample[floor(j·m/n)]
    (1-based). bucket(v) = #{boundaries ≤ v} — a pure function of the
    value, so equal keys never straddle a boundary and every subplan
    that re-evaluates the bucketing agrees by construction.

    The sample collect is ≤ ``sample_k`` rows of (hash, value) —
    bounded driver metadata, the same budget as the IVF centroid
    pick. NULL keys bucket to ``nbuckets`` (nulls-last); NaN (float
    keys) to ``nbuckets`` as well (NaN sorts greatest in both
    engines, sharing the past-the-end bucket keeps order).
    """
    if nbuckets < 1:
        raise ValueError("nbuckets must be >= 1")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    from pyspark.sql import types as _T

    finite = df.filter(F.col(key).isNotNull())
    if isinstance(df.schema[key].dataType, (_T.FloatType, _T.DoubleType)):
        # NaN must not enter the sample: Python's sort on NaN is
        # undefined-order, and NaN already has its reserved bucket
        finite = finite.filter(~F.isnan(F.col(key)))
    sample = (
        finite.select(F.col(key).alias("__v"), h.alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(sample_k)
        .collect()
    )
    vals = sorted(r["__v"] for r in sample)
    m = len(vals)
    bounds: list = []
    if m:
        for j in range(1, nbuckets):
            idx = max(1, (j * m) // nbuckets)  # 1-based floor
            bounds.append(vals[idx - 1])
    v = F.col(key)
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        numeric = F.size(F.filter(barr, lambda b: b <= v))
    else:
        numeric = F.lit(0)
    dt = df.schema[key].dataType
    from pyspark.sql import types as T

    is_float = isinstance(dt, (T.FloatType, T.DoubleType))
    bucket = F.when(v.isNull(), F.lit(nbuckets))
    if is_float:
        bucket = bucket.when(F.isnan(v), F.lit(nbuckets))
    bucket = bucket.otherwise(numeric)
    return df.withColumn(out_col, bucket.cast("int"))
