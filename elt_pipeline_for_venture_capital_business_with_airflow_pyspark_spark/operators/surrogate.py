"""Surrogate-key assignment (SURVEY.md §2.5 W1).

The reference delegates surrogate keys to Postgres BIGSERIAL on append
(reference: dataset/warehouse/init_dwh.sql:32, loaded via
dags/vcapital_warehouse/tasks/components/load.py:68-73). A sequence is
inherently single-writer; the distributed equivalents:

- ``deterministic`` (default): dense rank over the natural key —
  reproducible across runs, required wherever goldens/oracles compare
  key values. Implemented as a TWO-PHASE partitioned rank (no global
  single-reducer sort): every row gets an order-preserving BUCKET id
  computed from the row's own value against exact min/max aggregates
  (uniform-width slices of the first key's range; string keys map
  through their first 8 UTF-8 bytes read as a big-endian integer —
  monotone, prefix ties share a bucket), a per-bucket
  ``row_number()`` window ranks within buckets, and broadcast
  prefix-sum offsets over the per-bucket counts (ONE ROW PER BUCKET,
  KB-sized at any scale) splice the buckets into the global
  sequence. The data never funnels through one reducer.

  Why buckets instead of ``repartitionByRange``: the range
  partitioner SAMPLES its boundaries, and a DataFrame diamond (the
  data path and the counts path both consume the partitioned frame)
  evaluates the exchange twice — two samplings, two different
  boundary sets, offsets that do not match positions. Silent key
  corruption that only appears once partition counts grow (caught at
  sf0.1; sf0.01 fit one sampling pass). Bucket ids are a pure
  function of the row value and two exact aggregates, so every
  re-evaluation agrees by construction.
- ``fast``: ``monotonically_increasing_id() + offset`` — no shuffle,
  not reproducible; for append-heavy fact loads where the key only
  needs uniqueness.

Bucket-balance caveat: uniform-width slices assume the first key is
roughly uniform over its range (surrogate-key inputs — sequential
ids, hashed names — usually are). Heavy skew concentrates rows in few
buckets, degrading parallelism but never correctness; raise
``num_buckets`` (default 4× shuffle partitions) to smooth it.

``offset`` carries the max existing key so incremental loads keep
appending to the sequence instead of restarting at 1.

Natural keys must uniquely identify rows in ``deterministic`` mode —
with duplicate keys the tie order (hence key assignment among the
tied rows) is not reproducible, exactly as with a global
``row_number()`` over a non-unique ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _order_proxy(df: DataFrame, key: str) -> F.Column:
    """Monotone numeric proxy of an orderable column: x <= y implies
    proxy(x) <= proxy(y). Equal proxies (string prefix ties, double
    rounding) only mean "same bucket" — within-bucket order still
    sorts the full natural key, so ties never cost correctness."""
    dt = df.schema[key].dataType
    c = F.col(key)
    if isinstance(dt, _NUMERIC_TYPES):
        return c.cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dt, (T.StringType, T.BinaryType)):
        # first 8 UTF-8 bytes as a big-endian unsigned integer: UTF-8
        # byte order IS code-point order, so the proxy is monotone in
        # the string; conv() parses the hex into a (lossy but
        # monotone) double via decimal string
        first8 = F.substring(c.cast("binary"), 1, 8)
        padded_hex = F.rpad(F.hex(first8), 16, "0")
        return F.conv(padded_hex, 16, 10).cast("decimal(38,0)").cast("double")
    raise TypeError(f"no order proxy for surrogate-key column type: {dt}")


def attach_order_bucket(
    df: DataFrame,
    key: str,
    nbuckets: int,
    out_col: str,
    desc: bool = False,
    nulls_last: bool | None = None,
) -> DataFrame:
    """Attach a value-deterministic, order-preserving bucket id
    column (0..nbuckets-1): a pure function of the row value and the
    key column's exact [min, max] — the deterministic replacement for
    sampled range boundaries wherever a partitioned frame is consumed
    by more than one subplan (see module docstring). ``desc=True``
    reverses the bucket order to follow a descending sort.
    ``nulls_last`` places the null bucket; it defaults to the engine's
    sort defaults (asc → nulls first, desc → nulls last) and MUST be
    set to match any explicit NULLS FIRST/LAST on the sort the bucket
    feeds, or the null bucket splices at the wrong end. One KB-sized
    broadcast of the bounds; no sampling, so any number of downstream
    re-evaluations agree.

    NaN keys (float types): NaN sorts greater than every number in
    both Spark and DuckDB, so NaN rows get their own bucket one past
    the last numeric bucket (before the null bucket when nulls are
    last) — and the bounds aggregate EXCLUDES NaN, otherwise one NaN
    makes span NaN and every row floors into bucket 0 (a silent
    single-reducer collapse)."""
    if nulls_last is None:
        nulls_last = desc
    proxy = _order_proxy(df, key)
    if desc:
        proxy = -proxy
    dt = df.schema[key].dataType
    is_float = isinstance(dt, (T.FloatType, T.DoubleType))
    finite = F.when(~F.isnan(proxy), proxy) if is_float else proxy
    bounds = df.agg(
        F.min(finite).alias("__ob_min"), F.max(finite).alias("__ob_max")
    )
    span = F.col("__ob_max") - F.col("__ob_min")
    # NaN is the GREATEST value in both engines' sorts: it follows the
    # numbers ascending, precedes them descending; nulls sit outside
    # both per nulls_last. Bucket ids just encode those positions.
    if desc:
        nan_b = -1
        null_b = nbuckets + 1 if nulls_last else -2
    else:
        nan_b = nbuckets
        null_b = nbuckets + 1 if nulls_last else -1
    null_bucket = F.lit(null_b)
    nan_bucket = F.lit(nan_b)
    numeric_bucket = F.least(
        F.lit(nbuckets - 1),
        F.floor(
            (proxy - F.col("__ob_min"))
            / (F.when(span > 0, span).otherwise(F.lit(1.0)) / nbuckets)
        ).cast("int"),
    )
    bucket = F.when(proxy.isNull(), null_bucket)
    if is_float:
        bucket = bucket.when(F.isnan(proxy), nan_bucket)
    bucket = bucket.otherwise(numeric_bucket)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, bucket)
        .drop("__ob_min", "__ob_max")
    )


def bucketed_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    num_buckets: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """Global ``ROW_NUMBER() OVER (ORDER BY order_cols)`` with NO
    single-reducer window — the two-phase bucketed rank.

    A global window (empty PARTITION BY) funnels every row through one
    task: the plan shows ``Exchange SinglePartition`` and the stage's
    parallelism is 1 regardless of cluster size — the canonical
    at-scale failure of ranking/running-total queries. This operator
    produces the IDENTICAL column in three fully parallel steps:

    1. every row gets an order-preserving bucket id computed from the
       row's own value against the first order column's exact
       [min, max] (``attach_order_bucket`` — one KB-sized broadcast,
       value-deterministic, so re-evaluations agree by construction);
    2. ``row_number()`` partitioned BY BUCKET over the full order —
       one hash exchange, parallelism = bucket count;
    3. per-bucket counts → prefix-sum offsets (one row per OCCUPIED
       bucket, KB-sized at any scale) splice bucket-local ranks into
       the global sequence as a literal-map lookup — no join.

    ``order_cols`` must totally order the frame (append a unique key
    as the last column, exactly as you would for a deterministic
    ``ROW_NUMBER``); ranks start at ``1 + offset``. NULLs in the
    first order column rank first (Spark ASC NULLS FIRST default),
    matching ``ROW_NUMBER ... NULLS FIRST`` oracle semantics.

    Semantics twin: ``ROW_NUMBER() OVER (ORDER BY <order_cols> ASC
    NULLS FIRST)`` — oracle-checked in the registry
    (``window_bucketed_rank``).
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    for reserved in (out_col, "__br_bucket", "__br_local"):
        if reserved in df.columns:
            raise ValueError(
                f"bucketed_rank: column {reserved!r} already exists in "
                "the input frame — pass a different out_col / rename "
                "the conflicting column (the __br_* names are internal)"
            )
    keys = [F.col(c) for c in order_cols]
    if num_buckets is None:
        nbuckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    else:
        nbuckets = num_buckets

    # phase 1: value-deterministic, order-preserving bucket id from
    # the first order column's exact [min, max] — a pure function of
    # the row, immune to the re-evaluation nondeterminism of sampled
    # range boundaries (see module docstring). One KB-sized broadcast.
    tagged = attach_order_bucket(
        df, order_cols[0], nbuckets, "__br_bucket", nulls_last=False
    )

    # phase 2: per-bucket counts -> prefix-sum offsets, computed on
    # the driver (one row per OCCUPIED bucket — KB-sized at any scale,
    # same sanctioned pattern as the IVF centroid collect). Recomputing
    # `tagged` for the counts job is safe: bucket ids are
    # value-deterministic, unlike sampled range boundaries.
    counts = (
        tagged.groupBy("__br_bucket")
        .agg(F.count(F.lit(1)).alias("__br_cnt"))
        .collect()
    )
    running = 0
    offsets: dict[int, int] = {}
    for row in sorted(counts, key=lambda r: r["__br_bucket"]):
        offsets[row["__br_bucket"]] = running
        running += row["__br_cnt"]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ),
        F.col("__br_bucket"),
    )

    # phase 3: rank within bucket over the FULL order (unique order ->
    # deterministic), one hash exchange on the bucket id; the bucket
    # offset splices in as a literal-map lookup — no join, no
    # singleton window in the data plan
    wlocal = Window.partitionBy("__br_bucket").orderBy(*keys)
    local = tagged.withColumn("__br_local", F.row_number().over(wlocal))
    rank = (offset_expr + F.col("__br_local") + F.lit(offset)).cast("long")
    return local.select(*df.columns, rank.alias(out_col))


def add_surrogate_key(
    df: DataFrame,
    key_name: str,
    natural_keys: list[str],
    offset: int = 0,
    mode: str = "deterministic",
    num_buckets: int | None = None,
) -> DataFrame:
    if mode == "fast":
        sk = F.monotonically_increasing_id() + F.lit(offset + 1)
        return df.select(sk.alias(key_name), "*")
    if mode != "deterministic":
        raise ValueError(f"unknown surrogate-key mode: {mode}")
    # the surrogate key IS the two-phase bucketed rank over the
    # natural key (see bucketed_rank for the plan shape)
    ranked = bucketed_rank(
        df, natural_keys, out_col="__sk", num_buckets=num_buckets, offset=offset
    )
    return ranked.select(F.col("__sk").alias(key_name), *df.columns)


def max_key(df: DataFrame, key_name: str) -> int:
    """Persisted-sequence lookup for incremental loads: max existing
    surrogate key (0 on empty), the offset for the next batch."""
    row = df.agg(F.max(key_name).alias("m")).collect()[0]
    return int(row["m"] or 0)
