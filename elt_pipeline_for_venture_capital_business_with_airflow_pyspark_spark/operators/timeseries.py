"""Time-series regularization: per-key date-spine gap fill + forward fill.

The reference materializes a dense date dimension
(`dataset/warehouse/init_dwh.sql` dim_date + `dags/.../dim_date`) but
never joins facts onto it to repair sparse series — a daily-metrics
table with missing days breaks every downstream rolling window and
retention query. ``gapfill_ffill`` closes that: it densifies each
key's series to one row per day between that key's first and last
observation, and carries the last observed value forward into the
inserted gap rows (the standard "as-of" repair for slowly-sampled
metrics).

Scale shape (100 TB posture):
- per-key bounds are one shuffle on the key;
- the spine is a map-side ``sequence`` explode off the 2-column
  bounds frame — rows produced ≈ sum of per-key day spans, never a
  cartesian with a global calendar;
- the spine→daily join and the forward-fill window share the same
  key partitioning, so the exchange is reused rather than repeated;
- forward fill is ``last(value, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, currentRow)`` — a running state
  of ONE value per key, no matter how long the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "gapfill_ffill",
    "interpolate_linear",
    "ohlc_resample",
    "ewma_last",
    "ewma_series",
    "rolling_zscore",
]


def gapfill_ffill(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Densify ``daily`` (one row per key per *observed* day) to one row
    per key per *calendar* day in the key's [min(day), max(day)] span,
    forward-filling each of ``value_cols`` into the inserted rows.

    Adds ``is_gap`` (true on inserted rows). Days before a key's first
    observation never exist (the spine starts at the key's own min), so
    every gap row has a value to inherit.
    """
    bounds = daily.groupBy(*key_cols).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias(day_col),
    )
    joined = spine.join(daily, [*key_cols, day_col], "left").withColumn(
        "is_gap", F.col(value_cols[0]).isNull()
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        joined = joined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return joined


def interpolate_linear(
    daily: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify like :func:`gapfill_ffill` but fill each gap by LINEAR
    interpolation between the surrounding observations instead of
    carrying the last value — the TimescaleDB ``interpolate()`` /
    pandas ``interpolate(method='linear')`` repair, correct for
    continuously-varying metrics where a step function misstates the
    gap (valuations, prices, sensor readings).

    For a gap row at day d between observations (d0, v0) and (d1, v1):
    ``v = v0 + (v1 - v0) * ((d - d0) / (d1 - d0))`` — day deltas are
    exact integers, so the only floats are one subtraction, one
    division and one fused-free multiply-add written in fixed
    left-assoc order, reproducible on any IEEE engine. Gap rows are
    flagged ``is_gap``; the spine spans each key's own [min, max] so
    every gap has both neighbors by construction.

    Scale shape: identical to ``gapfill_ffill`` — one shuffle on the
    key for bounds, a map-side spine explode, and the neighbor lookup
    is two window passes (``last ignorenulls`` forward, ``first
    ignorenulls`` backward) over the SAME key partitioning, each
    carrying constant per-key state. No self-join of the series to
    itself, which is the O(gap²) trap naive interpolation joins hit.
    """
    bounds = daily.groupBy(*key_cols).agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias(day_col),
    )
    joined = spine.join(daily, [*key_cols, day_col], "left").withColumn(
        "is_gap", F.col(value_col).isNull()
    )
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the "next observation" pass runs ordered DESCENDING with an
    # unbounded-PRECEDING frame — same values as currentRow→
    # unboundedFollowing, but Spark streams preceding frames in O(n)
    # while an UnboundedFollowingWindowFunctionFrame RECOMPUTES the
    # aggregate per row, O(n²) per partition: a single bad-date row
    # stretching a key's spine to 100k days turns that into 5·10⁹
    # updates (hours) — measured live on the extreme-values sweep.
    bwd = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(day_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_day = F.when(~F.col("is_gap"), F.col(day_col))
    prev_v = F.last(value_col, ignorenulls=True).over(fwd)
    prev_d = F.last(obs_day, ignorenulls=True).over(fwd)
    next_v = F.last(value_col, ignorenulls=True).over(bwd)
    next_d = F.last(obs_day, ignorenulls=True).over(bwd)
    frac = F.try_divide(
        F.datediff(F.col(day_col), prev_d).cast("double"),
        F.datediff(next_d, prev_d).cast("double"),
    )
    filled = F.when(~F.col("is_gap"), F.col(value_col)).otherwise(
        prev_v + (next_v - prev_v) * frac
    )
    return joined.withColumn(value_col, filled)


def ohlc_resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    id_col: str,
) -> DataFrame:
    """Downsample an irregular series to fixed time buckets with
    open/high/low/close + count + exact-decimal volume per
    (key, bucket) — the candlestick/rollup shape every metrics store
    exposes (the reference's warehouse keeps raw event grain only).

    Determinism: open/close are arg-min/arg-max by (ts, id) — the
    lexicographic MIN/MAX of a (ts, id, value) struct, so ties on the
    timestamp are broken by the unique id, never by partition order.
    Bucket boundaries floor-mod epoch micros (correct pre-1970).

    Scale shape: ONE hash aggregation on (key, bucket) with full
    map-side combine — no window, no sort, no self-join. The struct
    min/max carries a constant-size accumulator per group, so a year
    of nanosecond-grain ticks rolls up in a single exchange on keys
    that are already well-distributed.
    """
    us = F.unix_micros(F.col(ts_col))
    step = F.lit(int(bucket_seconds) * 1_000_000).cast("long")
    bucket_us = us - (((us % step) + step) % step)
    tagged = df.select(
        *key_cols,
        bucket_us.alias("__bucket_us"),
        F.struct(
            F.col(ts_col).alias("t"),
            F.col(id_col).alias("i"),
            F.col(value_col).alias("v"),
        ).alias("__tiv"),
        F.col(value_col).alias("__v"),
    )
    return (
        tagged.groupBy(*key_cols, "__bucket_us")
        .agg(
            F.min("__tiv").getField("v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max("__tiv").getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("__v").cast("decimal(20,4)"))
            .cast("double")
            .alias("volume"),
        )
        .select(
            *key_cols,
            F.timestamp_micros(F.col("__bucket_us")).alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n_points",
            "volume",
        )
    )


def _sorted_vals(ts_col: str, id_col: str, value_col: str) -> F.Column:
    """values of a group as an array in strict (ts, id) order — the
    deterministic fold order shared with the DuckDB oracle's
    ``list(value ORDER BY ts, id)``."""
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(value_col).alias("v"),
            )
        )
    )
    return F.transform(arr, lambda s: s["v"])


def ewma_last(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    id_col: str,
) -> DataFrame:
    """Per-key exponentially weighted moving average, final value:
    y_1 = x_1; y_t = (1-alpha)*y_{t-1} + alpha*x_t folded in strict
    (ts, id) order. The recurrence is inherently sequential per key,
    so the engine collects each key's series into an in-memory array
    and left-folds it with ``F.aggregate`` — IEEE-identical to the
    DuckDB oracle's ``list_reduce`` over the same ordered list (same
    fold order, same fma-free a*(1-alpha)+alpha*x expression), hence
    hash-parity.

    Scale shape: one shuffle on the key; per-key state is that key's
    series (the same bound every sequential-smoothing implementation
    has — pandas ewm, Flink keyed state). For series too long to
    collect, chunk by time range and chain the fold: y over a chunk
    is ``y_end = w*y_0_prior + (fold of chunk with zero init)`` with
    w = (1-alpha)^len — the fold is linear in its init, so chunks
    compose associatively; this function is the single-chunk core.
    """
    a = float(alpha)
    vals = _sorted_vals(ts_col, id_col, value_col).alias("__vals")
    out = (
        df.groupBy(*key_cols)
        .agg(vals)
        .select(
            *key_cols,
            F.size("__vals").alias("n_points"),
            F.aggregate(
                F.slice(F.col("__vals"), 2, F.greatest(F.size("__vals") - 1, F.lit(0))),
                F.element_at("__vals", 1),
                lambda acc, x: acc * F.lit(1.0 - a) + F.lit(a) * x,
            ).alias("ewma"),
        )
    )
    return out


def ewma_series(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    id_col: str,
) -> DataFrame:
    """Per-row running EWMA (same recurrence and fold order as
    :func:`ewma_last`), returned at original row grain as
    (keys, ts, id, value, ewma). The running prefix is materialized
    by an array-accumulator fold, then re-exploded and joined back to
    row order positionally (arrays_zip), so no second shuffle."""
    a = float(alpha)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(value_col).alias("v"),
            )
        )
    ).alias("__tiv")
    grouped = df.groupBy(*key_cols).agg(arr)
    vals = F.transform(F.col("__tiv"), lambda s: s["v"])
    prefix = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.array(F.element_at(vals, 1)),
        lambda acc, x: F.concat(
            acc,
            F.array(F.element_at(acc, -1) * F.lit(1.0 - a) + F.lit(a) * x),
        ),
    )
    z = grouped.select(
        *key_cols,
        F.explode(F.arrays_zip(F.col("__tiv"), prefix.alias("__e"))).alias("__z"),
    )
    return z.select(
        *key_cols,
        F.col("__z")["__tiv"]["t"].alias(ts_col),
        F.col("__z")["__tiv"]["i"].alias(id_col),
        F.col("__z")["__tiv"]["v"].alias(value_col),
        F.col("__z")["__e"].alias("ewma"),
    )


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    lookback: int = 20,
    min_points: int = 8,
) -> DataFrame:
    """Per-row z-score of ``value_col`` against the trailing
    ``lookback`` observations of the same key (current row EXCLUDED,
    so an anomaly never dilutes its own baseline) — the streaming-
    detector shape behind every metrics-alerting pipeline, which the
    reference's warehouse (raw event grain only) cannot answer.
    Complements the GLOBAL per-group outlier ops (``dq_outlier_iqr`` /
    ``dq_outlier_mad``): those flag against a whole distribution, this
    flags against each point's own recent history, catching level
    shifts the global view averages away.

    Cross-engine determinism: the trailing mean/variance come from
    window SUMs of the value cast once to DECIMAL(19,4) (the repo's
    exact-sum idiom) and of its exact decimal square — both engines
    accumulate integers, so frame aggregation order (Spark's sliding
    accumulate vs DuckDB's segment tree) cannot perturb a bit. The
    float finish is fixed-order: mean = s1/n, then the textbook
    ``var = (s2 - s1*mean) / (n-1)``, sd = sqrt(max(var, 0)) — sqrt
    is IEEE-correctly-rounded (unlike log/exp), so the z itself
    hash-matches across engines. Sum magnitudes stay far below 2^53
    in scaled units, so the decimal→double casts are exact.

    Scale shape: ONE shuffle on the key, one sort per partition, and
    the frame carries constant state (two decimal accumulators), so a
    year of events per key streams through in a single window pass —
    no self-join, no per-row re-aggregation.
    """
    xd = F.col("__xd")
    xq = xd.cast("decimal(15,4)")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, id_col)
        .rowsBetween(-int(lookback), -1)
    )
    n = F.count(xd).over(w)
    s1 = F.sum(xd).over(w).cast("double")
    # (15,4)² → decimal(31,8): exact in Spark (a (19,4)² would breach
    # precision 38 and silently round scale 8 → 7, which DuckDB's
    # int128 multiply does NOT do — the one-ulp trap this dodges).
    s2 = F.sum(xq * xq).over(w).cast("double")
    base = df.select(
        *key_cols,
        F.col(ts_col),
        F.col(id_col),
        F.col(value_col),
        F.col(value_col).cast("decimal(19,4)").alias("__xd"),
    )
    scored = base.select(
        *key_cols,
        ts_col,
        id_col,
        value_col,
        xd.cast("double").alias("__x"),
        n.alias("n_baseline"),
        s1.alias("__s1"),
        s2.alias("__s2"),
    )
    mean = F.col("__s1") / F.col("n_baseline")
    var = (F.col("__s2") - F.col("__s1") * mean) / (F.col("n_baseline") - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        scored.filter(F.col("n_baseline") >= int(min_points))
        .withColumn("z", F.try_divide(F.col("__x") - mean, sd))
        .drop("__x", "__s1", "__s2")
    )
