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

__all__ = ["gapfill_ffill", "ohlc_resample", "ewma_last", "ewma_series"]


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
