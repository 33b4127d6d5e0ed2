"""Hypertable-style multi-resolution time rollups (continuous
aggregates).

The reference's only time-grain handling is the daily batch slice
(`dags/vcapital_staging/tasks/components/extract.py:41-43`); it has no
aggregate hierarchy. At 100 TB, dashboards need the same measures at
1 h / 6 h / 1 d grains, and computing each grain from raw rows scans
the fact table once *per grain*. The continuous-aggregate pattern
(TimescaleDB hypertables, Druid rollup segments) instead computes the
finest grain once and **re-aggregates each coarser grain from the
next finer one** — possible for any algebraic measure (sum→sum,
count→sum, min→min, max→max). Scan cost: one pass over raw + tiny
passes over partials; each level is also the natural incremental
refresh unit (recompute only buckets touched by new data).

Buckets are exact long arithmetic on epoch microseconds
(``us - us % width``) — never float division, which drifts at 1e15
scale — so bucket edges are bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["time_bucket_us", "rollup_hierarchy", "refresh_merge"]


def time_bucket_us(ts_col: str | Column, width_seconds: int) -> Column:
    """Start of the ``width_seconds`` bucket containing ``ts_col``, as
    epoch microseconds (exact long arithmetic)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    us = F.unix_micros(col)
    w = F.lit(width_seconds * 1_000_000)
    return (us - F.pmod(us, w)).alias("bucket_us")


def rollup_hierarchy(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    widths_seconds: list[int],
    sums: dict[str, Column],
    mins: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
) -> dict[int, DataFrame]:
    """Continuous-aggregate hierarchy: one DataFrame per grain in
    ``widths_seconds`` (ascending; each width must be an integer
    multiple of the previous so buckets nest). The finest grain
    aggregates the raw rows; every coarser grain aggregates the
    previous grain's partials — raw data is scanned exactly once.

    Measures: ``sums`` maps output name → summable raw expression
    (cast to decimal for cross-engine determinism), ``mins``/``maxs``
    likewise; a row count ``n_rows`` is always included. Output per
    level: key_cols + ``bucket_us`` + measures.
    """
    mins, maxs = mins or {}, maxs or {}
    for prev, cur in zip(widths_seconds, widths_seconds[1:]):
        if cur % prev != 0:
            raise ValueError(f"widths must nest: {cur} not a multiple of {prev}")

    finest = widths_seconds[0]
    level = df.groupBy(
        time_bucket_us(ts_col, finest), *key_cols
    ).agg(
        *[F.sum(e).alias(n) for n, e in sums.items()],
        *[F.min(e).alias(n) for n, e in mins.items()],
        *[F.max(e).alias(n) for n, e in maxs.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )
    out = {finest: level}
    for w in widths_seconds[1:]:
        wus = F.lit(w * 1_000_000)
        rebucket = (F.col("bucket_us") - F.pmod(F.col("bucket_us"), wus)).alias(
            "bucket_us"
        )
        level = level.groupBy(rebucket, *key_cols).agg(
            *[F.sum(n).alias(n) for n in sums],
            *[F.min(n).alias(n) for n in mins],
            *[F.max(n).alias(n) for n in maxs],
            F.sum("n_rows").alias("n_rows"),
        )
        out[w] = level
    return out


def refresh_merge(
    existing: DataFrame,
    new_raw: DataFrame,
    ts_col: str,
    key_cols: list[str],
    width_seconds: int,
    sums: dict[str, Column],
    mins: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
) -> DataFrame:
    """Incremental continuous-aggregate refresh: fold a new raw slice
    into an existing grain WITHOUT rescanning history — aggregate only
    the delta, then algebraically merge per bucket (sum+sum, min▽min,
    max△max, count+count). This is the daily-refresh path: cost is
    O(|delta| + |touched buckets|), independent of table history, and
    the result is row-identical to a full recompute over old ∪ new
    (asserted in tests). Measures must be algebraic — avg/percentiles
    belong downstream, derived from (sum, n_rows).
    """
    mins, maxs = mins or {}, maxs or {}
    delta = new_raw.groupBy(time_bucket_us(ts_col, width_seconds), *key_cols).agg(
        *[F.sum(e).alias(n) for n, e in sums.items()],
        *[F.min(e).alias(n) for n, e in mins.items()],
        *[F.max(e).alias(n) for n, e in maxs.items()],
        F.count(F.lit(1)).alias("n_rows"),
    )
    cols = ["bucket_us", *key_cols, *sums, *mins, *maxs, "n_rows"]
    return (
        existing.select(cols)
        .unionByName(delta.select(cols))
        .groupBy("bucket_us", *key_cols)
        .agg(
            *[F.sum(n).alias(n) for n in sums],
            *[F.min(n).alias(n) for n in mins],
            *[F.max(n).alias(n) for n in maxs],
            F.sum("n_rows").alias("n_rows"),
        )
    )
