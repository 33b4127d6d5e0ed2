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

__all__ = ["gapfill_ffill"]


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
