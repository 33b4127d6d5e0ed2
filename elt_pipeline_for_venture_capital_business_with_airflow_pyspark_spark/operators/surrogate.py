"""Surrogate-key assignment (SURVEY.md §2.5 W1).

The reference delegates surrogate keys to Postgres BIGSERIAL on append
(reference: dataset/warehouse/init_dwh.sql:32, loaded via
dags/vcapital_warehouse/tasks/components/load.py:68-73). A sequence is
inherently single-writer; the distributed equivalents:

- ``deterministic`` (default): dense ``row_number()`` over the natural
  key — reproducible across runs, required wherever goldens/oracles
  compare key values. Cost: one global sort-shuffle of the (small) dim.
- ``fast``: ``monotonically_increasing_id() + offset`` — no shuffle,
  not reproducible; for append-heavy fact loads where the key only
  needs uniqueness.

``offset`` carries the max existing key so incremental loads keep
appending to the sequence instead of restarting at 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_surrogate_key(
    df: DataFrame,
    key_name: str,
    natural_keys: list[str],
    offset: int = 0,
    mode: str = "deterministic",
) -> DataFrame:
    if mode == "deterministic":
        w = Window.orderBy(*[F.col(c) for c in natural_keys])
        sk = F.row_number().over(w).cast("long") + F.lit(offset)
    elif mode == "fast":
        sk = F.monotonically_increasing_id() + F.lit(offset + 1)
    else:
        raise ValueError(f"unknown surrogate-key mode: {mode}")
    return df.select(sk.alias(key_name), "*")


def max_key(df: DataFrame, key_name: str) -> int:
    """Persisted-sequence lookup for incremental loads: max existing
    surrogate key (0 on empty), the offset for the next batch."""
    row = df.agg(F.max(key_name).alias("m")).collect()[0]
    return int(row["m"] or 0)
