"""Surrogate-key assignment (SURVEY.md §2.5 W1).

The reference delegates surrogate keys to Postgres BIGSERIAL on append
(reference: dataset/warehouse/init_dwh.sql:32, loaded via
dags/vcapital_warehouse/tasks/components/load.py:68-73). A sequence is
inherently single-writer; the distributed equivalents:

- ``deterministic`` (default): dense rank over the natural key —
  reproducible across runs, required wherever goldens/oracles compare
  key values. Implemented as a TWO-PHASE partitioned rank (no global
  single-reducer sort): range-partition + sort within partitions, take
  the per-partition row position from ``monotonically_increasing_id()``
  (which encodes ``partition_id * 2^33 + local_row`` — free once the
  partition is sorted), then add broadcast prefix-sum offsets computed
  from the per-partition counts. The only single-partition work is the
  running sum over ONE ROW PER PARTITION (KB-sized at any scale); the
  data itself never funnels through one reducer.
- ``fast``: ``monotonically_increasing_id() + offset`` — no shuffle,
  not reproducible; for append-heavy fact loads where the key only
  needs uniqueness.

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

# monotonically_increasing_id() = partition_id * 2^33 + row_in_partition
_MID_PARTITION_SHIFT = 33
_MID_LOCAL_MASK = (1 << _MID_PARTITION_SHIFT) - 1


def add_surrogate_key(
    df: DataFrame,
    key_name: str,
    natural_keys: list[str],
    offset: int = 0,
    mode: str = "deterministic",
    num_partitions: int | None = None,
) -> DataFrame:
    if mode == "fast":
        sk = F.monotonically_increasing_id() + F.lit(offset + 1)
        return df.select(sk.alias(key_name), "*")
    if mode != "deterministic":
        raise ValueError(f"unknown surrogate-key mode: {mode}")

    keys = [F.col(c) for c in natural_keys]
    if num_partitions is None:
        nparts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    else:
        nparts = num_partitions

    # phase 1: order-preserving partitioning — partition i holds keys
    # strictly below partition i+1's range; each partition sorts locally
    base = df.repartitionByRange(nparts, *keys).sortWithinPartitions(*keys)
    tagged = base.select(
        F.monotonically_increasing_id().alias("__sk_mid"), "*"
    ).select(
        F.shiftrightunsigned(F.col("__sk_mid"), _MID_PARTITION_SHIFT).alias("__sk_pid"),
        (F.col("__sk_mid") % F.lit(_MID_LOCAL_MASK + 1)).alias("__sk_local"),
        *df.columns,
    )

    # phase 2: prefix-sum offsets over per-partition counts — one row
    # per partition, so the unpartitioned running-sum window is over a
    # KB-sized frame regardless of data volume
    counts = tagged.groupBy("__sk_pid").agg(F.count(F.lit(1)).alias("__sk_cnt"))
    w = Window.orderBy("__sk_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__sk_pid",
        F.coalesce(F.sum("__sk_cnt").over(w), F.lit(0)).alias("__sk_off"),
    )

    joined = tagged.join(F.broadcast(offsets), "__sk_pid")
    sk = (F.col("__sk_off") + F.col("__sk_local") + 1 + F.lit(offset)).cast("long")
    return joined.select(sk.alias(key_name), *df.columns)


def max_key(df: DataFrame, key_name: str) -> int:
    """Persisted-sequence lookup for incremental loads: max existing
    surrogate key (0 on empty), the offset for the next batch."""
    row = df.agg(F.max(key_name).alias("m")).collect()[0]
    return int(row["m"] or 0)
