"""Deterministic corpus-shaping operators: per-group caps and
weighted mixture expansion.

Training-data pipelines don't sample with ``rand()`` — a rerun must
produce byte-identical splits (the reference's determinism posture is
the same: its daily slices are pure functions of ``ds``,
`dags/vcapital_staging/tasks/components/extract.py:41-43`). Both
operators here order/repeat rows by *content hashes*, so every
executor, retry, and engine agrees on the result.

- ``cap_per_group`` — domain balancing: keep at most *k* rows per
  group, chosen by md5-hash order (a deterministic uniform shuffle).
  This is the standard guard against a single crawl domain dominating
  a pretraining mix. One shuffle (the window partition); at 100 TB the
  per-group state is a single counter, and heavily-capped groups can
  be pre-thinned map-side with a cheap hash-prefix filter.
- ``weighted_mix`` — epoch weighting: replicate each row
  ``weight(group)`` times with an epoch index (the "3 epochs of
  Wikipedia, 1 of CommonCrawl" recipe). Weights ride a broadcast join;
  expansion is a zero-shuffle generator explode, so the plan stays
  map-side and streams straight into a sink or pack stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cap_per_group", "weighted_mix"]


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    k: int,
    *,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep at most *k* rows per group in deterministic md5-hash order.

    The hash of the id column is a stable stand-in for a random draw:
    uniform, engine-independent, and reproducible. The id itself is the
    final tiebreak so equal hashes (never in practice) stay total-ordered.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def weighted_mix(
    df: DataFrame,
    spark: SparkSession,
    group_col: str,
    weights: dict[str, int],
    *,
    default_weight: int = 1,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Replicate rows per-group ``weights[group]`` times (default
    *default_weight*), tagging each copy with a 1-based epoch index.

    The weight table is a broadcast join (KB-sized dim); the
    replication is ``explode(sequence(1, w))`` — pure map-side row
    generation, no shuffle, so the expanded mix never materializes
    more than one batch at a time.
    """
    wdf = spark.createDataFrame(
        [(g, int(w)) for g, w in sorted(weights.items())],
        schema=f"{group_col} string, _mix_weight int",
    )
    joined = df.join(F.broadcast(wdf), group_col, "left")
    w = F.coalesce(F.col("_mix_weight"), F.lit(default_weight))
    return (
        joined.withColumn(epoch_col, F.explode(F.sequence(F.lit(1), w)))
        .drop("_mix_weight")
    )
