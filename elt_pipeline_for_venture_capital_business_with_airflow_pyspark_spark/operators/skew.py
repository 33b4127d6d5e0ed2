"""Skew-mitigation operators (100 TB posture, SURVEY.md §7.2).

The reference never handles skew (its dims are tiny and its facts are
single-node Postgres). At 100 TB a hot grouping/join key turns one
shuffle partition into the whole job's critical path. Two standard
remedies, both expression-only and deterministic:

- **Salted two-stage aggregation**: groupBy(key, salt) partial agg →
  groupBy(key) final combine. Any algebraic aggregate (sum/count/min/
  max) decomposes this way; the hot key's rows spread over ``salts``
  partitions in stage 1 and the stage-2 input is only
  |distinct keys| × salts rows.
- **Salted join**: the big side gets a deterministic salt derived from
  non-key columns; the small side is replicated once per salt value
  (explode of a literal sequence) and the join key becomes
  (key, salt). Result is row-identical to the unsalted join.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on in
session.py) covers sort-merge joins at runtime; these helpers cover
aggregations and the cases where the planner must be forced (e.g. a
single key holding >50% of rows, which AQE splits less evenly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_sum_count", "salted_join", "skew_diagnose", "plan_join"]


def _salt_col(df: DataFrame, salts: int, exclude: list[str]) -> Column:
    """Deterministic per-row salt in [0, salts): hash of all non-key
    columns (never rand() — reruns/retries must produce identical
    partitioning or shuffle-stage retries double-count)."""
    cols = [c for c in df.columns if c not in exclude] or [F.lit(1)]
    return F.pmod(F.xxhash64(*cols), F.lit(salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, Column],
    salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation: per-(key, salt) partial sums +
    counts, then per-key final combine. ``sum_cols`` maps output name →
    summable column expression (use decimal casts for cross-engine
    determinism). Output: group_cols + sums + ``n_rows``.
    """
    salt = _salt_col(df, salts, group_cols)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(
            *[F.sum(expr).alias(f"__s_{name}") for name, expr in sum_cols.items()],
            F.count(F.lit(1)).alias("__n"),
        )
    )
    return partial.groupBy(*group_cols).agg(
        *[F.sum(f"__s_{name}").alias(name) for name in sum_cols],
        F.sum("__n").alias("n_rows"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side deterministically,
    replicate the small side ``salts``× (explode of a literal range —
    small side is dimension-sized by assumption), join on
    (key, salt). Row-identical to ``big.join(small, key)``.
    """
    salted_big = big.withColumn("__salt", _salt_col(big, salts, [big_key]))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    cond = (salted_big[big_key] == salted_small[small_key]) & (
        salted_big["__salt"] == salted_small["__salt"]
    )
    return salted_big.join(salted_small, cond, how).drop("__salt")


def skew_diagnose(
    df: DataFrame,
    key_col: str,
    *,
    top_n: int = 10,
    target_rows_per_task: int = 10_000,
) -> DataFrame:
    """Join/agg-key skew diagnostic — the measurement that decides
    whether :func:`salted_join` / AQE skew handling is needed BEFORE a
    100-TB shuffle finds out the hard way. One count aggregation +
    KB-scale top-k; emits the ``top_n`` heaviest keys with:

    - ``n_rows``, ``share_ppm`` (parts-per-million of total: exact
      integer products, ONE deterministic division, explicit floor —
      floor, not a bigint cast, because cast-of-double rounds on some
      engines and truncates on others),
    - ``skew_ratio_x1000`` — key size vs the MEAN key size ×1000,
      the number AQE's skewedPartitionFactor thresholds against,
    - ``rec_salts`` — ceil(n_rows / target_rows_per_task), the salt
      fan-out :func:`salted_join` would need so no single (key, salt)
      partition exceeds the target.

    All columns are exact integers (oracle hash-parity with no
    epsilon); the top-k ships as a TakeOrderedAndProject."""
    if top_n < 1 or target_rows_per_task < 1:
        raise ValueError("top_n and target_rows_per_task must be >= 1")
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    return (
        counts.orderBy(F.col("n_rows").desc(), key_col)
        .limit(top_n)
        .crossJoin(F.broadcast(totals))
        .select(
            key_col,
            "n_rows",
            F.floor(
                F.col("n_rows") * F.lit(1_000_000) / F.col("__total")
            ).alias("share_ppm"),
            F.floor(
                F.col("n_rows") * F.col("__n_keys") * F.lit(1000)
                / F.col("__total")
            ).alias("skew_ratio_x1000"),
            F.ceil(
                F.col("n_rows") / F.lit(int(target_rows_per_task))
            ).cast("bigint").alias("rec_salts"),
        )
    )


def plan_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    *,
    broadcast_threshold_rows: int = 100_000,
    skew_ratio_threshold_x1000: int = 5_000,
    target_rows_per_task: int = 10_000,
    k: int = 256,
) -> dict:
    """Join-strategy ADVISOR: turn the two diagnostics this module and
    ``sketches`` already own into the decision they exist for —
    broadcast / shuffle / salted-shuffle, WITH the evidence row, all
    from KB-scale statistics gathered before paying for the join:

    1. ``small.count()`` — one metadata-cheap aggregate — against
       ``broadcast_threshold_rows`` (the row-count analogue of
       ``spark.sql.autoBroadcastJoinThreshold``): a broadcastable
       small side ends the analysis, because a broadcast join never
       shuffles the big side and skew is irrelevant to a map-side
       join.
    2. :func:`skew_diagnose` top-1 on the big side's key:
       ``skew_ratio_x1000`` ≥ threshold (default 5× the mean key —
       AQE's skewedPartitionFactor spirit) AND a hot key bigger than
       one task's target ⇒ the shuffle needs :func:`salted_join`,
       with the diagnostic's own ``rec_salts`` as the fan-out.
    3. :func:`sketches.join_cardinality_estimate` over correlated
       bottom-``k`` samples of both key columns — the estimated
       output size rides along in the evidence (always one row, even
       for disjoint keys), so the caller also sees whether the join
       EXPLODES before running it.

    Returns ``{strategy, rec_salts, evidence}`` where evidence holds
    every measured number (small_rows, top key/rows/ratio, est_join,
    tau/p). Driver cost: three bounded jobs (1-row count, top-1
    diagnose, 1-row estimate). The recommendation matches what Spark
    itself would execute in the clear regimes (pinned in
    tests/test_join_advisor.py): a small side under the threshold
    plans as BroadcastHashJoin, a large one as a shuffle join, and a
    hot-key shuffle is exactly what ``salted_join`` row-identically
    repairs."""
    from . import sketches as SK

    small_rows = small.count()
    diag = skew_diagnose(
        big, big_key, top_n=1, target_rows_per_task=target_rows_per_task
    ).collect()
    top = diag[0] if diag else None
    est = SK.join_cardinality_estimate(
        SK.freq_sample(big.select(big_key), big_key, k=k),
        SK.freq_sample(small.select(small_key), small_key, k=k),
        big_key,
        small_key,
        k=k,
    ).collect()[0]

    if small_rows <= broadcast_threshold_rows:
        strategy, rec_salts = "broadcast", 0
    elif (
        top is not None
        and top["skew_ratio_x1000"] >= skew_ratio_threshold_x1000
        and top["n_rows"] > target_rows_per_task
    ):
        strategy, rec_salts = "salted-shuffle", int(top["rec_salts"])
    else:
        strategy, rec_salts = "shuffle", 0

    return {
        "strategy": strategy,
        "rec_salts": rec_salts,
        "evidence": {
            "small_rows": small_rows,
            "broadcast_threshold_rows": broadcast_threshold_rows,
            "top_key": top[big_key] if top is not None else None,
            "top_key_rows": int(top["n_rows"]) if top is not None else 0,
            "skew_ratio_x1000": (
                int(top["skew_ratio_x1000"]) if top is not None else 0
            ),
            "est_join_rows": float(est["est_join"]),
            "sample_tau": int(est["tau"]),
            "sample_p": float(est["p"]),
        },
    }
