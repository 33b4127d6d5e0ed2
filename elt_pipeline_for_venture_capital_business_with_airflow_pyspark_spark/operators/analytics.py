"""Event-analytics operators: ordered funnels and cohort retention.

The reference's fact tables stop at star-schema grain
(`dataset/warehouse/init_dwh.sql:75-114`) — it never answers the two
questions every event warehouse exists for: "how many users make it
through step 1 → 2 → 3 within the conversion window?" and "of the
users acquired in week W, how many are still active k weeks later?".
Both are built here from shuffle-economical primitives only.

- ``funnel`` — strictly-ordered, time-bounded funnel. Each stage is a
  per-user ``min(ts)`` aggregation; stage *i+1* joins the stage-*i*
  timestamps and keeps events inside ``(t_i, t_i + window]``. That is
  one shuffle per stage on the user key — and because every stage
  reuses the same key, the exchange is reused across stages (AQE
  keeps the partitioning). No window functions, no event×event
  self-join, no row amplification: state per user is ONE timestamp,
  so the plan survives arbitrarily long event histories.
- ``retention_cohort`` — classic triangle: cohort = first activity
  day (bucketed to weeks from a fixed origin so the bucket boundary
  is engine-independent), offset = whole weeks since cohort day,
  cell = distinct active users. Two shuffles total (first-touch agg,
  then cohort-cell agg on pre-deduped user-week rows).

Determinism: stage boundaries use strict ``>`` on microsecond
timestamps and all outputs are counts — no per-row ordering leaks
into the result.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel",
    "retention_cohort",
    "transition_matrix",
    "basket_pairs",
    "user_lifetime_features",
    "rfm_scores",
    "weighted_median",
]


def funnel(
    events: DataFrame,
    steps: list[tuple[str, str | None]],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel over ``(step_name, max_gap)`` stages.

    ``steps`` is a list of ``(event_type, max_gap)`` where ``max_gap``
    is an SQL interval literal body (e.g. ``"1 HOUR"``) bounding how
    long after the previous stage the event may occur, or ``None`` for
    unbounded. Returns one row per stage:
    ``(step_idx, step, n_users)`` with n_users monotonically
    non-increasing.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")

    first_type, _ = steps[0]
    stage = (
        events.filter(F.col(type_col) == first_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    counts = [
        stage.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step_idx"), F.lit(first_type).alias("step"), "n_users"
        )
    ]
    for idx, (etype, gap) in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == etype).join(
            stage.select(user_col, "_t"), user_col, "inner"
        )
        cond = F.col(ts_col) > F.col("_t")
        if gap is not None:
            cond = cond & (F.col(ts_col) <= F.col("_t") + F.expr(f"INTERVAL {gap}"))
        stage = (
            nxt.filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        counts.append(
            stage.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(idx).alias("step_idx"), F.lit(etype).alias("step"), "n_users"
            )
        )
    return reduce(DataFrame.unionByName, counts)


def transition_matrix(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over each user's ordered
    event stream: ``(from_type, to_type, n)`` for consecutive event
    pairs. The behavioral fingerprint behind next-action models and
    anomaly detection (a sudden new hot transition = instrumentation
    change or abuse).

    One shuffle (the per-user window); ``lead`` keeps O(1) state per
    row. The ordering carries a unique tiebreak so ties on the
    timestamp are deterministic — never rely on input order.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc_nulls_last(), F.col(tiebreak_col)
    )
    nxt = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    )
    return (
        nxt.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def retention_cohort(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    origin: str = "2024-01-01",
) -> DataFrame:
    """Weekly cohort-retention triangle.

    Cohort = week index (from *origin*) of a user's first active day;
    offset = whole weeks between the active day and the cohort day.
    Returns ``(cohort_week, week_offset, n_users)`` where offset 0 is
    the acquisition week itself. Week buckets are day-arithmetic from
    a fixed origin — never ``date_trunc('week')``, whose week-start
    convention is an engine/locale property.
    """
    days = events.select(
        F.col(user_col), F.to_date(ts_col).alias("_day")
    ).distinct()
    first = days.groupBy(user_col).agg(F.min("_day").alias("_cohort_day"))
    cells = (
        days.join(first, user_col, "inner")
        .select(
            F.floor(
                F.datediff(F.col("_cohort_day"), F.lit(origin).cast("date")) / 7
            ).alias("cohort_week"),
            F.floor(F.datediff(F.col("_day"), F.col("_cohort_day")) / 7).alias(
                "week_offset"
            ),
            F.col(user_col),
        )
        .distinct()
    )
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def basket_pairs(
    items: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    top_n: int = 20,
) -> DataFrame:
    """Market-basket pair co-occurrence: for every basket, each
    unordered pair of distinct items it contains; returns the ``top_n``
    pairs by basket count (ties broken lexically so the cut is total).

    The self-join is blocked on the basket key, so cost is
    sum(k_b choose 2) over baskets — linear in data for bounded basket
    sizes (TPC-H orders hold ≤7 line items), never an all-pairs
    cartesian. One shuffle to dedup basket×item, and the pair join
    reuses that same hash partitioning on the basket key.
    """
    bi = items.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    left = bi.select("_b", F.col("_i").alias("item_a"))
    right = bi.select("_b", F.col("_i").alias("item_b"))
    pairs = left.join(right, "_b").filter(F.col("item_a") < F.col("item_b"))
    counted = pairs.groupBy("item_a", "item_b").agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    return counted.orderBy(
        F.desc("n_baskets"), F.asc("item_a"), F.asc("item_b")
    ).limit(top_n)


def user_lifetime_features(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    session_gap_minutes: int = 30,
    value_type: str = "purchase",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-user lifetime feature vector — the standard ML feature-
    extraction pass over an event log: activity volume, span, session
    count (gap rule), and monetary aggregates for one event type.

    One lag window + one aggregation, both partitioned on the user key
    (single shuffle, exchange reused). Timestamps are emitted as unix
    microseconds and money through exact decimal accumulation so the
    vector is engine-deterministic end to end.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc_nulls_last())
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(ts_col).over(w)
    )
    with_gap = events.withColumn(
        "_new_session",
        F.when(
            gap_us.isNull() | (gap_us > session_gap_minutes * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    is_val = F.col(type_col) == value_type
    return with_gap.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(F.to_date(ts_col)).alias("n_active_days"),
        F.unix_micros(F.min(ts_col)).alias("first_ts_us"),
        F.unix_micros(F.max(ts_col)).alias("last_ts_us"),
        F.sum("_new_session").alias("n_sessions"),
        F.sum(is_val.cast("long")).alias(f"n_{value_type}"),
        F.coalesce(
            F.sum(
                F.when(is_val, F.col(value_col).cast("decimal(20,4)"))
            ).cast("double"),
            F.lit(0.0),
        ).alias(f"{value_type}_value"),
    )


def rfm_scores(
    orders: DataFrame,
    ref_date: str,
    *,
    customer_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary), the classic
    customer-value scoring: per customer, days since last order, order
    count, and exact-decimal total spend, each scored 1-5 against the
    CORPUS quintile boundaries.

    Scale shape: one per-customer aggregation (single shuffle), then
    the five quintile cut points per metric are ONE ROW of exact
    percentiles broadcast back — no global ntile sort over customers
    (an unpartitioned ranking window would single-reduce at 100 TB;
    comparing against broadcast cut points is embarrassingly
    parallel). Scores are CASE-sum comparisons against 4-dp-rounded
    boundaries, so the 1-5 assignment is engine-exact. Higher = better
    (recency inverts: most-recent buyers score 5).
    """
    per = orders.groupBy(customer_col).agg(
        F.datediff(
            F.lit(ref_date).cast("date"), F.max(F.col(date_col).cast("date"))
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(amount_col).cast("decimal(20,4)"))
        .cast("double")
        .alias("monetary"),
    )

    def cuts(col: str) -> list:
        return [
            F.round(F.percentile(F.col(col), F.lit(q)), 4).alias(f"{col}_q{i}")
            for i, q in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
        ]

    bounds = per.agg(*cuts("recency_days"), *cuts("frequency"), *cuts("monetary"))

    def score(col: str) -> F.Column:
        s = F.lit(1)
        for i in (1, 2, 3, 4):
            s = s + (F.col(col) > F.col(f"{col}_q{i}")).cast("int")
        return s

    scored = per.crossJoin(F.broadcast(bounds))
    r = (F.lit(6) - score("recency_days")).alias("r_score")
    f_ = score("frequency").alias("f_score")
    m = score("monetary").alias("m_score")
    return scored.select(
        customer_col,
        "recency_days",
        "frequency",
        "monetary",
        r,
        f_,
        m,
        (
            (F.lit(6) - score("recency_days")) * 100
            + score("frequency") * 10
            + score("monetary")
        ).alias("rfm_cell"),
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    weight_decimals: str = "decimal(20,4)",
    validate: bool = True,
) -> DataFrame:
    """Lower weighted median per group: the smallest value whose
    cumulative weight reaches half the total group weight
    (``2·cumw ≥ totw``).

    The unweighted median treats every row equally; warehouse asks are
    usually weighted ("median price *per unit sold*"). The classic
    formulation sorts each group and scans the cumulative weight — but
    a per-group window over the raw fact funnels ALL rows through one
    task per group (3 return flags → parallelism 3, the same
    single-reducer class as a global sort). Instead the fact is first
    reduced to the VALUE DOMAIN — ``groupBy(group, value)`` weight
    sums, a fully parallel shuffle with map-side combine — and the
    window cumsum runs over distinct values only. At warehouse scale
    rows grow without bound while distinct values grow sub-linearly
    (prices, quantities, scores are bounded domains), so per-group
    window state is ∝ |value domain|, never ∝ |rows|.

    Determinism: weights accumulate in exact decimal (``2·cumw ≥
    totw`` is then an exact comparison — float cumsums would make the
    qualifying row partition-order-dependent), and the value-domain
    reduction collapses equal values BEFORE the scan, so the window
    order is strictly increasing — no tie blocks exist to depend on.
    Rows with NULL value or NULL weight are excluded (SQL aggregate
    convention); groups with no surviving rows disappear.

    Precondition: weights must be non-negative — a negative weight
    makes the cumulative sum non-monotonic, so the ``2·cumw ≥ totw``
    scan can fire early and silently return the wrong value. With
    ``validate=True`` the precondition is ENFORCED at execution time:
    any negative weight on a row that survives the NULL filter fails
    the job (``WEIGHTED_MEDIAN_NEGATIVE_WEIGHT``) — a per-row
    comparison fused into the existing projection, no extra stage or
    exchange, though ``raise_error`` can inhibit codegen fusion in
    some plan shapes. Note the check runs AFTER the NULL filter:
    a negative weight paired with a NULL ``value_col`` is excluded by
    the filter before it can be checked — such rows cannot affect the
    result, so this is a completeness caveat of the diagnostic, not a
    correctness hole. Default ``validate=True`` — fail loudly rather
    than return a silently wrong median; callers that have PROVEN
    their weights non-negative (a constraint, a prior gate, a
    generated column) may opt out with ``validate=False`` for the
    codegen-fusion win.

    Returns ``(group_cols…, wmedian, total_weight, n_rows)``.
    """
    w_cast = F.col(weight_col).cast(weight_decimals)
    if validate:
        w_checked = F.when(
            F.col(weight_col) < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        "WEIGHTED_MEDIAN_NEGATIVE_WEIGHT: "
                        f"negative {weight_col} value "
                    ),
                    F.col(weight_col).cast("string"),
                )
            ).cast(weight_decimals),
        ).otherwise(w_cast)
    else:
        w_checked = w_cast
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    ).select(
        *group_cols,
        F.col(value_col).alias("__v"),
        w_checked.alias("__w"),
    )
    # fully parallel reduction to the value domain (map-side combine)
    per_value = base.groupBy(*group_cols, "__v").agg(
        F.sum("__w").alias("__w"), F.count(F.lit(1)).alias("__c")
    )
    w_order = Window.partitionBy(*group_cols).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(*group_cols)
    scanned = per_value.select(
        *group_cols,
        "__v",
        F.sum("__w").over(w_order).alias("__cumw"),
        F.sum("__w").over(w_all).alias("__totw"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    return (
        scanned.filter(F.lit(2) * F.col("__cumw") >= F.col("__totw"))
        .groupBy(*group_cols)
        .agg(
            F.min("__v").alias("wmedian"),
            F.max(F.col("__totw").cast("double")).alias("total_weight"),
            F.max("__n").alias("n_rows"),
        )
    )
