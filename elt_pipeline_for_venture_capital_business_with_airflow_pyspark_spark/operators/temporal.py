"""Temporal join / history operators: as-of join, range (interval)
join, SCD Type-2 collapse.

The reference has none of these — all its joins are equi-joins
(SURVEY.md §2.3: "no theta/range/as-of joins exist in the
reference") and its only history mechanism is append-mode loads
(`dags/vcapital_warehouse/tasks/components/load.py:68-73`). They are,
however, core operations of any event/warehouse engine at scale, so
they are first-class here, built strictly from shuffle-economical
primitives:

- **As-of join** — the classic "latest right row at or before each
  left row per key". NOT a correlated subquery and NOT a range
  cross-join: both sides are tagged, unioned, and swept with a single
  running ``last(ignorenulls)`` window — exactly one shuffle on the
  key, sort within partitions, zero row amplification. This is the
  same plan a sort-merge as-of join would produce natively and it
  scales to arbitrarily long histories per key.
- **Range join** — "events inside intervals". The naive formulation
  is a non-equi join (cross product per key at 100 TB). The scale
  path bins time into fixed-width buckets: intervals explode to the
  few buckets they cover, events map to exactly one bucket, the join
  becomes an equi-join on (key, bucket) plus an exact residual
  filter. Row amplification is bounded by interval_span/bin_width.
- **SCD2 collapse** — turns a snapshot/event stream into Kimball
  type-2 validity intervals (valid_from / valid_to / is_current /
  version), the standard dimension-history shape the reference's
  star schema (`dataset/warehouse/init_dwh.sql:31-114`) stops short
  of. Two window passes over one shuffle on the key.

All three are deterministic given a unique tiebreak column — never
rely on input order (shuffle-stage retries reorder rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "asof_join",
    "range_join",
    "scd2_collapse",
    "merge_intervals",
    "consecutive_day_islands",
    "time_weighted_avg",
    "asof_join_nearest",
    "interval_gaps",
]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, Column] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the payload of the closest right row
    per ``key``: backward = greatest ``right_ts`` <= ``left_ts``
    (``strict``: <), forward = least ``right_ts`` >= ``left_ts``.

    ``payload`` maps output column name → Column over the *right*
    DataFrame (defaults to the right timestamp only, as
    ``asof_ts``). ``tiebreak`` names a right column that makes rows
    unique within (key, ts); the row with the greatest tiebreak wins.
    Unmatched left rows keep null payloads (left-outer semantics).

    Plan shape: union(tagged left, tagged right) → window
    partitionBy(key) orderBy(ord, tag, tiebreak) rows unbounded
    preceding → filter left tag. One shuffle, no amplification.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    sign = F.lit(1) if direction == "backward" else F.lit(-1)

    payload = payload or {"asof_ts": F.col(right_ts)}
    names = list(payload)

    # Equal-timestamp visibility: inclusive → right rows sort before
    # left rows at the same instant (tag 0 < 1); strict → after.
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    # The tiebreak is NOT direction-signed: among right rows tied on
    # (key, ts), the greatest tiebreak wins in both directions (last
    # row in ascending __tb order is what last() picks up).
    tb = F.col(tiebreak) if tiebreak else F.lit(0)

    l_cols = left.columns
    l_side = left.select(
        F.col(key).alias("__k"),
        (sign * F.unix_micros(F.col(left_ts))).alias("__ord"),
        F.lit(l_tag).alias("__tag"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in l_cols]).alias("__l"),
    )
    r_side = right.select(
        F.col(key).alias("__k"),
        (sign * F.unix_micros(F.col(right_ts))).alias("__ord"),
        F.lit(r_tag).alias("__tag"),
        tb.cast("long").alias("__tb"),
        F.struct(*[expr.alias(n) for n, expr in payload.items()]).alias("__r"),
    )
    l_side = l_side.withColumn(
        "__r", F.lit(None).cast(r_side.schema["__r"].dataType)
    )
    r_side = r_side.withColumn(
        "__l", F.lit(None).cast(l_side.schema["__l"].dataType)
    )

    # __tb null only on left rows, which __tag already separates, so
    # null ordering is irrelevant; sort is total given a unique tiebreak.
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ord").asc_nulls_last(), "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = l_side.unionByName(r_side).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    return swept.filter(F.col("__tag") == l_tag).select(
        *[F.col("__l")[c].alias(c) for c in l_cols],
        *[F.col("__match")[n].alias(n) for n in names],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    event_key: str,
    interval_key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 600,
    how: str = "inner",
) -> DataFrame:
    """Equi-key + time-interval join: event rows paired with every
    interval of the same key where ``start <= ts < end``.

    Scale path: both sides bucketize time at ``bin_seconds``
    granularity — the interval side explodes to the buckets its span
    covers (``sequence(floor(start), floor(end))``), the event side
    maps to exactly one bucket — turning the non-equi predicate into
    an equi-join on (key, bucket) with the exact interval predicate as
    a residual join condition. Choose ``bin_seconds`` near the typical
    interval length so the explode factor stays ~2×; never a
    cross-join per key.

    ``how`` may be ``inner`` or ``left`` (events preserved with null
    interval columns when nothing matches — the interval predicate
    lives in the join condition, so outer rows survive it). Right/full
    outer are rejected: the interval side is bin-exploded, so an
    unmatched interval would surface one null-extended row PER BIN,
    not one row.

    Column collisions are the caller's responsibility (pre-alias).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r} "
            "(the exploded interval side cannot be outer-preserved)"
        )
    ev = events.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(ts_col)) / F.lit(bin_seconds * 1_000_000))
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / F.lit(bin_seconds * 1_000_000)),
                F.floor(F.unix_micros(F.col(end_col)) / F.lit(bin_seconds * 1_000_000)),
            )
        ),
    )
    joined = ev.join(
        iv,
        (ev[event_key] == iv[interval_key])
        & (ev["__bin"] == iv["__bin"])
        & (ev[ts_col] >= iv[start_col])
        & (ev[ts_col] < iv[end_col]),
        how,
    )
    return joined.drop("__bin")


def scd2_collapse(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a per-key change stream into SCD Type-2 validity
    intervals: one row per run of consecutive identical ``attr_cols``
    values, with ``valid_from`` (first ts of the run), ``valid_to``
    (start of the next run, null while current), ``is_current`` and a
    1-based ``version`` per key.

    Null-safe change detection (NULL → NULL is *not* a change), so
    dirty snapshots don't fragment history. Deterministic given
    ``tiebreak`` unique within (key, ts). Two windows, one shuffle.
    """
    # nulls LAST on the ascending ts: Postgres/DuckDB default, not Spark's
    order = [F.col(ts_col).asc_nulls_last()] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    first = F.row_number().over(w) == 1

    runs = df.withColumn("__chg", first | changed).filter("__chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return runs.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("int").alias("version"),
    )


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse overlapping/touching [start, end)
    intervals per key into maximal merged spans, with the count of
    source intervals per span. An interval starts a new island when its
    start lies strictly after the running max end of all earlier
    intervals (earlier = (start, end) ascending); islands are numbered
    by a running sum and aggregated. Two windows + one aggregation =
    one shuffle on the key, no self-join — the classic O(n log n)
    formulation, scale-safe because everything is per-key.
    """
    order = [F.col(start_col), F.col(end_col)]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prior_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1
    ).otherwise(0)
    with_island = df.withColumn(
        "__island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_island.groupBy(*key_cols, "__island")
        .agg(
            F.min(start_col).alias("span_start"),
            F.max(end_col).alias("span_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("__island")
    )


def consecutive_day_islands(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Consecutive-calendar-day activity islands per key (daily-streak
    detection): collapse each key's distinct activity *dates* into
    maximal runs of consecutive days.

    ``merge_intervals`` handles explicit [start, end) spans; this is
    the point-event variant — the other classic gaps-and-islands
    shape — built on the date-minus-row_number trick: for distinct
    dates ordered per key, ``date - row_number() days`` is constant
    within a consecutive run, so one group-by on that anchor yields
    the islands. Undated rows (NULL ts) are excluded — the same
    contract the windowed/streaming operators use for event time.

    Exactly two shuffles, both on the key: the date-distinct
    aggregation and the island group-by (the row_number window reuses
    the distinct shuffle's key partitioning). Per-key state is one row
    per active day, never per event — scale-safe for hot keys.

    Returns ``(key_cols…, streak_start, streak_end, n_days)`` with one
    row per island.
    """
    days = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*key_cols, F.to_date(ts_col).alias("__day"))
        .distinct()
    )
    w = Window.partitionBy(*key_cols).orderBy("__day")
    anchored = days.withColumn(
        "__anchor", F.date_sub(F.col("__day"), F.row_number().over(w))
    )
    return (
        anchored.groupBy(*key_cols, "__anchor")
        .agg(
            F.min("__day").alias("streak_start"),
            F.max("__day").alias("streak_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("__anchor")
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    value_col: str,
    value_decimals: str = "decimal(20,4)",
) -> DataFrame:
    """Time-weighted average (TWAP) per key over ``[start, end)``
    validity intervals: Σ(value·duration) / Σ(duration) — the correct
    mean for any interval-valued measure (a price valid for 29 days
    must weigh 29× one valid for a day; the row-mean silently
    over-weights churny keys). The natural aggregation over SCD2
    (``scd2_collapse``) or merged-interval (``merge_intervals``)
    output.

    Duration unit is whole days (``datediff``) — exact integers in
    every engine; zero/negative/NULL-duration intervals and NULL
    values are excluded (point intervals carry no time weight).
    Σ(value·duration) accumulates in exact decimal and rounds to
    cents before the double cast (the cross-engine conversion
    convention); the final division runs on identical doubles. One
    shuffle (the group-by), map-side combined — no window, no sort.

    Returns ``(key_cols…, twa, total_days, n_intervals)``.
    """
    dur = F.datediff(F.col(end_col), F.col(start_col)).cast("long")
    base = df.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & F.col(value_col).isNotNull()
        & (dur > 0)
    ).select(
        *key_cols,
        dur.alias("__d"),
        (F.col(value_col).cast(value_decimals) * dur).alias("__wv"),
    )
    swv = F.round(F.sum("__wv"), 2).cast("double")
    sd = F.sum("__d")
    return base.groupBy(*key_cols).agg(
        (swv / sd.cast("double")).alias("twa"),
        sd.alias("total_days"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    id_col: str,
    payload: dict[str, Column] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Nearest-direction as-of join (pandas ``merge_asof``
    ``direction='nearest'``): for every left row, attach the payload of
    the right row whose timestamp is CLOSEST in either direction per
    key; equidistant candidates resolve backward (the past wins over
    the future — the causal choice). Unmatched left rows keep null
    payloads.

    ``id_col`` must uniquely identify left rows: nearest = backward ▽
    forward, so the two directional sweeps (each the one-shuffle
    union-sweep of :func:`asof_join`) are joined back on the left id
    and the smaller absolute gap wins. Three shuffles total (two
    sweeps + the id equi-join), zero row amplification, no non-equi
    join anywhere — per key the state is one candidate per direction.
    """
    payload = payload or {"asof_ts": F.col(right_ts)}
    names = list(payload)
    pay_b = {**payload, "__asof_ts_b": F.col(right_ts)}
    pay_f = {**payload, "__asof_ts_f": F.col(right_ts)}

    b = asof_join(left, right, key, left_ts, right_ts, pay_b, tiebreak, "backward")
    b = b.select(
        *left.columns,
        *[F.col(n).alias(f"__b_{n}") for n in names],
        "__asof_ts_b",
    )
    f = asof_join(left, right, key, left_ts, right_ts, pay_f, tiebreak, "forward")
    f = f.select(
        F.col(id_col).alias("__fid"),
        *[F.col(n).alias(f"__f_{n}") for n in names],
        "__asof_ts_f",
    )
    j = b.join(f, b[id_col] == f["__fid"], "inner").drop("__fid")

    us = F.unix_micros(F.col(left_ts))
    gap_b = us - F.unix_micros(F.col("__asof_ts_b"))
    gap_f = F.unix_micros(F.col("__asof_ts_f")) - us
    use_b = F.col("__asof_ts_f").isNull() | (
        F.col("__asof_ts_b").isNotNull() & (gap_b <= gap_f)
    )
    return j.select(
        *left.columns,
        *[
            F.when(use_b, F.col(f"__b_{n}")).otherwise(F.col(f"__f_{n}")).alias(n)
            for n in names
        ],
    )


def interval_gaps(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Complement of :func:`merge_intervals`: the uncovered gaps
    BETWEEN a key's merged activity spans — downtime windows between
    sessions, coverage holes in an SLA feed. Returns one row per gap:
    ``(keys, gap_start, gap_end, gap_us)`` where ``gap_start`` is the
    end of one merged span and ``gap_end`` the start of the next
    (strictly later, since touching intervals merge), and ``gap_us``
    the microsecond width. Keys with a single merged span emit
    nothing — leading/trailing open-ended gaps are unbounded and
    excluded by definition.

    Scale shape: merge_intervals' single key shuffle, then a ``lag``
    window over the *merged spans* (cardinality = islands per key,
    already collapsed) on the same partitioning — the second window
    reuses the first exchange, so the whole operator is still one
    shuffle on the key.
    """
    merged = merge_intervals(df, key_cols, start_col, end_col)
    w = Window.partitionBy(*key_cols).orderBy("span_start")
    prev_end = F.lag("span_end").over(w)
    return (
        merged.withColumn("gap_start", prev_end)
        .filter(F.col("gap_start").isNotNull())
        .select(
            *key_cols,
            "gap_start",
            F.col("span_start").alias("gap_end"),
            (
                F.unix_micros("span_start") - F.unix_micros("gap_start")
            ).alias("gap_us"),
        )
    )
