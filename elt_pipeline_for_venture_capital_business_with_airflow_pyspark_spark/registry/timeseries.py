"""Registry family: timeseries (8 queries).

- timeseries_ohlc
- timeseries_ewma
- temporal_interval_gaps
- temporal_merge_intervals
- temporal_time_weighted_avg
- timeseries_gapfill
- timeseries_interpolate
- anomaly_rolling_zscore
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "timeseries_ohlc",
    """
    WITH t AS (
      SELECT user_id, event_id, value, ts,
             epoch_us(ts)
               - (((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000)
               AS bucket_us
      FROM events
    ), r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                                ORDER BY ts, event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY user_id, bucket_us
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM t
    )
    SELECT user_id, make_timestamp(bucket_us) AS bucket_start,
           MAX(CASE WHEN rna = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close,
           COUNT(*) AS n_points,
           CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS volume
    FROM r GROUP BY user_id, bucket_us
    """,
)
def _timeseries_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """Candlestick downsampling (operators/timeseries.ohlc_resample):
    per-user hourly buckets with open/high/low/close/count/volume.
    ONE hash aggregation with map-side combine — open/close are the
    lexicographic struct MIN/MAX over (ts, event_id, value), so ties
    break on the unique id, never partition order; the oracle reaches
    the same rows via ROW_NUMBER, proving the arg-min/arg-max
    equivalence. Volume sums in exact decimal (raw ≤4-decimal input,
    `_dsum` contract)."""
    ev = read_table(spark, sf, "events")
    return TS.ohlc_resample(
        ev, ["user_id"], "ts", "value", bucket_seconds=3600, id_col="event_id"
    )


@_register(
    "timeseries_ewma",
    """
    SELECT user_id, CAST(COUNT(*) AS INTEGER) AS n_points,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> acc * CAST(0.75 AS DOUBLE)
                                 + CAST(0.25 AS DOUBLE) * x) AS ewma
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL
    GROUP BY user_id
    """,
)
def _timeseries_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Exponential smoothing, final value per user
    (operators/timeseries.ewma_last, alpha=0.25): y_t = 0.75*y_{t-1}
    + 0.25*x_t left-folded in strict (ts, event_id) order. Engine
    fold is F.aggregate over the sort_array'd series; oracle fold is
    list_reduce over list(... ORDER BY ts, event_id) — identical
    order and identical double expression, so the doubles hash-match
    exactly (alpha=0.25 and 0.75 are binary-exact literals).
    Null policy is EXPLICIT on both sides: undatable (null ts) and
    missing (null value) observations are excluded before the fold —
    a null anywhere in a sequential recurrence would otherwise poison
    the tail, and null ORDER positions differ across engines."""
    ev = read_table(spark, sf, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    return TS.ewma_last(
        ev, ["user_id"], "ts", "value", alpha=0.25, id_col="event_id"
    )


@_register(
    "temporal_interval_gaps",
    """
    WITH iv AS (
      SELECT user_id, ts AS span_s, ts + INTERVAL 1 HOUR AS span_e
      FROM events WHERE event_type = 'click'
    ), flagged AS (
      SELECT user_id, span_s, span_e,
             CASE WHEN max(span_e) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR span_s > max(span_e) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, span_s, span_e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    ), merged AS (
      SELECT user_id, MIN(span_s) AS span_start, MAX(span_e) AS span_end
      FROM islands GROUP BY user_id, island
    ), g AS (
      SELECT user_id,
             LAG(span_end) OVER (PARTITION BY user_id ORDER BY span_start) AS gap_start,
             span_start AS gap_end
      FROM merged
    )
    SELECT user_id, gap_start, gap_end,
           epoch_us(gap_end) - epoch_us(gap_start) AS gap_us
    FROM g WHERE gap_start IS NOT NULL
    """,
)
def _temporal_interval_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Coverage holes between merged activity spans
    (operators/temporal.interval_gaps): the complement of
    temporal_merge_intervals — per user, the downtime between
    consecutive merged 1-hour click spans, with microsecond width.
    The lag window runs over the already-collapsed spans on the same
    key partitioning as the merge, so the whole operator is still one
    shuffle on user_id."""
    ev = read_table(spark, sf, "events").filter(F.col("event_type") == "click")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("span_s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("span_e"),
    )
    return TMP.interval_gaps(iv, ["user_id"], "span_s", "span_e")


@_register(
    "temporal_merge_intervals",
    """
    WITH iv AS (
      SELECT user_id, ts AS span_s, ts + INTERVAL 1 HOUR AS span_e
      FROM events WHERE event_type = 'click'
    ), flagged AS (
      SELECT user_id, span_s, span_e,
             CASE WHEN max(span_e) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                    OR span_s > max(span_e) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, span_s, span_e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY span_s, span_e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT user_id, MIN(span_s) AS span_start, MAX(span_e) AS span_end,
           COUNT(*) AS n_intervals
    FROM islands GROUP BY user_id, island
    """,
)
def _temporal_merge_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands interval merge: each click opens a 1-hour span;
    overlapping/touching spans per user collapse into maximal merged
    spans (operators/temporal.merge_intervals — two windows + one agg,
    ONE shuffle on the key, no self-join)."""
    ev = read_table(spark, sf, "events").filter(F.col("event_type") == "click")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("span_s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("span_e"),
    )
    return TMP.merge_intervals(iv, ["user_id"], "span_s", "span_e").select(
        "user_id", "span_start", "span_end", "n_intervals"
    )


@_register(
    "temporal_time_weighted_avg",
    """
    WITH iv AS (
      SELECT o_orderpriority,
             o_orderdate AS s,
             o_orderdate + CAST(o_orderkey % 30 + 1 AS INTEGER) * INTERVAL 1 DAY AS e,
             o_totalprice AS v
      FROM orders
    ), base AS (
      SELECT o_orderpriority,
             date_diff('day', CAST(s AS DATE), CAST(e AS DATE)) AS d,
             CAST(v AS DECIMAL(20,4))
               * date_diff('day', CAST(s AS DATE), CAST(e AS DATE)) AS wv
      FROM iv
      WHERE s IS NOT NULL AND e IS NOT NULL AND v IS NOT NULL
        AND date_diff('day', CAST(s AS DATE), CAST(e AS DATE)) > 0
    )
    SELECT o_orderpriority,
           CAST(ROUND(SUM(wv), 2) AS DOUBLE) / CAST(SUM(d) AS DOUBLE) AS twa,
           CAST(SUM(d) AS BIGINT) AS total_days,
           COUNT(*) AS n_intervals
    FROM base GROUP BY o_orderpriority
    """,
)
def _temporal_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average (operators/temporal.time_weighted_avg):
    TWAP of order value per priority over synthetic validity intervals
    ``[o_orderdate, o_orderdate + (o_orderkey % 30 + 1) days)`` — a
    price valid 29 days weighs 29× one valid a day. Σ(value·days)
    accumulates in exact decimal, rounds to cents before the double
    cast, and the division runs on identical doubles. One map-side-
    combined group-by; no window, no sort."""
    orders = read_table(spark, sf, "orders")
    iv = orders.select(
        "o_orderpriority",
        F.col("o_orderdate").alias("s"),
        F.date_add(
            F.col("o_orderdate"), (F.col("o_orderkey") % 30 + 1).cast("int")
        ).alias("e"),
        F.col("o_totalprice").alias("v"),
    )
    return TMP.time_weighted_avg(iv, ["o_orderpriority"], "s", "e", "v")


@_register(
    "timeseries_gapfill",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT s.user_id, s.day,
           last_value(d.sum_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value,
           d.sum_value IS NULL AS is_gap
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def _timeseries_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Date-spine densification + forward fill
    (operators/timeseries.gapfill_ffill): each user's daily spend
    series gets one row per calendar day in its own [first, last]
    span, with gap days inheriting the last observed value. The spine
    is a per-key sequence explode (never a global-calendar cartesian)
    and the fill window shares the spine join's partitioning."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        _dsum(F.col("value")).alias("sum_value")
    )
    return TS.gapfill_ffill(daily, ["user_id"], "day", ["sum_value"]).select(
        "user_id", "day", "sum_value", "is_gap"
    )


@_register(
    "timeseries_interpolate",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), bounds AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
    ), spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), j AS (
      SELECT s.user_id, s.day, d.sum_value, d.sum_value IS NULL AS is_gap
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    ), n AS (
      SELECT *,
        last_value(sum_value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN NOT is_gap THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(sum_value IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN NOT is_gap THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, day,
           CASE WHEN NOT is_gap THEN sum_value
                ELSE pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                       / CAST(nd - pd AS DOUBLE))
           END AS sum_value,
           is_gap
    FROM n
    """,
)
def _timeseries_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """Linear-interpolation gap fill
    (operators/timeseries.interpolate_linear): the TimescaleDB
    ``interpolate()`` twin of `timeseries_gapfill` — gap days get
    ``v0 + (v1-v0)·(Δd/Δspan)`` between their surrounding
    observations instead of a carried step. Day deltas are exact
    ints; the fill is one fixed-order float expression, so the
    hash check pins every interpolated value bit-for-bit. Same
    scale shape as the ffill variant: per-key spine explode + two
    constant-state window passes over one partitioning."""
    ev = read_table(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        _dsum(F.col("value")).alias("sum_value")
    )
    return TS.interpolate_linear(daily, ["user_id"], "day", "sum_value").select(
        "user_id", "day", "sum_value", "is_gap"
    )


@_register(
    "anomaly_rolling_zscore",
    """
    WITH b AS (
      SELECT user_id, event_id, ts, value,
             CAST(value AS DECIMAL(19,4)) AS xd
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND abs(value) <= 1000.0
    ), w AS (
      SELECT user_id, event_id, ts, value,
             CAST(xd AS DOUBLE) AS x,
             COUNT(xd) OVER win AS n,
             CAST(SUM(xd) OVER win AS DOUBLE) AS s1,
             CAST(SUM(CAST(xd AS DECIMAL(19,4)) * CAST(xd AS DECIMAL(19,4)))
                  OVER win AS DOUBLE) AS s2
      FROM b
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             n AS n_baseline,
             (x - s1 / n) / NULLIF(
               sqrt(greatest((s2 - s1 * (s1 / n)) / (n - 1), 0.0)), 0.0
             ) AS z
      FROM w WHERE n >= 8
    )
    SELECT * FROM z WHERE abs(z) > 3.0
    """,
)
def _anomaly_rolling_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing-window anomaly detection
    (operators/timeseries.rolling_zscore): each event scored against
    its user's previous ≤20 observations (self excluded), flagged at
    |z| > 3 — the per-point alerting complement to the GLOBAL
    dq_outlier_iqr/mad family. Mean/variance come from exact decimal
    window sums (frame-aggregation order can't perturb a bit in
    either engine) and the float finish is fixed-order with a
    correctly-rounded sqrt, so the z values themselves hash-match.
    One shuffle on user_id, constant frame state — the single-pass
    shape that survives a year of events per key. The |value| <= 1000
    domain guard (covers the full real data range, max 560) keeps the
    trailing sum-of-squares under 2^53 in scaled units, where BOTH
    engines' decimal->double casts are exact — above that the cast
    itself can diverge by an ulp. NULL timestamps are excluded
    explicitly: a null has no place on a timeline, and window-order
    null placement is an engine default (Spark NULLS FIRST vs DuckDB
    NULLS LAST) this surface must not depend on."""
    ev = read_table(spark, sf, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.abs("value") <= 1000.0)
    )
    scored = TS.rolling_zscore(
        ev, ["user_id"], "ts", "event_id", "value",
        lookback=20, min_points=8,
    )
    return scored.filter(F.abs(F.col("z")) > 3.0).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "n_baseline",
        "z",
    )
