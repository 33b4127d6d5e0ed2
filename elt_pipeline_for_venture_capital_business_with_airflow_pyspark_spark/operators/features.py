"""ML feature-engineering operators: per-group standardization and
time-range rolling aggregates.

The reference stops at warehouse facts; a training pipeline needs the
next step — numeric features normalized per segment and rolling
behavioral aggregates per entity. Both are built so the *result is
bit-for-bit deterministic across engines and partitionings*:

- ``zscore_per_group`` — group mean/std from exact decimal moment sums
  (count, Σx, Σx²) so no double-accumulation order leaks in; the final
  mean/variance/z arithmetic is a fixed IEEE expression tree evaluated
  identically everywhere. Two passes over the column (one partial-agg
  shuffle for the KB-sized moment table, broadcast back) — never a
  window over the full data.
- ``rolling_range_agg`` — per-key rolling count/sum over a trailing
  time range (RANGE frame on an epoch-microsecond order key, so
  same-timestamp peers aggregate as a set — deterministic, unlike ROWS
  frames under ties). One shuffle on the key; Spark evaluates the
  frame with a sliding two-pointer over the sorted partition, O(rows),
  state bounded by the range width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import surrogate as SK

__all__ = [
    "zscore_per_group",
    "rolling_range_agg",
    "iqr_outliers",
    "mad_outliers",
    "quantile_bins",
    "class_weights",
    "partitioned_cumsum",
    "exact_quantiles",
    "pareto_class",
]


def _join_group_stats(
    df: DataFrame, stats: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Null-SAFE broadcast join of a per-group stats frame back onto
    the fact: the NULL group is a real group (groupBy keeps it), and a
    plain equi join would silently drop every null-keyed row — a
    row-preserving transform must not change the row count."""
    s = stats
    for c in group_cols:
        s = s.withColumnRenamed(c, f"__gs_{c}")
    cond = None
    for c in group_cols:
        clause = df[c].eqNullSafe(s[f"__gs_{c}"])
        cond = clause if cond is None else (cond & clause)
    return df.join(F.broadcast(s), cond, "inner").drop(
        *[f"__gs_{c}" for c in group_cols]
    )


def zscore_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    out_col: str = "zscore",
) -> DataFrame:
    """Standardize ``value_col`` within each group: ``(x - μ) / σ``
    (sample std, n-1). Groups with n < 2 or zero variance get NULL.

    The moments are exact decimals (value cast decimal(18,4) — exact
    for money-grade inputs; products widen to decimal(37,8)); μ, σ², z
    are then computed in doubles with a FIXED expression order:
    ``(x_d - s1_d/n) / sqrt((s2_d - s1_d*s1_d/n) / (n-1))`` — the same
    tree any other engine can replicate literally.
    """
    v = F.col(value_col).cast("decimal(18,4)")
    stats = df.groupBy(*group_cols).agg(
        # count the VALUES, not the rows: NULL measurements are absent
        # from the sums, so a row count would shift mean and variance
        F.count(v).alias("_n"),
        F.sum(v).alias("_s1"),
        F.sum(v * v).alias("_s2"),
    )
    joined = _join_group_stats(df, stats, group_cols)
    n = F.col("_n")
    s1d = F.col("_s1").cast("double")
    s2d = F.col("_s2").cast("double")
    var = (s2d - s1d * s1d / n) / (n - F.lit(1))
    z = (F.col(value_col).cast("double") - s1d / n) / F.sqrt(var)
    z = F.when((n >= 2) & (var > 0), z)
    return joined.withColumn(out_col, z).drop("_n", "_s1", "_s2")


def iqr_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier summary per group: exact interpolated
    Q1/Q3, fences at ``Q1 − k·IQR`` / ``Q3 + k·IQR``, and the outlier
    count — the robust anomaly screen (unlike z-scores, the fences
    themselves aren't dragged by the outliers being hunted).

    Quantiles are rounded to 4 dp before the fence arithmetic so the
    downstream comparisons are engine-stable; the group-stats table is
    KB-sized and broadcast back, one extra pass over the fact. At
    100 TB swap ``percentile`` for ``approx_percentile`` (mergeable
    sketch, same call shape).
    """
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.round(F.percentile(v, F.lit(0.25)), 4).alias("q1"),
        F.round(F.percentile(v, F.lit(0.75)), 4).alias("q3"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    lo = F.col("q1") - F.lit(k) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(k) * (F.col("q3") - F.col("q1"))
    joined = _join_group_stats(df, stats, group_cols)
    return (
        joined.groupBy(*group_cols, "q1", "q3", "n_rows")
        .agg(
            F.sum(
                F.when((v < lo) | (v > hi), F.lit(1)).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
        .select(
            *group_cols,
            "q1",
            "q3",
            lo.alias("fence_lo"),
            hi.alias("fence_hi"),
            "n_rows",
            "n_outliers",
        )
    )


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: float = 3.0,
) -> DataFrame:
    """Median-absolute-deviation outlier screen per group — the
    highest-breakdown-point (50%) robust scale estimate, surviving
    contamination that drags even Tukey fences. Flags rows where
    ``|x − median| > k · 1.4826 · MAD`` (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD
    consistent with σ under normality).

    Two exact-percentile passes (median, then median of absolute
    deviations), each a KB-sized group-stats frame broadcast back onto
    the fact; medians round to 4 dp so the threshold comparisons are
    engine-stable. At 100 TB swap ``percentile`` for
    ``approx_percentile`` (mergeable sketch, same call shape).
    """
    v = F.col(value_col)
    med = df.groupBy(*group_cols).agg(
        F.round(F.percentile(v, F.lit(0.5)), 4).alias("med"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    dev = _join_group_stats(df, med, group_cols).withColumn(
        "_absdev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.round(F.percentile(F.col("_absdev"), F.lit(0.5)), 4).alias("mad")
    )
    thr = (F.lit(k) * F.lit(1.4826)) * F.col("mad")
    return (
        _join_group_stats(dev, mad, group_cols)
        .groupBy(*group_cols, "med", "mad", "n_rows")
        .agg(
            F.sum(
                F.when(F.col("_absdev") > thr, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_outliers")
        )
        .select(*group_cols, "med", "mad", "n_rows", "n_outliers")
    )


def partitioned_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    *,
    out_col: str = "cum",
    num_partitions: int | None = None,
    group_cols: list[str] | None = None,
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Running total over a TOTAL order without a single-reducer sort —
    the two-phase prefix-sum pattern (same construction as
    operators/surrogate.add_surrogate_key): a value-deterministic
    order-preserving bucket id on the LEADING order column, local
    cumulative sum per bucket, then broadcast prefix offsets computed
    from ONE ROW PER BUCKET. The data never funnels through one task.

    The bucket id comes from `surrogate.attach_order_bucket`, not
    `repartitionByRange`: this frame is consumed by BOTH the totals
    path and the data path, and the range partitioner re-samples its
    boundaries per evaluation — the two passes can disagree, silently
    mis-splicing the running totals (the exact failure mode caught in
    the surrogate operator at sf0.1). Bucket ids are pure functions
    of the row value, so both passes agree by construction.

    ``order_cols`` must be a total order (add a tiebreak) or the
    running values are retry-nondeterministic. ``value_col`` should be
    decimal for exact, order-insensitive partial sums. The leading
    order column's direction is inferred (`Column.desc()` supported);
    equal leading values always map to the SAME bucket (the bucket is
    a pure function of the value), so ties never straddle a bucket
    boundary and the within-bucket sort over the full ``order_cols``
    finishes the total order.

    ``group_cols`` runs an independent cumulative sum PER GROUP over
    the same global value buckets — the shape for few-but-huge groups
    (e.g. 5 order priorities), where a plain
    ``Window.partitionBy(group)`` would funnel each group through one
    reducer. In grouped mode the cross-bucket offsets stay in-plan: a
    per-group running total over the (group × bucket) totals frame
    (≤ groups·nbuckets rows), joined back — no driver collect and no
    literal-map limit. The offsets frame is BROADCAST by default,
    which is right for the few-huge-groups contract but puts
    |groups|·nbuckets rows on every executor and the driver: above
    ~10^5 groups pass ``broadcast_offsets=False`` to use a shuffled
    join instead (the offsets frame then scales like any other side).
    """
    keys = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        nbuckets = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    else:
        nbuckets = num_partitions

    # leading order column name / direction / null placement from the
    # expression repr ("Column<'weight DESC NULLS LAST'>"). Repr
    # scraping only works for a PLAIN column reference — validate and
    # fail loudly for expressions or names with spaces rather than
    # silently bucketing on the wrong thing.
    lead = order_cols[0]
    if isinstance(lead, str):
        lead_name, lead_desc, lead_nulls_last = lead, False, None
    else:
        inner = str(lead).split("'")[1]
        lead_desc = " DESC" in inner
        lead_nulls_last = "NULLS LAST" in inner if "NULLS" in inner else None
        lead_name = inner.split(" ")[0]
    if lead_name not in df.columns:
        raise ValueError(
            f"partitioned_cumsum: leading order column {lead_name!r} is not "
            "a plain column of the frame — pass a column NAME or a simple "
            "F.col(name).asc()/.desc() (optionally with nulls ordering), "
            "not a computed expression; pre-compute it as a column first"
        )

    tagged = SK.attach_order_bucket(
        df, lead_name, nbuckets, "__cs_b",
        desc=lead_desc, nulls_last=lead_nulls_last,
    )

    if group_cols:
        # grouped mode: offsets computed IN-PLAN as a per-group
        # running total over the (group, bucket) totals — that frame
        # is ≤ |groups|·nbuckets rows (KB-state), so the window
        # partitioned by group over it is metadata math, never a
        # data-sized single reducer; broadcast back onto the data
        totals = tagged.groupBy(*group_cols, "__cs_b").agg(
            F.sum(value_col).alias("__cs_tot")
        )
        woff = (
            Window.partitionBy(*group_cols)
            .orderBy("__cs_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets_df = totals.select(
            *group_cols,
            "__cs_b",
            F.sum("__cs_tot").over(woff).alias("__cs_off"),
        )
        wloc = (
            Window.partitionBy(*group_cols, "__cs_b")
            .orderBy(*keys)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = tagged.withColumn("__cs_loc", F.sum(value_col).over(wloc))
        # null-SAFE offset join: a NULL group key is a real group
        # (groupBy keeps it) and a plain equi join would zero its
        # offsets, silently mis-splicing that group's running totals
        offs = offsets_df
        for c in group_cols:
            offs = offs.withColumnRenamed(c, f"__cs_g_{c}")
        offs = offs.withColumnRenamed("__cs_b", "__cs_ob")
        cond = local["__cs_b"] == offs["__cs_ob"]
        for c in group_cols:
            cond = cond & local[c].eqNullSafe(offs[f"__cs_g_{c}"])
        offs_side = F.broadcast(offs) if broadcast_offsets else offs
        return (
            local.join(offs_side, cond, "left")
            .withColumn(
                out_col,
                F.col("__cs_loc")
                + F.coalesce(F.col("__cs_off"), F.lit(0)),
            )
            .drop(
                "__cs_b",
                "__cs_loc",
                "__cs_off",
                "__cs_ob",
                *[f"__cs_g_{c}" for c in group_cols],
            )
        )

    # per-bucket totals -> prefix offsets on the driver (one row per
    # occupied bucket, KB-sized; recomputation-safe: bucket ids are
    # value-deterministic)
    totals = tagged.groupBy("__cs_b").agg(F.sum(value_col).alias("__cs_tot")).collect()
    running = None
    offsets: dict[int, object] = {}
    for row in sorted(totals, key=lambda r: r["__cs_b"]):
        if running is not None:
            offsets[row["__cs_b"]] = running
        # an all-NULL bucket (e.g. the null-key bucket of a NULL-weight
        # slice) sums to None — it contributes zero to later offsets
        tot = row["__cs_tot"] if row["__cs_tot"] is not None else 0
        running = tot if running is None else running + tot
    if offsets:
        offset_expr = F.element_at(
            F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
            F.col("__cs_b"),
        )
    else:  # single occupied bucket — no cross-bucket offsets
        offset_expr = F.lit(None).cast("long")

    wloc = Window.partitionBy("__cs_b").orderBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = tagged.withColumn("__cs_loc", F.sum(value_col).over(wloc))
    return (
        local.withColumn(out_col, F.col("__cs_loc") + F.coalesce(offset_expr, F.lit(0)))
        .drop("__cs_b", "__cs_loc")
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
    *,
    group_cols: list[str] | None = None,
    mode: str = "cont",
    out_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT per-group quantiles with NO data-sized single reducer —
    the scale-safe replacement for both ``percentile()`` (whose
    aggregation buffer holds every distinct value of a group in ONE
    task) and ``percentile_disc`` (which buffers every ROW): the
    classic distinct-value histogram + two-phase cumulative count.

    Plan: one groupBy((group), value) builds the histogram (map-side
    combined, so the shuffle carries distinct values, not rows);
    :func:`partitioned_cumsum` attaches cumulative counts with
    value-bucketed parallelism (grouped mode splits even a 5-group
    frame across all buckets — no per-group reducer); then ONE
    aggregation reads the target ranks off the histogram. Every stage
    is partition-parallel; driver traffic is nil in grouped mode and
    one KB offsets collect ungrouped.

    ``mode="cont"`` reproduces Spark ``percentile()`` / DuckDB
    ``quantile_cont`` bit-for-bit — the interpolation mirrors
    Percentile's exact IEEE expression
    ``(higher-pos)*vlo + (pos-lower)*vhi`` with ``pos = q·(n-1)``
    over non-null count n, so results hash-match the builtin it
    replaces. ``mode="disc"`` returns the smallest value whose
    cumulative count reaches ``q·n`` (``percentile_disc`` /
    ``quantile_disc`` semantics — every output EXISTS in the data).

    Output: one row per group (all groups retained, including
    all-NULL groups → NULL quantiles, matching the builtins) with
    ``n_rows``, ``n_values`` and one column per quantile
    (``out_cols`` or ``q0_5``-style names derived from ``quantiles``).
    """
    if mode not in ("cont", "disc"):
        raise ValueError("mode must be 'cont' or 'disc'")
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    if out_cols is None:
        out_cols = ["q" + str(q).replace(".", "_") for q in quantiles]
    if len(out_cols) != len(quantiles):
        raise ValueError("out_cols must align 1:1 with quantiles")
    gcols = list(group_cols or [])
    v = F.col(value_col)

    base = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_rows"), F.count(v).alias("__nn")
    )
    hist = (
        df.filter(v.isNotNull())
        .groupBy(*gcols, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    cum = partitioned_cumsum(
        hist,
        [value_col],
        "__c",
        out_col="__cum",
        num_partitions=num_partitions,
        group_cols=gcols or None,
    )
    nn_frame = base.select(*gcols, "__nn")
    if gcols:
        # null-safe: the NULL group is a real group
        cum2 = _join_group_stats(cum, nn_frame, gcols)
    else:
        cum2 = cum.crossJoin(F.broadcast(nn_frame))

    rank_aggs: list = []
    for q, name in zip(quantiles, out_cols):
        if mode == "disc":
            # smallest value whose cumulative count reaches q·n —
            # the comparison is double (q·n) vs bigint cum, same
            # arithmetic as DuckDB quantile_disc's rank cut
            rank_aggs.append(
                F.min(
                    F.when(
                        F.col("__cum") >= F.lit(q) * F.col("__nn"), v
                    )
                ).alias(f"__v_{name}")
            )
        else:
            pos = F.lit(q) * (F.col("__nn") - F.lit(1)).cast("double")
            lower = F.floor(pos)
            higher = F.ceil(pos)
            rank_aggs.append(
                F.min(F.when(F.col("__cum") >= lower + 1, v)).alias(
                    f"__lo_{name}"
                )
            )
            rank_aggs.append(
                F.min(F.when(F.col("__cum") >= higher + 1, v)).alias(
                    f"__hi_{name}"
                )
            )
    stats = (
        cum2.groupBy(*gcols).agg(*rank_aggs, F.first("__nn").alias("__snn"))
        if gcols
        else cum2.agg(*rank_aggs, F.first("__nn").alias("__snn"))
    )
    if gcols:
        # null-safe LEFT join: all-NULL-value groups are absent from
        # the histogram/stats but must stay in the output (NULL
        # quantiles), and a NULL group key must still find its stats
        s = stats
        for c in gcols:
            s = s.withColumnRenamed(c, f"__eq_{c}")
        cond = None
        for c in gcols:
            clause = base[c].eqNullSafe(s[f"__eq_{c}"])
            cond = clause if cond is None else (cond & clause)
        joined = base.join(F.broadcast(s), cond, "left").drop(
            *[f"__eq_{c}" for c in gcols]
        )
    else:
        joined = base.crossJoin(F.broadcast(stats))

    outs: list = []
    for q, name in zip(quantiles, out_cols):
        if mode == "disc":
            outs.append(F.col(f"__v_{name}").alias(name))
        else:
            # EXACTLY Spark Percentile.getPercentile: pos = q·(n-1);
            # equal floor/ceil → the value itself, else the two-sided
            # IEEE blend (higher-pos)·vlo + (pos-lower)·vhi — the
            # weights sum to 1 but the blend is kept verbatim so the
            # result is bit-identical to the builtin it replaces
            pos = F.lit(q) * (F.col("__snn") - F.lit(1)).cast("double")
            lower = F.floor(pos)
            higher = F.ceil(pos)
            vlo = F.col(f"__lo_{name}").cast("double")
            vhi = F.col(f"__hi_{name}").cast("double")
            outs.append(
                F.when(F.col("__snn") == 0, F.lit(None).cast("double"))
                .when(higher == lower, vlo)
                .otherwise(
                    (higher.cast("double") - pos) * vlo
                    + (pos - lower.cast("double")) * vhi
                )
                .alias(name)
            )
    return joined.select(
        *gcols, "n_rows", F.col("__nn").alias("n_values"), *outs
    )


def pareto_class(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    *,
    bound_a: tuple[int, int] = (4, 5),
    bound_b: tuple[int, int] = (19, 20),
) -> DataFrame:
    """ABC / Pareto classification: rank keys by descending weight,
    class A while the running share of total weight stays ≤ 80%
    (``bound_a`` = 4/5), B until 95% (19/20), else C — the classic
    inventory / revenue-concentration cut.

    Shares are compared as exact cross-multiplied decimals
    (``cum·den ≤ total·num``) — no division, so no float rounding at
    the class boundaries. The running total uses the two-phase
    ``partitioned_cumsum`` (no single-reducer sort); the grand total
    rides a one-row broadcast.
    """
    w = F.col(weight_col)
    total = df.agg(F.sum(w).alias("__total"))
    cum = partitioned_cumsum(
        df, [w.desc(), F.col(key_col).asc()], weight_col, out_col="__cum"
    )
    na, da = bound_a
    nb, db = bound_b
    cls = (
        F.when(F.col("__cum") * da <= F.col("__total") * na, F.lit("A"))
        .when(F.col("__cum") * db <= F.col("__total") * nb, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            key_col,
            w.cast("double").alias("weight"),
            F.col("__cum").cast("double").alias("cum_weight"),
            cls.alias("abc_class"),
        )
    )


def rolling_range_agg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    *,
    range_micros: int,
    n_col: str = "rolling_n",
    sum_col: str = "rolling_sum",
) -> DataFrame:
    """Trailing-range rolling count + exact-decimal sum per key.

    The frame is ``RANGE BETWEEN range_micros PRECEDING AND CURRENT
    ROW`` over ``unix_micros(ts)`` — value-based, so rows sharing a
    timestamp see the same frame regardless of sort-tiebreak, which is
    what makes the output deterministic under shuffle retries.
    """
    order = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order)
        .rangeBetween(-range_micros, Window.currentRow)
    )
    return df.withColumn(n_col, F.count(F.lit(1)).over(w)).withColumn(
        sum_col,
        F.sum(F.col(value_col).cast("decimal(20,4)")).over(w).cast("double"),
    )


def quantile_bins(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tiebreak_col: str,
    *,
    n_bins: int = 4,
) -> DataFrame:
    """Equal-frequency binning (`ntile`) per group with a per-bin
    summary — the feature-engineering discretizer. The ordering is made
    total with ``tiebreak_col`` so bin assignment is deterministic in
    every engine (NTILE on a partial order is whatever the sort
    happened to do).

    One shuffle for the window sort, reused by the summary aggregation.
    At 100 TB swap for ``approx_percentile``-derived cut points and a
    broadcast range lookup — same output contract, no global sort.
    """
    w = Window.partitionBy(*group_cols).orderBy(
        # nulls LAST on ascending: Postgres/DuckDB default, not Spark's
        F.col(value_col).asc_nulls_last(), F.col(tiebreak_col).asc()
    )
    binned = df.withColumn("bin", F.ntile(n_bins).over(w))
    v = F.col(value_col)
    return binned.groupBy(*group_cols, "bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(v).alias("bin_min"),
        F.max(v).alias("bin_max"),
    )


def class_weights(
    df: DataFrame,
    label_col: str,
) -> DataFrame:
    """Inverse-frequency class weights (`total / (k * n_label)`) — the
    standard imbalance correction fed to a training loss. Single
    aggregation; the totals ride a 1-row broadcast back onto the
    per-label frame. Weight is one bigint→double division so the
    value is bit-identical across engines.
    """
    per = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = F.sum("n_rows").over(Window.partitionBy())
    k = F.count(F.lit(1)).over(Window.partitionBy())
    return per.select(
        label_col,
        "n_rows",
        (tot.cast("double") / (k * F.col("n_rows")).cast("double")).alias(
            "weight"
        ),
    )
