"""Registry family: layout (3 queries).

- layout_zonemap_prune
- layout_zorder_prune
- layout_quantile_buckets
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- zone-map file pruning (operators/layout.py) ---------------------------

@_register(
    "layout_zonemap_prune",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <= TIMESTAMP '1996-12-31 23:59:59'
    GROUP BY 1
    """,
)
def _layout_zonemap_prune(spark: SparkSession, sf: str) -> DataFrame:
    """File-level zone-map skipping (operators/layout.collect_zone_maps
    / pruned_read): lineitem is laid out shipdate-clustered
    (repartitionByRange + sortWithinPartitions — the layout a 100-TB
    time-series fact table has anyway), a per-file min/max map is
    built from one column-pruned scan, and a one-year query touches
    ONLY the files whose zone overlaps the range — unselected files
    are never listed, opened or scheduled (driver-side skipping, the
    Delta/Iceberg data-skipping economics on plain parquet). The
    exact predicate re-applies to survivors, so pruning cannot change
    results — proven by the oracle running the plain full-scan
    filter. tests/test_round7_ops.py additionally pins that the
    survivor set is a strict subset of the files."""
    import os

    li = read_table(spark, sf, "lineitem").select(
        "l_shipdate", "l_quantity", "l_orderkey"
    )
    # Rebuild the clustered copy unconditionally (mode=overwrite), like
    # the sibling IVF entries: a _SUCCESS-keyed skip keyed on the sf-dir
    # basename would silently serve a stale layout from a previous run
    # against different data, or collide two sf paths sharing a basename.
    path = "/tmp/spark_graft_zonemap_" + os.path.basename(os.path.normpath(sf))
    (
        li.repartitionByRange(16, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    import datetime as dt

    zmaps = LAY.collect_zone_maps(spark, path, ["l_shipdate"])
    pruned = LAY.pruned_read(
        spark,
        path,
        zmaps,
        "l_shipdate",
        dt.datetime(1996, 1, 1, 0, 0, 0),
        dt.datetime(1996, 12, 31, 23, 59, 59),
    )
    return pruned.groupBy(
        F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)"))
        .cast("double")
        .alias("sum_qty"),
    )


@_register(
    "layout_zorder_prune",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,4))), 4) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <= TIMESTAMP '1997-06-30 23:59:59'
      AND l_quantity >= 10 AND l_quantity <= 20
    GROUP BY 1
    """,
)
def _layout_zorder_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order clustering + MULTI-column zone-map skipping
    (operators/layout.zorder_write / morton_code / pruned_read_multi):
    lineitem is laid out by the Morton interleave of (shipdate-day,
    quantity) — the Delta/Iceberg OPTIMIZE ZORDER technique — so every
    file is narrow in BOTH dimensions and a 2-D predicate's survivor
    set is the intersection of two small file lists. A 1-D
    shipdate-clustered layout (layout_zonemap_prune's) answers the
    same query by reading every file the DATE selects regardless of
    quantity; the z-layout also prunes on the second column. Exact
    predicates re-apply to survivors, so pruning cannot change
    results — the oracle is the plain full-scan filter. The clustered
    copy rebuilds unconditionally (no stale-cache skip, per the r7
    zonemap advice); morton inputs are the bounded day-offset and
    integer quantity (garbage z on adversarial values degrades only
    clustering, never correctness)."""
    li = read_table(spark, sf, "lineitem").select(
        "l_shipdate", "l_quantity", "l_returnflag"
    )
    import os

    path = "/tmp/spark_graft_zorder_" + os.path.basename(os.path.normpath(sf))
    LAY.zorder_write(
        li,
        path,
        F.datediff(F.col("l_shipdate"), F.lit("1992-01-01").cast("date")),
        F.col("l_quantity").cast("int"),
        files=16,
    )
    zmaps = LAY.collect_zone_maps(spark, path, ["l_shipdate", "l_quantity"])
    import datetime as dt
    from decimal import Decimal

    pruned = LAY.pruned_read_multi(
        spark,
        path,
        zmaps,
        [
            ("l_shipdate", dt.datetime(1997, 1, 1), dt.datetime(1997, 6, 30, 23, 59, 59)),
            ("l_quantity", Decimal(10), Decimal(20)),
        ],
    )
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(20,4)")), 4)
        .cast("double")
        .alias("sum_qty"),
    )


@_register(
    "layout_quantile_buckets",
    """
    WITH ids AS (
      SELECT l_extendedprice AS v,
             CAST(l_orderkey AS VARCHAR) || '-' ||
             CAST(l_linenumber AS VARCHAR) AS rid
      FROM lineitem
    ),
    samp AS (
      SELECT v FROM (
        SELECT v, rid,
               CAST('0x' || substr(md5('qb1' || rid), 1, 8) AS BIGINT) AS h
        FROM ids WHERE v IS NOT NULL AND NOT isnan(v)
      ) ORDER BY h, rid LIMIT 256
    ),
    sorted AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
             COUNT(*) OVER () AS m
      FROM samp
    ),
    bnd AS (
      SELECT g.j, s.v FROM sorted s, generate_series(1, 7) g(j)
      WHERE s.rn = GREATEST(1, (g.j * s.m) // 8)
    ),
    buck AS (
      SELECT ids.rid, ids.v,
             CASE WHEN ids.v IS NULL THEN 8
                  WHEN isnan(ids.v) THEN 8
                  ELSE (SELECT COUNT(*) FROM bnd WHERE bnd.v <= ids.v)
             END AS bucket
      FROM ids
    )
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(v) AS min_price, MAX(v) AS max_price
    FROM buck GROUP BY bucket
    """,
)
def _layout_quantile_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-balanced deterministic partitioning
    (operators/layout.attach_quantile_bucket): bucket boundaries from
    the key's QUANTILES — estimated on the bottom-256 rows by
    md5(salt‖id), a uniform row sample that is bit-reproducible
    across engines, executors and re-evaluations (the determinism
    repartitionByRange's re-sampled boundaries cannot give) — so a
    skewed key spreads evenly where uniform [min,max] spans
    (attach_order_bucket) would hot-spot. bucket(v) = #{boundaries ≤
    v}: a pure function of the value, order-preserving, equal keys
    never straddle. Output: per-bucket row count + value range; the
    oracle recomputes sample, boundaries and assignment from
    scratch."""
    li = read_table(spark, sf, "lineitem").withColumn(
        "rid",
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        ),
    )
    bucketed = LAY.attach_quantile_bucket(
        li, "l_extendedprice", "rid", nbuckets=8, out_col="bucket",
        sample_k=256, salt="qb1",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
