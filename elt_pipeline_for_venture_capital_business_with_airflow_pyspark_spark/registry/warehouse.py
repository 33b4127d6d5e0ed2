"""Registry family: warehouse (16 queries).

- json_extract_agg
- surrogate_key_dim
- sort_limit_topk
- dedup_latest_wins
- dim_date_full
- upsert_merge
- star_schema_build
- json_flatten_struct
- scd2_order_status
- rollup_hypertable
- dq_expectations
- cdc_snapshot_diff
- cdc_apply_changes
- dq_outlier_iqr
- dq_benford_totalprice
- dq_outlier_mad
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register(
    "json_extract_agg",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def _json_extract_agg(spark: SparkSession, sf: str) -> DataFrame:
    """F11/F12: JSON payload parse + aggregate (the reference's API
    JSON flattening, re-expressed as get_json_object)."""
    ev = read_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@_register(
    "surrogate_key_dim",
    """
    SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS sk_customer_id,
           c_custkey, c_name
    FROM customer
    """,
)
def _surrogate_key_dim(spark: SparkSession, sf: str) -> DataFrame:
    """W1: deterministic surrogate keys (the BIGSERIAL replacement)."""
    customer = read_table(spark, sf, "customer").select("c_custkey", "c_name")
    return SK.add_surrogate_key(customer, "sk_customer_id", ["c_custkey"])


@_register(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def _sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    """W2/W3: global sort + limit (Spark executes as TakeOrderedAndProject)."""
    return (
        read_table(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --- upsert / incremental / streaming shapes (S7, §2.7) ---------------------

@_register(
    "dedup_latest_wins",
    """
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def _dedup_latest_wins(spark: SparkSession, sf: str) -> DataFrame:
    """S7 upsert semantics: latest-timestamp-wins per key."""
    ev = read_table(spark, sf, "events")
    out = DD.dedup_keep_first(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )

@_register(
    "dim_date_full",
    f"""
    WITH spine AS (
      SELECT DATE '1950-01-01' + CAST(i AS INT) AS datum
      FROM generate_series(0, 29219) t(i)
    )
    SELECT CAST(strftime(datum, '%Y%m%d') AS INT) AS date_id,
           datum AS date_actual,
           day(datum)::VARCHAR ||
             CASE WHEN day(datum) % 100 IN (11,12,13) THEN 'th'
                  WHEN day(datum) % 10 = 1 THEN 'st'
                  WHEN day(datum) % 10 = 2 THEN 'nd'
                  WHEN day(datum) % 10 = 3 THEN 'rd'
                  ELSE 'th' END AS day_suffix,
           {_DAY_CASE} AS day_name,
           CAST(dayofyear(datum) AS INT) AS day_of_year,
           CAST(FLOOR((day(datum) - 1) / 7) AS INT) + 1 AS week_of_month,
           CAST(week(datum) AS INT) AS week_of_year,
           isoyear(datum)::VARCHAR || '-W' || lpad(week(datum)::VARCHAR, 2, '0') AS week_of_year_iso,
           CAST(month(datum) AS INT) AS month_actual,
           {_MONTH_CASE} AS month_name,
           substr({_MONTH_CASE}, 1, 3) AS month_name_abbreviated,
           CAST(quarter(datum) AS INT) AS quarter_actual,
           CASE quarter(datum) WHEN 1 THEN 'First' WHEN 2 THEN 'Second'
                WHEN 3 THEN 'Third' ELSE 'Fourth' END AS quarter_name,
           CAST(year(datum) AS INT) AS year_actual,
           datum + CAST(1 - isodow(datum) AS INT) AS first_day_of_week,
           datum + CAST(7 - isodow(datum) AS INT) AS last_day_of_week,
           date_trunc('month', datum)::DATE AS first_day_of_month,
           last_day(datum) AS last_day_of_month,
           date_trunc('quarter', datum)::DATE AS first_day_of_quarter,
           (date_trunc('quarter', datum) + INTERVAL 3 MONTH - INTERVAL 1 DAY)::DATE AS last_day_of_quarter,
           date_trunc('year', datum)::DATE AS first_day_of_year,
           make_date(CAST(year(datum) AS INT), 12, 31) AS last_day_of_year,
           strftime(datum, '%m%Y') AS mmyyyy,
           strftime(datum, '%m%d%Y') AS mmddyyyy,
           CASE WHEN isodow(datum) IN (6,7) THEN 'weekend' ELSE 'weekday' END AS weekend_indr
    FROM spine
    """,
)
def _dim_date_full(spark: SparkSession, sf: str) -> DataFrame:
    """F10: the complete 26-column 80-year date dimension, Postgres
    to_char parity (hard-parity item, SURVEY.md §7.2)."""
    return DDATE.build_dim_date(spark)


# --- merge / star build / skew (S7, W1, 100 TB posture) ----------------------

@_register(
    "upsert_merge",
    """
    WITH old AS (
      SELECT o_orderkey, 'old' AS src, 0 AS version, o_totalprice AS amount
      FROM orders WHERE o_orderkey % 3 <> 0
    ), new_raw AS (
      SELECT o_orderkey, 'new' AS src, 1 AS version, o_totalprice * 2 AS amount
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, 'new', 2, o_totalprice * 3
      FROM orders WHERE o_orderkey % 2 = 0
    ), new AS (
      SELECT o_orderkey, src, version, amount FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM new_raw
      ) WHERE rn = 1
    )
    SELECT o_orderkey, src, version, amount FROM new
    UNION ALL
    SELECT o.o_orderkey, o.src, o.version, o.amount FROM old o
    WHERE NOT EXISTS (SELECT 1 FROM new n WHERE n.o_orderkey = o.o_orderkey)
    """,
)
def _upsert_merge(spark: SparkSession, sf: str) -> DataFrame:
    """S7 MERGE semantics on plain DataFrames: latest-version-wins
    within the batch, new beats old on key collision, unmatched old
    rows survive (sources.io.merge_upsert — the parquet upsert's core)."""
    orders = read_table(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.lit("old").alias("src"),
        F.lit(0).alias("version"),
        F.col("o_totalprice").alias("amount"),
    )
    evens = orders.filter(F.col("o_orderkey") % 2 == 0)
    new_raw = evens.select(
        "o_orderkey",
        F.lit("new").alias("src"),
        F.lit(1).alias("version"),
        (F.col("o_totalprice") * 2).alias("amount"),
    ).unionByName(
        evens.select(
            "o_orderkey",
            F.lit("new").alias("src"),
            F.lit(2).alias("version"),
            (F.col("o_totalprice") * 3).alias("amount"),
        )
    )
    return SIO.merge_upsert(new_raw, old, ["o_orderkey"], order_by="version")


@_register(
    "star_schema_build",
    """
    WITH dim AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c_custkey) AS sk_customer_id,
             c_custkey AS nk_customer_id, c_mktsegment
      FROM customer WHERE c_acctbal > 0
    )
    SELECT o_orderkey, sk_customer_id, nk_customer_id, c_mktsegment,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_id,
           o_totalprice AS amount
    FROM orders JOIN dim ON o_custkey = nk_customer_id
    """,
)
def _star_schema_build(spark: SparkSession, sf: str) -> DataFrame:
    """W1 + §1.4 end-to-end: surrogate-keyed dim build → broadcast
    inner join as FK filter (negative-balance customers' orders are
    orphaned and dropped) → smart date key. The plans.warehouse builder
    pattern on the driver testdata."""
    customer = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    dim = SK.add_surrogate_key(
        customer.filter(F.col("c_acctbal") > 0).select(
            F.col("c_custkey").alias("nk_customer_id"), "c_mktsegment"
        ),
        "sk_customer_id",
        ["nk_customer_id"],
    )
    return (
        orders.join(
            F.broadcast(dim), orders["o_custkey"] == dim["nk_customer_id"], "inner"
        )
        .withColumn("order_date_id", E.date_key("o_orderdate"))
        .select(
            "o_orderkey",
            "sk_customer_id",
            "nk_customer_id",
            "c_mktsegment",
            "order_date_id",
            F.col("o_totalprice").alias("amount"),
        )
    )


@_register(
    "json_flatten_struct",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           event_type,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing_field
    FROM events WHERE event_id % 10 = 0
    """,
)
def _json_flatten_struct(spark: SparkSession, sf: str) -> DataFrame:
    """F12: typed JSON flatten — from_json into a StructType + nested
    select (the reference's pd.json_normalize, schema-enforced;
    absent fields surface as typed NULLs, never errors)."""
    ev = read_table(spark, sf, "events").filter(F.col("event_id") % 10 == 0)
    props_schema = "k INT, missing INT"
    flat = ev.select(
        "event_id", F.from_json("props", props_schema).alias("p"), "event_type"
    )
    return flat.select(
        "event_id",
        F.col("p.k").alias("k"),
        "event_type",
        F.col("p.missing").alias("missing_field"),
    )


@_register(
    "scd2_order_status",
    """
    WITH o AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER w AS prev
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), runs AS (
      SELECT * FROM o WHERE prev IS NULL OR prev <> o_orderstatus
    )
    SELECT o_custkey, o_orderstatus,
           epoch_us(o_orderdate) AS valid_from_us,
           epoch_us(LEAD(o_orderdate) OVER w2) AS valid_to_us,
           LEAD(o_orderdate) OVER w2 IS NULL AS is_current,
           CAST(ROW_NUMBER() OVER w2 AS INT) AS version
    FROM runs
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def _scd2_order_status(spark: SparkSession, sf: str) -> DataFrame:
    """SCD Type-2 collapse: each customer's order-status change
    history as validity intervals (valid_from/valid_to/is_current/
    version) — the dimension-history op the reference's star schema
    (init_dwh.sql:31-114) stops short of."""
    orders = read_table(spark, sf, "orders")
    hist = TMP.scd2_collapse(
        orders,
        ["o_custkey"],
        "o_orderdate",
        ["o_orderstatus"],
        tiebreak="o_orderkey",
    )
    return hist.select(
        "o_custkey",
        "o_orderstatus",
        F.unix_micros("valid_from").alias("valid_from_us"),
        F.unix_micros("valid_to").alias("valid_to_us"),
        "is_current",
        "version",
    )


@_register(
    "rollup_hypertable",
    """
    WITH raw AS (
      SELECT event_type, epoch_us(ts) AS us,
             CAST(value AS DECIMAL(20,4)) AS dv
      FROM events
    )
    SELECT 3600 AS grain_sec, event_type,
           us - ((us % 3600000000) + 3600000000) % 3600000000 AS bucket_us,
           CAST(SUM(dv) AS DOUBLE) AS sum_value,
           CAST(MAX(dv) AS DOUBLE) AS max_value,
           COUNT(*) AS n_rows
    FROM raw GROUP BY event_type, us - ((us % 3600000000) + 3600000000) % 3600000000
    UNION ALL
    SELECT 21600, event_type, us - ((us % 21600000000) + 21600000000) % 21600000000,
           CAST(SUM(dv) AS DOUBLE), CAST(MAX(dv) AS DOUBLE), COUNT(*)
    FROM raw GROUP BY event_type, us - ((us % 21600000000) + 21600000000) % 21600000000
    UNION ALL
    SELECT 86400, event_type, us - ((us % 86400000000) + 86400000000) % 86400000000,
           CAST(SUM(dv) AS DOUBLE), CAST(MAX(dv) AS DOUBLE), COUNT(*)
    FROM raw GROUP BY event_type, us - ((us % 86400000000) + 86400000000) % 86400000000
    """,
)
def _rollup_hypertable(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable continuous aggregate at 1h/6h/1d grains: Spark
    computes coarser grains by re-aggregating the finer partials (raw
    scanned once — operators/rollup.rollup_hierarchy); the oracle
    computes every grain directly from raw, independently verifying
    the algebraic re-aggregation."""
    ev = read_table(spark, sf, "events")
    levels = RU.rollup_hierarchy(
        ev,
        "ts",
        ["event_type"],
        [3600, 21600, 86400],
        sums={"sum_value": F.col("value").cast("decimal(20,4)")},
        maxs={"max_value": F.col("value").cast("decimal(20,4)")},
    )
    frames = [
        lvl.select(
            F.lit(w).alias("grain_sec"),
            "event_type",
            "bucket_us",
            F.col("sum_value").cast("double").alias("sum_value"),
            F.col("max_value").cast("double").alias("max_value"),
            "n_rows",
        )
        for w, lvl in levels.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@_register(
    "dq_expectations",
    """
    WITH base AS (
      SELECT COUNT(*) AS total,
             SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v_nn,
             SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice < 0 THEN 1 ELSE 0 END) AS v_rng,
             SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS v_set,
             SUM(CASE WHEN o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS v_rx,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS v_uq
      FROM orders
    ), fk AS (
      SELECT COUNT(*) AS v_fk FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    )
    SELECT 'not_null' AS "check", 'o_custkey' AS "column", CAST(v_nn AS BIGINT) AS violations, total, v_nn = 0 AS pass FROM base
    UNION ALL SELECT 'range', 'o_totalprice', CAST(v_rng AS BIGINT), total, v_rng = 0 FROM base
    UNION ALL SELECT 'in_set', 'o_orderstatus', CAST(v_set AS BIGINT), total, v_set = 0 FROM base
    UNION ALL SELECT 'regex', 'o_orderpriority', CAST(v_rx AS BIGINT), total, v_rx = 0 FROM base
    UNION ALL SELECT 'unique', 'o_orderkey', CAST(v_uq AS BIGINT), total, v_uq = 0 FROM base
    UNION ALL SELECT 'fk', 'o_custkey', CAST(v_fk AS BIGINT), total, v_fk = 0 FROM base, fk
    """,
)
def _dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality checks (operators/expectations): all
    column rules in ONE aggregation pass + one anti-join for the FK
    orphan audit — the in-engine enforcement of the constraints the
    reference delegates to Postgres (init_stg.sql:195-343)."""
    orders = read_table(spark, sf, "orders")
    customer = read_table(spark, sf, "customer")
    return (
        EXP.Expectations(orders)
        .expect_not_null("o_custkey")
        .expect_range("o_totalprice", lo=0)
        .expect_in_set("o_orderstatus", ["F", "O", "P"])
        .expect_regex("o_orderpriority", "^[1-5]-")
        .expect_unique(["o_orderkey"])
        .expect_fk("o_custkey", customer, "c_custkey")
        .evaluate()
    )


@_register(
    "cdc_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)) AS price
      FROM orders WHERE o_orderkey % 97 <> 0
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(o_totalprice AS DECIMAL(15,2)) *
               CASE WHEN o_orderkey % 5 = 0 THEN CAST(1.10 AS DECIMAL(4,2))
                    ELSE CAST(1.00 AS DECIMAL(4,2)) END AS price
      FROM orders WHERE o_orderkey % 89 <> 0
    ), j AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_orderstatus AS old_status, n.o_orderstatus AS new_status,
             CAST(o.price AS DOUBLE) AS old_price,
             CAST(n.price AS DOUBLE) AS new_price,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                    OR o.price IS DISTINCT FROM n.price THEN 'update'
                  ELSE 'unchanged' END AS change_type
      FROM old o FULL OUTER JOIN new n USING (o_orderkey)
    )
    SELECT o_orderkey, change_type, old_status, new_status, old_price, new_price
    FROM j WHERE change_type <> 'unchanged'
    """,
)
def _cdc_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """CDC snapshot diff (operators/cdc.snapshot_diff): two simulated
    daily extracts of orders (disjoint modulus drops + a 10% price
    bump on every 5th key) classified into insert/update/delete in ONE
    full-outer shuffle join with null-safe value comparison. Price
    arithmetic stays in decimal so both engines agree bit-for-bit."""
    orders = read_table(spark, sf, "orders")
    price = F.col("o_totalprice").cast("decimal(15,2)")
    old = orders.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", F.col("o_orderstatus").alias("status"), price.alias("price")
    )
    bump = F.when(
        F.col("o_orderkey") % 5 == 0, F.lit("1.10").cast("decimal(4,2)")
    ).otherwise(F.lit("1.00").cast("decimal(4,2)"))
    new = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        (price * bump).alias("price"),
    )
    diff = CDC.snapshot_diff(old, new, ["o_orderkey"], ["status", "price"])
    return diff.select(
        "o_orderkey",
        "change_type",
        F.col("old_status"),
        F.col("new_status"),
        F.col("old_price").cast("double").alias("old_price"),
        F.col("new_price").cast("double").alias("new_price"),
    )


@_register(
    "cdc_apply_changes",
    """
    WITH chg AS (
      SELECT o_orderkey AS k, 1 AS seq, 'D' AS op,
             o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, 1, 'U',
             o_custkey, o_orderstatus, o_totalprice + 100, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 1
      UNION ALL
      SELECT o_orderkey, 2, 'U',
             o_custkey, o_orderstatus, o_totalprice + 200, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 14 = 1
      UNION ALL
      SELECT o_orderkey + 100000000, 1, 'U',
             o_custkey, o_orderstatus, o_totalprice + 0.5, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 2
      UNION ALL
      SELECT o_orderkey, 5, 'U',
             o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 21 = 3
      UNION ALL
      SELECT o_orderkey, 5, 'D',
             o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 21 = 3
    ), latest AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                     ORDER BY seq DESC, (op = 'D') DESC) AS rn
        FROM chg)
      WHERE rn = 1
    ), merged AS (
      SELECT b.o_orderkey, b.o_orderpriority, b.o_totalprice, b.o_orderdate
      FROM orders b LEFT JOIN latest l ON b.o_orderkey = l.k
      WHERE l.k IS NULL
      UNION ALL
      SELECT k, o_orderpriority, o_totalprice, o_orderdate
      FROM latest WHERE op <> 'D'
    )
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           epoch_us(o_orderdate) AS ts_us
    FROM merged
    """,
)
def _cdc_apply_changes(spark: SparkSession, sf: str) -> DataFrame:
    """CDC apply (operators/cdc.apply_changes): merge a change feed —
    deletes, two generations of updates (latest seq wins), inserts
    under fresh keys, and a same-seq upsert+delete tie (delete wins by
    the documented tiebreak) — into the orders snapshot. The
    latest-wins window runs over the FEED only (one small shuffle);
    the base is touched by a single left-anti join plus a union, never
    windowed or amplified. With ``snapshot_diff`` this closes the CDC
    round-trip the reference's truncate-and-reload loads cannot do."""
    orders = read_table(spark, sf, "orders")
    k = F.col("o_orderkey")
    p = F.col("o_totalprice")

    def mk(pred, seq: int, op: str, key_col, price_col):
        return orders.filter(pred).select(
            key_col.alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            price_col.alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
        )

    parts = [
        mk(k % 7 == 0, 1, "D", k, p),
        mk(k % 7 == 1, 1, "U", k, p + 100),
        mk(k % 14 == 1, 2, "U", k, p + 200),
        mk(k % 7 == 2, 1, "U", k + 100000000, p + 0.5),
        mk(k % 21 == 3, 5, "U", k, p),
        mk(k % 21 == 3, 5, "D", k, p),
    ]
    changes = parts[0]
    for part in parts[1:]:
        changes = changes.unionByName(part)
    out = CDC.apply_changes(orders, changes, ["o_orderkey"], "seq")
    return out.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.unix_micros("o_orderdate").alias("ts_us"),
    )


@_register(
    "dq_outlier_iqr",
    """
    WITH s AS (
      SELECT o_orderpriority,
             ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q1,
             ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q3,
             COUNT(*) AS n_rows
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority, q1, q3,
           q1 - 1.5 * (q3 - q1) AS fence_lo,
           q3 + 1.5 * (q3 - q1) AS fence_hi,
           n_rows,
           CAST(SUM(CASE WHEN o_totalprice < q1 - 1.5 * (q3 - q1)
                           OR o_totalprice > q3 + 1.5 * (q3 - q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM orders o JOIN s ON o.o_orderpriority IS NOT DISTINCT FROM s.o_orderpriority
    GROUP BY o.o_orderpriority, q1, q3, n_rows
    """,
)
def _dq_outlier_iqr(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-fence outlier screen per segment
    (operators/features.iqr_outliers): exact interpolated Q1/Q3
    (rounded 4 dp so fence comparisons are engine-stable), robust to
    the outliers themselves — the standard complement to the z-score
    screen. Broadcast stats join + one fact pass."""
    orders = read_table(spark, sf, "orders")
    return FT.iqr_outliers(orders, ["o_orderpriority"], "o_totalprice", k=1.5)


@_register(
    "dq_benford_totalprice",
    """
    WITH c AS (
      SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                            1, 1) AS INT) AS digit,
             COUNT(*) AS n
      FROM orders WHERE o_totalprice > 0 GROUP BY 1
    )
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
             AS observed_share,
           CAST(CASE digit
             WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939
             WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
             WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 WHEN 9 THEN 0.045757
           END AS DOUBLE) AS expected_share,
           ROUND(ABS(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
             - CAST(CASE digit
                 WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091 WHEN 3 THEN 0.124939
                 WHEN 4 THEN 0.09691 WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
                 WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153 WHEN 9 THEN 0.045757
               END AS DOUBLE)), 6) AS abs_dev
    FROM c
    """,
)
def _dq_benford_totalprice(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-digit screen (operators/profile.benford_first_digit)
    over order totals — the fraud/synthetic-data smell test. Digit
    extraction is floor→bigint→string-head (exact in both engines;
    log10-on-double digit math is not), expectations are fixed 6-dp
    literals so no libm leaks into the hash. One scan, one 9-row agg."""
    orders = read_table(spark, sf, "orders")
    return PR.benford_first_digit(orders, "o_totalprice")


@_register(
    "dq_outlier_mad",
    """
    WITH med AS (
      SELECT o_orderpriority, ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med,
             COUNT(*) AS n_rows
      FROM orders GROUP BY o_orderpriority
    ), dev AS (
      SELECT o.o_orderpriority, med, n_rows,
             ABS(o_totalprice - med) AS absdev
      FROM orders o JOIN med ON o.o_orderpriority IS NOT DISTINCT FROM med.o_orderpriority
    ), mad AS (
      SELECT o_orderpriority, ROUND(quantile_cont(absdev, 0.5), 4) AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority, med, mad, n_rows,
           CAST(SUM(CASE WHEN absdev > (3.0 * 1.4826) * mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ON d.o_orderpriority IS NOT DISTINCT FROM mad.o_orderpriority
    GROUP BY d.o_orderpriority, med, mad, n_rows
    """,
)
def _dq_outlier_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Median-absolute-deviation outlier screen per priority class
    (operators/features.mad_outliers): the 50%-breakdown robust
    complement to the Tukey-fence screen — MAD survives contamination
    that drags the quartiles themselves. Two exact-percentile passes
    with KB-sized broadcast stats; 4-dp-rounded medians keep the
    threshold comparisons engine-stable."""
    orders = read_table(spark, sf, "orders")
    return FT.mad_outliers(orders, ["o_orderpriority"], "o_totalprice", k=3.0)
