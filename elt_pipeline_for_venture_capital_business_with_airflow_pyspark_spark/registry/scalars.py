"""Registry family: scalars (12 queries).

- scalar_clean_address
- scalar_to_usd
- scalar_entity_type
- scalar_null_concat
- scalar_normalize_null_if_empty
- scalar_part_suite
- scalar_newline_scrub
- scalar_try_cast_dirty
- scalar_to_usd_join
- scalar_date_arith
- scalar_pseudonymize_join
- scalar_array_hof
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- scalar suites (F1-F10) ---------------------------------------------------

@_register(
    "scalar_clean_address",
    r"""
    WITH dirty AS (
      SELECT p_partkey,
             CASE p_partkey % 6
               WHEN 0 THEN '#' || p_name
               WHEN 1 THEN '..' || p_name
               WHEN 2 THEN '??'
               WHEN 3 THEN '323'
               WHEN 4 THEN ' b '
               ELSE upper(p_name)
             END AS address1
      FROM part
    ), cleaned AS (
      SELECT p_partkey, address1,
             regexp_replace(lower(address1), '^[#.]+', '') AS c1
      FROM dirty
    )
    SELECT p_partkey, address1,
           CASE WHEN regexp_matches(c1, '^[\W\d_]+$') OR length(trim(c1)) <= 2
                THEN NULL ELSE trim(c1) END AS address_cleaned
    FROM cleaned
    """,
)
def _scalar_clean_address(spark: SparkSession, sf: str) -> DataFrame:
    """F1: clean_address over synthesized dirty strings exercising every
    branch (leading #/., symbol-only, digits-only, too-short, valid)."""
    part = read_table(spark, sf, "part")
    addr = (
        F.when(F.col("p_partkey") % 6 == 0, F.concat(F.lit("#"), F.col("p_name")))
        .when(F.col("p_partkey") % 6 == 1, F.concat(F.lit(".."), F.col("p_name")))
        .when(F.col("p_partkey") % 6 == 2, F.lit("??"))
        .when(F.col("p_partkey") % 6 == 3, F.lit("323"))
        .when(F.col("p_partkey") % 6 == 4, F.lit(" b "))
        .otherwise(F.upper(F.col("p_name")))
    )
    return part.select(
        "p_partkey",
        addr.alias("address1"),
        E.clean_address(addr).alias("address_cleaned"),
    )


@_register(
    "scalar_to_usd",
    """
    WITH cur AS (
      -- o_totalprice carries 3 true decimals → DECIMAL(18,3) cast is
      -- exact in both engines (a scale-2 cast would round and engines
      -- disagree on double rounding ties)
      SELECT o_orderkey,
             ['USD','CAD','EUR','SEK','AUD','JPY','GBP','NIS','IDR'][(o_orderkey % 9) + 1] AS currency,
             CAST(o_totalprice AS DECIMAL(18,3)) AS amount
      FROM orders
    )
    SELECT o_orderkey, currency,
           CAST(ROUND(CASE currency
             WHEN 'USD' THEN amount * CAST(1.0   AS DECIMAL(6,4))
             WHEN 'CAD' THEN amount * CAST(0.72  AS DECIMAL(6,4))
             WHEN 'EUR' THEN amount * CAST(1.14  AS DECIMAL(6,4))
             WHEN 'SEK' THEN amount * CAST(0.10  AS DECIMAL(6,4))
             WHEN 'AUD' THEN amount * CAST(0.64  AS DECIMAL(6,4))
             WHEN 'JPY' THEN amount * CAST(0.007 AS DECIMAL(6,4))
             WHEN 'GBP' THEN amount * CAST(1.33  AS DECIMAL(6,4))
             WHEN 'NIS' THEN amount * CAST(0.28  AS DECIMAL(6,4))
             ELSE amount END, 2) AS DOUBLE) AS amount_usd
    FROM cur
    """,
)
def _scalar_to_usd(spark: SparkSession, sf: str) -> DataFrame:
    """F2: currency CASE conversion (decimal-exact oracle variant of
    the reference's to_usd; unknown currency passes through)."""
    orders = read_table(spark, sf, "orders")
    codes = list(E.FX_RATES) + ["IDR"]
    currency = F.element_at(
        F.array(*[F.lit(c) for c in codes]), (F.col("o_orderkey") % 9 + 1).cast("int")
    )
    df = orders.select("o_orderkey", currency.alias("currency"), "o_totalprice")
    return df.select(
        "o_orderkey",
        "currency",
        E.to_usd_exact("currency", "o_totalprice").alias("amount_usd"),
    )


@_register(
    "scalar_entity_type",
    """
    WITH objs AS (
      SELECT c_custkey,
             CASE c_custkey % 3 WHEN 0 THEN 'c:' || c_custkey
                                WHEN 1 THEN 'f:' || c_custkey
                                ELSE 'p:' || c_custkey END AS object_id
      FROM customer
    )
    SELECT c_custkey, object_id,
           CASE WHEN starts_with(object_id, 'c:') THEN 'company'
                WHEN starts_with(object_id, 'f:') THEN 'fund'
                ELSE NULL END AS entity_type
    FROM objs
    """,
)
def _scalar_entity_type(spark: SparkSession, sf: str) -> DataFrame:
    """F3: prefix-dispatch classifier."""
    customer = read_table(spark, sf, "customer")
    obj = (
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("c:"), F.col("c_custkey").cast("string")),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(F.lit("f:"), F.col("c_custkey").cast("string")),
        )
        .otherwise(F.concat(F.lit("p:"), F.col("c_custkey").cast("string")))
    )
    return customer.select(
        "c_custkey", obj.alias("object_id"), E.entity_type(obj).alias("entity_type")
    )


@_register(
    "scalar_null_concat",
    """
    WITH pairs AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 4 = 0 THEN NULL
                  WHEN p_partkey % 4 = 1 THEN '' ELSE p_brand END AS a1,
             CASE WHEN p_partkey % 5 = 0 THEN NULL
                  WHEN p_partkey % 5 = 1 THEN '' ELSE p_type END AS a2
      FROM part
    )
    SELECT p_partkey, a1, a2,
           CASE WHEN a1 IS NULL AND a2 IS NULL THEN NULL
                WHEN a1 IS NULL OR a1 = '' THEN a2
                WHEN a2 IS NULL OR a2 = '' THEN a1
                ELSE a1 || ', ' || a2 END AS full_address
    FROM pairs
    """,
)
def _scalar_null_concat(spark: SparkSession, sf: str) -> DataFrame:
    """F4: null-aware two-part concat (full_address semantics)."""
    part = read_table(spark, sf, "part")
    a1 = (
        F.when(F.col("p_partkey") % 4 == 0, F.lit(None).cast("string"))
        .when(F.col("p_partkey") % 4 == 1, F.lit(""))
        .otherwise(F.col("p_brand"))
    )
    a2 = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("p_partkey") % 5 == 1, F.lit(""))
        .otherwise(F.col("p_type"))
    )
    return part.select(
        "p_partkey",
        a1.alias("a1"),
        a2.alias("a2"),
        E.concat_address(a1, a2).alias("full_address"),
    )


@_register(
    "scalar_normalize_null_if_empty",
    """
    SELECT p_partkey,
           CASE WHEN trim(lower(CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE '  ' || p_name || ' ' END)) = ''
                THEN NULL
                ELSE trim(lower(CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE '  ' || p_name || ' ' END)) END AS name_norm,
           CASE WHEN trim(upper(CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE ' ' || p_brand || '  ' END)) = ''
                THEN NULL
                ELSE trim(upper(CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE ' ' || p_brand || '  ' END)) END AS brand_norm
    FROM part
    """,
)
def _scalar_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """F5: trim/lower/upper normalization with ''→NULL."""
    part = read_table(spark, sf, "part")
    padded_name = F.when(F.col("p_partkey") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))
    )
    padded_brand = F.when(F.col("p_partkey") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit(" "), F.col("p_brand"), F.lit("  "))
    )
    return part.select(
        "p_partkey",
        E.normalize_lower(padded_name).alias("name_norm"),
        E.normalize_upper(padded_brand).alias("brand_norm"),
    )


@_register(
    "scalar_part_suite",
    r"""
    WITH src AS (
      SELECT p_partkey,
             CASE p_partkey % 6
               WHEN 0 THEN '#' || p_name
               WHEN 1 THEN '..' || p_name
               WHEN 2 THEN '??'
               WHEN 3 THEN '323'
               WHEN 4 THEN ' b '
               ELSE upper(p_name)
             END AS address1,
             CASE WHEN p_partkey % 4 = 0 THEN NULL
                  WHEN p_partkey % 4 = 1 THEN '' ELSE p_brand END AS a1,
             CASE WHEN p_partkey % 5 = 0 THEN NULL
                  WHEN p_partkey % 5 = 1 THEN '' ELSE p_type END AS a2,
             CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE '  ' || p_name || ' ' END AS padded_name,
             CASE WHEN p_partkey % 7 = 0 THEN '   ' ELSE ' ' || p_brand || '  ' END AS padded_brand,
             p_name || chr(10) || p_brand || chr(10) AS dirty
      FROM part
    ), c AS (
      SELECT *, regexp_replace(lower(address1), '^[#.]+', '') AS c1 FROM src
    )
    SELECT p_partkey, address1,
           CASE WHEN regexp_matches(c1, '^[\W\d_]+$') OR length(trim(c1)) <= 2
                THEN NULL ELSE trim(c1) END AS address_cleaned,
           a1, a2,
           CASE WHEN a1 IS NULL AND a2 IS NULL THEN NULL
                WHEN a1 IS NULL OR a1 = '' THEN a2
                WHEN a2 IS NULL OR a2 = '' THEN a1
                ELSE a1 || ', ' || a2 END AS full_address,
           CASE WHEN trim(lower(padded_name)) = '' THEN NULL
                ELSE trim(lower(padded_name)) END AS name_norm,
           CASE WHEN trim(upper(padded_brand)) = '' THEN NULL
                ELSE trim(upper(padded_brand)) END AS brand_norm,
           dirty,
           replace(dirty, chr(10), ' ') AS scrubbed
    FROM c
    """,
)
def _scalar_part_suite(spark: SparkSession, sf: str) -> DataFrame:
    """F1+F4+F5+F6 in one projection over part: clean_address,
    null-aware concat, trim/lower/upper ''→NULL normalization, and the
    newline scrub — one scan exercising every string-cleaning builder
    (the reference applies these per-column in extract_transform.py /
    helper/transform.py; here they compose in a single narrow stage).
    The single-function variants stay registered past the driver
    window for targeted debugging."""
    part = read_table(spark, sf, "part")
    addr = (
        F.when(F.col("p_partkey") % 6 == 0, F.concat(F.lit("#"), F.col("p_name")))
        .when(F.col("p_partkey") % 6 == 1, F.concat(F.lit(".."), F.col("p_name")))
        .when(F.col("p_partkey") % 6 == 2, F.lit("??"))
        .when(F.col("p_partkey") % 6 == 3, F.lit("323"))
        .when(F.col("p_partkey") % 6 == 4, F.lit(" b "))
        .otherwise(F.upper(F.col("p_name")))
    )
    a1 = (
        F.when(F.col("p_partkey") % 4 == 0, F.lit(None).cast("string"))
        .when(F.col("p_partkey") % 4 == 1, F.lit(""))
        .otherwise(F.col("p_brand"))
    )
    a2 = (
        F.when(F.col("p_partkey") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("p_partkey") % 5 == 1, F.lit(""))
        .otherwise(F.col("p_type"))
    )
    padded_name = F.when(F.col("p_partkey") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))
    )
    padded_brand = F.when(F.col("p_partkey") % 7 == 0, F.lit("   ")).otherwise(
        F.concat(F.lit(" "), F.col("p_brand"), F.lit("  "))
    )
    dirty = F.concat(F.col("p_name"), F.lit("\n"), F.col("p_brand"), F.lit("\n"))
    return part.select(
        "p_partkey",
        addr.alias("address1"),
        E.clean_address(addr).alias("address_cleaned"),
        a1.alias("a1"),
        a2.alias("a2"),
        E.concat_address(a1, a2).alias("full_address"),
        E.normalize_lower(padded_name).alias("name_norm"),
        E.normalize_upper(padded_brand).alias("brand_norm"),
        dirty.alias("dirty"),
        E.scrub_newlines(dirty).alias("scrubbed"),
    )


# --- scalar additions (F6) ----------------------------------------------------

@_register(
    "scalar_newline_scrub",
    """
    SELECT p_partkey,
           p_name || chr(10) || p_brand || chr(10) AS dirty,
           replace(p_name || chr(10) || p_brand || chr(10), chr(10), ' ') AS scrubbed
    FROM part
    """,
)
def _scalar_newline_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """F6: the newline scrub the reference applies to every string
    column before landing parquet (extract.py:62-64)."""
    part = read_table(spark, sf, "part")
    dirty = F.concat(F.col("p_name"), F.lit("\n"), F.col("p_brand"), F.lit("\n"))
    return part.select(
        "p_partkey", dirty.alias("dirty"), E.scrub_newlines(dirty).alias("scrubbed")
    )


@_register(
    "scalar_try_cast_dirty",
    """
    WITH dirty AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
                  WHEN o_orderkey % 3 = 1 THEN 'n/a'
                  ELSE '' END AS qty_str,
             CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
                  ELSE 'bad-date' END AS date_str
      FROM orders
    )
    SELECT o_orderkey,
           TRY_CAST(qty_str AS BIGINT) AS qty,
           CAST(strftime(TRY_CAST(date_str AS DATE), '%Y%m%d') AS INT) AS date_id
    FROM dirty
    """,
)
def _scalar_try_cast_dirty(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's ELT 'land raw, type later' contract
    (init_stg.sql:158-187 stores dates/bools as varchar): dirty
    strings typed with try_cast — unparseable/empty → NULL, never a
    job failure (quirk-free replacement for rigid CAST)."""
    orders = read_table(spark, sf, "orders")
    dirty = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string"))
        .when(F.col("o_orderkey") % 3 == 1, F.lit("n/a"))
        .otherwise(F.lit(""))
        .alias("qty_str"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        .otherwise(F.lit("bad-date"))
        .alias("date_str"),
    )
    return dirty.select(
        "o_orderkey",
        F.expr("try_cast(qty_str AS BIGINT)").alias("qty"),
        E.try_date_key(F.expr("try_cast(date_str AS DATE)")).alias("date_id"),
    )


@_register(
    "scalar_to_usd_join",
    """
    WITH rates(currency, fx) AS (
      VALUES ('USD', 1.00), ('CAD', 0.72), ('EUR', 1.14), ('SEK', 0.10),
             ('AUD', 0.64), ('JPY', 0.007), ('GBP', 1.33), ('NIS', 0.28)
    ), src AS (
      SELECT o_orderkey,
             CASE o_orderkey % 9
               WHEN 0 THEN 'USD' WHEN 1 THEN 'CAD' WHEN 2 THEN 'EUR'
               WHEN 3 THEN 'SEK' WHEN 4 THEN 'AUD' WHEN 5 THEN 'JPY'
               WHEN 6 THEN 'GBP' WHEN 7 THEN 'NIS' ELSE 'XXX' END AS currency,
             o_totalprice AS amount
      FROM orders
    )
    SELECT o_orderkey, currency,
           CAST(ROUND(CAST(COALESCE(fx, 1.0) AS DECIMAL(10,4))
                      * CAST(amount AS DECIMAL(15,2)), 2) AS DOUBLE) AS usd
    FROM src LEFT JOIN rates USING (currency)
    """,
)
def _scalar_to_usd_join(spark: SparkSession, sf: str) -> DataFrame:
    """F2 (to_usd) as a data-driven broadcast rates join — the
    SURVEY-noted upgrade over the hardcoded CASE chain
    (helper/transform.py:104-112): same semantics (unknown currency →
    amount unchanged, HALF_UP round to 2), but rates live in a
    dimension that ops can update without code changes."""
    orders = read_table(spark, sf, "orders")
    rates = spark.createDataFrame(
        [("USD", "1.00"), ("CAD", "0.72"), ("EUR", "1.14"), ("SEK", "0.10"),
         ("AUD", "0.64"), ("JPY", "0.007"), ("GBP", "1.33"), ("NIS", "0.28")],
        ["currency", "fx_s"],
    ).select("currency", F.col("fx_s").cast("decimal(10,4)").alias("fx"))
    src = orders.select(
        "o_orderkey",
        F.element_at(
            F.array(*[F.lit(c) for c in
                      ["USD", "CAD", "EUR", "SEK", "AUD", "JPY", "GBP", "NIS", "XXX"]]),
            (F.col("o_orderkey") % 9 + 1).cast("int"),
        ).alias("currency"),
        F.col("o_totalprice").alias("amount"),
    )
    joined = src.join(F.broadcast(rates), "currency", "left")
    usd = F.round(
        F.coalesce(F.col("fx"), F.lit(1.0).cast("decimal(10,4)"))
        * F.col("amount").cast("decimal(15,2)"),
        2,
    ).cast("double")
    return joined.select("o_orderkey", "currency", usd.alias("usd"))


@_register(
    "scalar_date_arith",
    """
    SELECT o_orderkey,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_epoch_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
             AS plus3m,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
             AS month_start,
           CAST(date_part('dow', CAST(o_orderdate AS DATE)) AS INT) AS dow
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1995-03-01'
    """,
)
def _scalar_date_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Date-arithmetic suite: day diffs, calendar-month addition
    (add_months clamps like DuckDB's INTERVAL MONTH), month boundaries
    via last_day/date_trunc, and day-of-week — normalized to DuckDB's
    Sunday=0 convention (Spark dayofweek is Sunday=1). All pure
    expressions pushed onto one filtered scan; the reference's
    date-handling surface (F7/F10) beyond the dim-date attributes."""
    orders = read_table(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.filter(
        F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp")
    ).select(
        "o_orderkey",
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.trunc(d, "month").alias("month_start"),
        (F.dayofweek(d) - F.lit(1)).cast("int").alias("dow"),
    )


@_register(
    "scalar_pseudonymize_join",
    """
    WITH c AS (
      SELECT sha256('pepper-2026' || CAST(c_custkey AS VARCHAR)) AS cust_token,
             c_mktsegment
      FROM customer
    ), o AS (
      SELECT sha256('pepper-2026' || CAST(o_custkey AS VARCHAR)) AS cust_token,
             o_totalprice
      FROM orders
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(COUNT(DISTINCT c.cust_token) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,4))) AS DOUBLE) AS total
    FROM o JOIN c USING (cust_token)
    GROUP BY c.c_mktsegment
    """,
)
def _scalar_pseudonymize_join(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic pseudonymization that preserves joinability: the
    customer key is replaced by sha256(pepper || key) on BOTH sides,
    so fact⋈dim joins and distinct-entity counts still work while the
    raw identifier never leaves the trust boundary — the standard
    privacy posture for training-data pipelines (pair with
    functions/text.pii_scrub for free-text). The pepper makes the
    token non-invertible by rainbow table; rotating it re-keys the
    whole corpus. Pure codegen'd expressions; the join behaves exactly
    like the raw-key join (verified: same group counts/sums as
    joining on c_custkey directly)."""
    cust = read_table(spark, sf, "customer")
    orders = read_table(spark, sf, "orders")
    tok = lambda c: F.sha2(F.concat(F.lit("pepper-2026"), F.col(c).cast("string")), 256)
    c = cust.select(tok("c_custkey").alias("cust_token"), "c_mktsegment")
    o = orders.select(tok("o_custkey").alias("cust_token"), "o_totalprice")
    return (
        o.join(c, "cust_token")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("cust_token").cast("long").alias("n_customers"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
    )


@_register(
    "scalar_array_hof",
    rf"""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(len(list_filter(toks, t -> length(t) > 5)) AS INT) AS n_long,
           CAST(COALESCE(
                list_aggregate(list_transform(toks, t -> length(t)), 'sum'),
                0) AS BIGINT) AS total_chars,
           CAST(list_aggregate(list_transform(toks, t -> length(t)), 'max')
                AS INT) AS max_tok_len
    FROM (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents)
    ORDER BY doc_id
    """,
)
def _scalar_array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """Array higher-order functions — transform / filter / aggregate
    lambdas evaluated JVM-side per row, zero shuffles, zero Python.
    The same HOF family powers the similarity operators' dot
    products; this query pins the integer-exact surface (token
    counts, length filter, fold-sum, fold-max) against DuckDB's
    list_* twins. At scale this is a pure map stage."""
    docs = read_table(spark, sf, "documents")
    toks = TX.tokens("text")
    lens = F.transform(toks, lambda t: F.length(t))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
        F.coalesce(
            F.aggregate(lens, F.lit(0).cast("long"), lambda acc, x: acc + x),
            F.lit(0).cast("long"),
        ).alias("total_chars"),
        F.aggregate(
            lens,
            F.lit(None).cast("int"),
            lambda acc, x: F.when(acc.isNull() | (x > acc), x).otherwise(acc),
        ).alias("max_tok_len"),
    ).orderBy("doc_id")
