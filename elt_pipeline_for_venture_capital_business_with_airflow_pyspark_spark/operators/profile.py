"""Data-profiling operator (SURVEY.md §2.4 A2-A7, §3.3).

The reference computes per-column completeness / negative-value /
sample stats in ~130 lines of dynamic plpgsql executing inside
Postgres (reference: dags/data_profiling/query/data_profiling_function.sql:2-133),
one dynamic SQL statement per column — O(columns) table scans.

Here the whole profile is ONE Spark aggregation pass per table
(single scan, map-side partial aggregation, no shuffle beyond the
final 1-row combine), then unpivoted to one row per column. That is
the shape that survives 100 TB: cost = one read of the table.

Output schema (long format, one row per column):
    table_name, column_name, data_type, n_rows, n_not_null,
    pct_complete (2dp), quality (Good/Bad @90%), n_negative
    (numeric cols, else NULL), sample (≤5 smallest distinct values,
    stringified)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, table_name: str) -> DataFrame:
    """Single-pass profile of ``df`` — reproduces the reference's
    data_profile_quality() per-column metrics (completeness % with the
    90% Good/Bad threshold, negative-value count for numeric columns,
    top-5 distinct sample) natively in Spark.

    The sample is the 5 *smallest* distinct values (sorted collect_set
    slice) so results are deterministic, unlike the reference's
    unordered ``LIMIT 5`` (data_profiling_function.sql:57-69).
    """
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n_rows")]
    for field in df.schema.fields:
        c = F.col(field.name)
        aggs.append(F.count(c).alias(f"__nn_{field.name}"))  # count() skips nulls (A4)
        if isinstance(field.dataType, _NUMERIC_TYPES):
            aggs.append(
                F.sum(F.when(c < 0, 1).otherwise(0)).alias(f"__neg_{field.name}")
            )
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__neg_{field.name}"))
        aggs.append(
            F.slice(F.array_sort(F.collect_set(c.cast("string"))), 1, 5).alias(
                f"__sample_{field.name}"
            )
        )
    wide = df.agg(*aggs)

    per_col = []
    for field in df.schema.fields:
        nn = F.col(f"__nn_{field.name}")
        n = F.col("__n_rows")
        # NULL (not a crash) on the empty table: an empty daily slice
        # is a legitimate profiling input; NULL pct renders NaN through
        # pandas exactly like DuckDB's 0/0, and the 90% gate then
        # classifies the column 'Bad' in both engines
        pct = F.when(n > 0, F.round(nn * 100.0 / n, 2))
        per_col.append(
            F.struct(
                F.lit(field.name).alias("column_name"),
                F.lit(field.dataType.simpleString()).alias("data_type"),
                n.alias("n_rows"),
                nn.alias("n_not_null"),
                pct.alias("pct_complete"),
                # 90% Good/Bad threshold (data_profiling_function.sql:96-101)
                F.when(pct > 90.0, F.lit("Good")).otherwise(F.lit("Bad")).alias("quality"),
                F.col(f"__neg_{field.name}").alias("n_negative"),
                F.col(f"__sample_{field.name}").alias("sample"),
            )
        )
    return (
        wide.select(F.explode(F.array(*per_col)).alias("p"))
        .select(F.lit(table_name).alias("table_name"), "p.*")
    )


def profile_database(
    tables: dict[str, DataFrame] | None = None,
    spark=None,
    database: str | None = None,
) -> DataFrame:
    """Profile a whole catalog — the reference's dynamic loop over
    information_schema (A2, data_profiling_function.sql:29-35) without
    the dynamic SQL: pass either an explicit {name: DataFrame} dict or
    a SparkSession (+ optional database) to enumerate
    ``spark.catalog.listTables``. Per-table profiles are unioned into
    one long frame; each table still costs exactly one scan, and the
    per-table agg jobs are independent (submit with a FAIR scheduler
    pool for overlap at cluster scale).
    """
    if tables is None:
        if spark is None:
            raise ValueError("pass tables= or spark=")
        names = [t.name for t in spark.catalog.listTables(database)]
        tables = {n: spark.table(n) for n in names}
    profiles = [profile_table(df, name) for name, df in tables.items()]
    if not profiles:
        raise ValueError("no tables to profile")
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


def profile_report_json(df: DataFrame, table_name: str) -> DataFrame:
    """One-row JSON report per table — the reference's
    JSONB_BUILD_OBJECT/JSONB_AGG assembly (A7,
    data_profiling_function.sql:104-119) as ``to_json(collect_list(struct))``."""
    prof = profile_table(df, table_name)
    return prof.groupBy("table_name").agg(
        F.first("n_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_cols"),
        # NULL report on the empty table (no data, no profile — the
        # row still carries n_rows=0 / n_cols), matching the SQL
        # string_agg-over-nothing shape of the oracle
        F.when(
            F.first("n_rows") > 0,
            F.to_json(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "column_name",
                            "data_type",
                            "pct_complete",
                            "quality",
                            "n_negative",
                        )
                    )
                )
            ),
        ).alias("data_profile"),
    )


# log10(1 + 1/d) to 6 dp, as fixed literals: computing them with the
# engine's own log10 would let libm last-ulp differences leak into the
# oracle hash, and Benford's constants are constants.
_BENFORD_EXPECTED = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


def benford_first_digit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-digit screen over a positive numeric column
    — the classic fraud/synthetic-data smell test for financial facts.

    Returns one row per leading digit with the observed share and the
    deviation from the Benford expectation. The digit is taken from
    the integer part via string head (``floor`` then cast — exact in
    both engines, unlike ``log10``-based digit math on doubles). One
    aggregation pass; the share divides by a windowed total over the
    9-row digit frame, which is post-aggregation and therefore free.
    """
    digit = F.substring(F.floor(F.col(col)).cast("long").cast("string"), 1, 1)
    counts = (
        df.filter(F.col(col) > 0)
        .groupBy(digit.cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = F.sum("n").over(Window.partitionBy())
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _BENFORD_EXPECTED.items() for x in kv]
        ),
        F.col("digit"),
    )
    return counts.select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / total.cast("double"), 6).alias(
            "observed_share"
        ),
        expected.alias("expected_share"),
        F.round(
            F.abs(F.col("n").cast("double") / total.cast("double") - expected), 6
        ).alias("abs_dev"),
    )
