"""Registry family: profiling (3 queries).

- profile_catalog
- profile_report_json
- profile_orders
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



@_register("profile_catalog", _profile_catalog_sql())
def _profile_catalog(spark: SparkSession, sf: str) -> DataFrame:
    """A2 catalog loop: profile_database over multiple tables — one
    scan per table, one long output frame (the reference's dynamic
    information_schema plpgsql loop, sans dynamic SQL)."""
    tables = {
        "nation": read_table(spark, sf, "nation"),
        "region": read_table(spark, sf, "region"),
    }
    # sample is array<string>; serialize for the driver's scalar-only
    # canonicalizer (array columns can't be sorted/hashed by pandas).
    # Empty sample (empty table) -> NULL, matching SQL string_agg over
    # zero rows rather than array_join's '' artifact.
    return PR.profile_database(tables=tables).withColumn(
        "sample",
        F.when(F.size("sample") > 0, F.array_join("sample", ",")),
    )


@_register("profile_report_json", _profile_report_sql())
def _profile_report_json(spark: SparkSession, sf: str) -> DataFrame:
    """A7: one-row JSON report assembly — the reference's
    JSONB_BUILD_OBJECT/JSONB_AGG (data_profiling_function.sql:104-119)
    as ``to_json(collect_list(struct))``; the oracle rebuilds the same
    JSON text character-for-character."""
    orders = read_table(spark, sf, "orders")
    return PR.profile_report_json(orders, "orders")


@_register("profile_orders", _PROFILE_SQL)
def _profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """A2-A7: single-pass per-column profile (the reference's plpgsql
    data_profile_quality() natively in Spark)."""
    orders = read_table(spark, sf, "orders")
    prof = PR.profile_table(orders, "orders")
    return prof.select(
        "table_name",
        "column_name",
        "data_type",
        "n_rows",
        "n_not_null",
        "pct_complete",
        "quality",
        "n_negative",
    )
