"""Registry family: scans (3 queries).

- scan_project_filter
- incremental_slice
- scan_schema_evolution
"""

from ._shared import *  # noqa: F401,F403
from ._shared import _register  # noqa: F401



# --- scans / projections / filters (S2, P1-P5) -----------------------------

@_register(
    "scan_project_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
    """,
)
def _scan_project_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P1/P3: projection + predicate, both pushed into the parquet scan."""
    li = read_table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") > 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@_register(
    "incremental_slice",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
    """,
)
def _incremental_slice(spark: SparkSession, sf: str) -> DataFrame:
    """P3: the reference's daily batch slice (created_at::DATE = ds-1)."""
    ev = read_table(spark, sf, "events")
    return INC.incremental_slice(ev, "ts", "2024-01-16", lag_days=1).select(
        "event_id", "user_id", "event_type", "value"
    )


@_register(
    "scan_schema_evolution",
    """
    SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(text) AS BIGINT) AS n_with_text
    FROM documents WHERE doc_id IS NOT NULL
    GROUP BY 1
    """,
)
def _scan_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-drift-tolerant scan (sources/io.read_parquet_evolving):
    a lake directory whose schema WIDENED over time — here an early
    batch written without `lang` and a later batch with it — must
    still scan as one table, with the missing column surfacing as
    typed NULLs in pre-widening files (the mergeSchema footer union,
    Delta/Iceberg's add-column evolution on plain parquet). The entry
    writes both generations into one directory every run (overwrite +
    append — no stale-cache skip), reads them through the evolving
    reader, and aggregates by the evolved column; the oracle states
    the same result from the split law (even doc_ids = the legacy
    batch → NULL lang). The hot path stays the explicit-schema
    read_table — footer merging costs a metadata pass, paid only when
    drift is real."""
    import os

    docs = (
        read_table(spark, sf, "documents")
        .filter(F.col("doc_id").isNotNull())
    )
    base = "/tmp/spark_graft_evolve_" + os.path.basename(os.path.normpath(sf))
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", "text")
        .write.mode("overwrite")
        .parquet(base)
    )
    (
        docs.filter(F.col("doc_id") % 2 != 0)
        .select("doc_id", "text", "lang")
        .write.mode("append")
        .parquet(base)
    )
    evolved = SIO.read_parquet_evolving(spark, base)
    return evolved.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("text").alias("n_with_text"),
    )
