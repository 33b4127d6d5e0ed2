"""Orchestration shell (SURVEY.md §7.1 step 10).

The reference drives its warehouse with an Airflow DAG — per-table
SparkSubmit tasks, ExternalTaskSensors, and a hard dims-before-facts
ordering (reference: dags/vcapital_warehouse/tasks/main.py:53-120,
ordering at :120). Here orchestration is a thin, dependency-ordered
composition of the pure builder functions: one SparkSession, one
lazily-built logical plan per table, writes as the only actions. Any
external scheduler (Airflow TaskFlow, cron, a driver notebook) can
call these functions directly — there is nothing Airflow-specific to
port.

Differences from the reference, by design (SURVEY.md §2.9):
- writes are idempotent overwrites, not blind appends (quirk .4);
- incremental mode filters on the SAME path the full load uses, so the
  incremental/full path mismatch bug (quirk .3) cannot exist;
- dim_people and bridge_company_people are built (quirk .6 — declared
  in the reference DDL but never implemented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..sources import io as SIO
from ..streaming.incremental import incremental_slice
from . import dim_date as DDATE
from . import warehouse as WH

# staging tables the warehouse consumes, in read order
STAGING_INPUTS = (
    "company", "funds", "funding_rounds", "investments",
    "ipos", "acquisition", "people", "relationships",
)

# build order: dims strictly before facts (reference main.py:120)
WAREHOUSE_ORDER = (
    "dim_date", "dim_company", "dim_funds", "dim_people",
    "fct_investments", "fct_ipos", "fct_acquisition",
    "bridge_company_people",
)


def read_staging(
    spark: SparkSession, staging_dir: str, ds: str | None = None
) -> dict[str, DataFrame]:
    """Read the staging zone with enforced schemas. With ``ds`` set,
    tables carrying a timestamp ``created_at`` are sliced to
    created_at::date == ds - 1 day (P3, the reference's daily
    incremental predicate) — pushed into the scan. Tables without a
    typed created_at (people; relationships' is a dirty varchar,
    init_stg.sql:158-171) always load in full, as in the reference.
    """
    from pyspark.sql import types as T

    out: dict[str, DataFrame] = {}
    for name in STAGING_INPUTS:
        schema = schemas.STAGING[name]
        df = SIO.read_parquet(spark, f"{staging_dir}/{name}", schema=schema)
        has_ts_created = any(
            f.name == "created_at" and isinstance(f.dataType, T.TimestampType)
            for f in schema.fields
        )
        if ds is not None and has_ts_created:
            df = incremental_slice(df, "created_at", ds, lag_days=1)
        out[name] = df
    return out


def build_warehouse(
    spark: SparkSession, staging: dict[str, DataFrame]
) -> dict[str, DataFrame]:
    """Compose all warehouse tables as lazy DataFrames, dependency-
    ordered. Nothing executes here — callers write or collect."""
    dim_date = DDATE.build_dim_date(spark)
    dim_company = WH.build_dim_company(staging["company"])
    dim_funds = WH.build_dim_funds(staging["funds"], dim_date)
    dim_people = WH.build_dim_people(staging["people"])
    tables: dict[str, DataFrame] = {
        "dim_date": dim_date,
        "dim_company": dim_company,
        "dim_funds": dim_funds,
        "dim_people": dim_people,
        "fct_investments": WH.build_fct_investments(
            staging["investments"], staging["funding_rounds"],
            dim_company, dim_funds, dim_date,
        ),
        "fct_ipos": WH.build_fct_ipos(staging["ipos"], dim_company, dim_date),
        "fct_acquisition": WH.build_fct_acquisition(
            staging["acquisition"], dim_company, dim_date
        ),
        "bridge_company_people": WH.build_bridge_company_people(
            staging["relationships"], dim_people, dim_company
        ),
    }
    return {name: tables[name] for name in WAREHOUSE_ORDER}


def run_warehouse_pipeline(
    spark: SparkSession,
    staging_dir: str,
    warehouse_dir: str,
    ds: str | None = None,
    audit: bool = False,
) -> dict[str, int]:
    """End-to-end staging → warehouse run: read, build, write each
    table as an idempotent parquet overwrite under
    ``{warehouse_dir}/{table}``. Returns {table: row_count} when
    ``audit`` (costs one count job per table), else {table: -1}.

    A failed table write leaves earlier tables fully written (same
    at-least-once granularity as the reference's per-table Airflow
    tasks); reruns converge because writes overwrite.
    """
    staging = read_staging(spark, staging_dir, ds)
    tables = build_warehouse(spark, staging)
    manifest: dict[str, int] = {}
    for name, df in tables.items():
        SIO.write_parquet(df, f"{warehouse_dir}/{name}", mode="overwrite")
        manifest[name] = (
            spark.read.parquet(f"{warehouse_dir}/{name}").count() if audit else -1
        )
    return manifest
