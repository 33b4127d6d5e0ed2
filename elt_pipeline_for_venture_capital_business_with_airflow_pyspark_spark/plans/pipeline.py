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
from pyspark.sql import functions as F

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


# incremental-merge metadata: surrogate + natural key per dim, natural
# id per fact. dim_date (static spine), dim_people and
# bridge_company_people (full-load staging inputs, see read_staging)
# rebuild wholesale every run.
_DIM_KEYS = {
    "dim_company": ("sk_company_id", "nk_company_id"),
    "dim_funds": ("sk_fund_id", "nk_fund_id"),
}
_FACT_KEYS = {
    "fct_investments": "dd_investment_id",
    "fct_ipos": "dd_ipo_id",
    "fct_acquisition": "dd_acquisition_id",
}


def run_warehouse_table(
    spark: SparkSession,
    name: str,
    staging_dir: str,
    warehouse_dir: str,
    ds: str | None = None,
) -> None:
    """Build and persist ONE warehouse table — the per-table task unit
    (the reference schedules exactly this granularity as Airflow tasks,
    main.py:53-120). Fact/bridge builders read the *persisted* dims
    from ``warehouse_dir``, so the only cross-table contract is
    ordering: dims strictly before facts (``WAREHOUSE_ORDER``).

    Full mode (``ds=None``): idempotent overwrite.

    Incremental mode (``ds`` set): staging is sliced to the day and the
    warehouse MERGES instead of overwriting — a daily run must not
    replace a table with only that day's rows:

    - sliced dims (dim_company, dim_funds): natural keys not yet in the
      warehouse are appended with surrogate keys continuing from
      ``max_key(existing)`` (the BIGSERIAL posture — existing rows keep
      their keys, so facts never dangle); known keys stay untouched;
    - facts: upsert on the natural id (rerunning a day converges
      instead of duplicating, fixing reference quirk §2.9.4);
    - dim_date / dim_people / bridge_company_people: full rebuild each
      run (static spine resp. full-load staging inputs).

    Self-referencing merges land via ``replace_parquet_atomic`` (the
    merge plan reads the same path it replaces).
    """
    from ..operators.surrogate import max_key

    staging = read_staging(spark, staging_dir, ds)
    path = f"{warehouse_dir}/{name}"

    def _persisted(table: str) -> DataFrame:
        return spark.read.parquet(f"{warehouse_dir}/{table}")

    if name == "dim_date":
        SIO.write_parquet(DDATE.build_dim_date(spark), path, mode="overwrite")
        return
    if name == "dim_people":
        SIO.write_parquet(
            WH.build_dim_people(staging["people"]), path, mode="overwrite"
        )
        return
    if name == "bridge_company_people":
        bridge = WH.build_bridge_company_people(
            staging["relationships"], _persisted("dim_people"),
            _persisted("dim_company"),
        )
        SIO.write_parquet(bridge, path, mode="overwrite")
        return

    if name in _DIM_KEYS:
        src = "company" if name == "dim_company" else "funds"

        def build_dim(src_df: DataFrame, off: int) -> DataFrame:
            if name == "dim_company":
                return WH.build_dim_company(src_df, off)
            return WH.build_dim_funds(src_df, _persisted("dim_date"), off)

        sk, nk = _DIM_KEYS[name]
        old = SIO.read_parquet_if_exists(spark, path) if ds is not None else None
        if old is None:
            SIO.write_parquet(build_dim(staging[src], 0), path, mode="overwrite")
        else:
            # anti-join BEFORE keying: replayed natural keys never burn
            # sequence numbers, and only genuinely-new rows are built.
            # No broadcast hint — AQE picks broadcast vs shuffle by the
            # dim's actual size (a 100x dim must not be force-broadcast)
            unseen = staging[src].join(
                old.select(F.col(nk).alias("object_id")),
                on="object_id",
                how="left_anti",
            )
            fresh = build_dim(unseen, max_key(old, sk))
            SIO.replace_parquet_atomic(spark, old.unionByName(fresh), path)
        return

    if name in _FACT_KEYS:
        if name == "fct_investments":
            df = WH.build_fct_investments(
                staging["investments"], staging["funding_rounds"],
                _persisted("dim_company"), _persisted("dim_funds"),
                _persisted("dim_date"),
            )
        elif name == "fct_ipos":
            df = WH.build_fct_ipos(
                staging["ipos"], _persisted("dim_company"), _persisted("dim_date")
            )
        else:
            df = WH.build_fct_acquisition(
                staging["acquisition"], _persisted("dim_company"),
                _persisted("dim_date"),
            )
        if ds is None or SIO.read_parquet_if_exists(spark, path) is None:
            SIO.write_parquet(df, path, mode="overwrite")
        else:
            merged = SIO.upsert_parquet(spark, df, path, keys=[_FACT_KEYS[name]])
            SIO.replace_parquet_atomic(spark, merged, path)
        return

    raise ValueError(f"unknown warehouse table: {name}")


def run_warehouse_pipeline(
    spark: SparkSession,
    staging_dir: str,
    warehouse_dir: str,
    ds: str | None = None,
    audit: bool = False,
    on_failure=None,
) -> dict[str, int]:
    """End-to-end staging → warehouse run: every table in
    ``WAREHOUSE_ORDER`` through :func:`run_warehouse_table`. Returns
    {table: row_count} when ``audit`` (costs one count job per table),
    else {table: -1}.

    A failed table write leaves earlier tables fully written (same
    at-least-once granularity as the reference's per-table Airflow
    tasks); reruns converge because full mode overwrites and
    incremental mode merges idempotently.

    ``on_failure``: optional callback invoked with an Airflow-shaped
    context dict (``task_id``/``dag_id``/``ds``/``exception``) when a
    table build raises — the scheduler-free twin of the DAG shell's
    ``on_failure_callback`` (see ``airflow_dag.make_failure_callback``;
    reference helper/callbacks/slack_notifier.py). The original
    exception is always re-raised.
    """
    manifest: dict[str, int] = {}
    for name in WAREHOUSE_ORDER:
        try:
            run_warehouse_table(spark, name, staging_dir, warehouse_dir, ds)
        except Exception as exc:
            if on_failure is not None:
                on_failure(
                    {
                        "task_id": name,
                        "dag_id": "run_warehouse_pipeline",
                        "ds": ds,
                        "exception": exc,
                    }
                )
            raise
        manifest[name] = (
            spark.read.parquet(f"{warehouse_dir}/{name}").count() if audit else -1
        )
    return manifest
