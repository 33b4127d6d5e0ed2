"""Airflow TaskFlow shell around :mod:`plans.pipeline` (SURVEY §7.1
step 10; reference dags/vcapital_warehouse/tasks/main.py:53-120).

The engine itself has NO Airflow dependency — orchestration is a thin
wrapper over the per-table unit :func:`pipeline.run_warehouse_table`.
This module reproduces the reference's DAG shape when Airflow is
importable and degrades to a clear ImportError when it is not:

- one task per warehouse table (the reference's per-table SparkSubmit
  granularity), wired dims-strictly-before-facts-before-bridge
  (reference main.py:120);
- the reference's ``incremental_mode`` Airflow Variable decides full
  vs daily-merge runs (main.py:57-63): when true, the task passes the
  logical date ``ds`` so staging slices to ds - 1 day.

No Slack/ops callbacks here (reference helper/callbacks/
slack_notifier.py) — alerting belongs to the deployment, not the
engine; Airflow's own ``on_failure_callback`` hook point is where a
deployment would attach one.
"""

from __future__ import annotations

try:  # pragma: no cover - exercised only where airflow is installed
    from airflow.decorators import dag, task  # type: ignore

    HAS_AIRFLOW = True
except ImportError:  # pragma: no cover
    HAS_AIRFLOW = False

from . import pipeline as P

# the bridge depends on both its dims; facts depend on the three dims
_UPSTREAM: dict[str, tuple[str, ...]] = {
    "dim_date": (),
    "dim_company": (),
    "dim_funds": ("dim_date",),
    "dim_people": (),
    "fct_investments": ("dim_date", "dim_company", "dim_funds"),
    "fct_ipos": ("dim_date", "dim_company"),
    "fct_acquisition": ("dim_date", "dim_company"),
    "bridge_company_people": ("dim_people", "dim_company"),
}


def build_warehouse_dag(
    staging_dir: str,
    warehouse_dir: str,
    dag_id: str = "vc_warehouse",
    schedule: str = "@daily",
    incremental_variable: str = "incremental_mode",
):
    """Return an Airflow DAG running the warehouse build, one task per
    table with the reference's dependency ordering. Requires Airflow;
    raises ImportError otherwise (the plain runner
    :func:`pipeline.run_warehouse_pipeline` needs nothing)."""
    if not HAS_AIRFLOW:
        raise ImportError(
            "apache-airflow is not installed; use "
            "pipeline.run_warehouse_pipeline for the scheduler-free runner"
        )

    @dag(dag_id=dag_id, schedule=schedule, catchup=False)
    def _warehouse_dag():
        @task
        def build_table(name: str, ds: str | None = None) -> str:
            from airflow.models import Variable  # type: ignore

            from ..session import build_session

            incremental = (
                str(Variable.get(incremental_variable, default_var="false")).lower()
                == "true"
            )
            spark = build_session(f"{dag_id}.{name}")
            P.run_warehouse_table(
                spark, name, staging_dir, warehouse_dir,
                ds=ds if incremental else None,
            )
            return name

        tasks = {
            name: build_table.override(task_id=name)(name, ds="{{ ds }}")
            for name in P.WAREHOUSE_ORDER
        }
        for name, ups in _UPSTREAM.items():
            for up in ups:
                tasks[up] >> tasks[name]

    return _warehouse_dag()
