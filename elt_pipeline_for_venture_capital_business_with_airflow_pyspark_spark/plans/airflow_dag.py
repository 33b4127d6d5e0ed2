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

Failure alerting mirrors the reference's on-failure notifier
(helper/callbacks/slack_notifier.py:4-28, wired in
vcapital_warehouse/run.py:10-13) as an INJECTABLE callback: the
engine ships the hook point and the message formatting, the
deployment supplies the transport (Slack webhook, PagerDuty, …). The
default transport is a log line — no network dependency.
"""

from __future__ import annotations

import logging
from typing import Any, Callable

logger = logging.getLogger(__name__)

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


def format_failure_message(context: dict[str, Any]) -> str:
    """Render a task-failure notification with the same fields the
    reference's Slack message carries (task, dag, execution date, log
    url — helper/callbacks/slack_notifier.py:8-20). ``context`` is an
    Airflow callback context; missing keys degrade to ``?`` so the
    formatter never raises inside a failure handler."""
    ti = context.get("task_instance")
    task_id = getattr(ti, "task_id", context.get("task_id", "?"))
    dag_id = getattr(ti, "dag_id", context.get("dag_id", "?"))
    log_url = getattr(ti, "log_url", context.get("log_url", "?"))
    when = context.get("execution_date", context.get("ds", "?"))
    exc = context.get("exception", "?")
    return (
        f":red_circle: Task failed\n"
        f"*Task*: {task_id}\n*Dag*: {dag_id}\n"
        f"*Execution time*: {when}\n*Log url*: {log_url}\n"
        f"*Exception*: {exc}"
    )


def make_failure_callback(
    notify: Callable[[str], None] | None = None,
) -> Callable[[dict[str, Any]], None]:
    """Build an ``on_failure_callback``: formats the failure context
    and hands the message to ``notify`` (a Slack/webhook poster in a
    real deployment; defaults to an ERROR log line so the engine has
    zero network dependency). A raising ``notify`` is swallowed after
    logging — an alerting outage must never mask the task failure."""

    def _callback(context: dict[str, Any]) -> None:
        msg = format_failure_message(context)
        if notify is None:
            logger.error(msg)
            return
        try:
            notify(msg)
        except Exception:
            logger.exception("failure-notification transport raised")

    return _callback


def build_warehouse_dag(
    staging_dir: str,
    warehouse_dir: str,
    dag_id: str = "vc_warehouse",
    schedule: str = "@daily",
    incremental_variable: str = "incremental_mode",
    notify: Callable[[str], None] | None = None,
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

    on_failure = make_failure_callback(notify)

    @dag(
        dag_id=dag_id,
        schedule=schedule,
        catchup=False,
        default_args={"on_failure_callback": on_failure},
    )
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
