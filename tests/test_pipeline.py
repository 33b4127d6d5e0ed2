"""End-to-end orchestration-shell test: fixture staging zone →
run_warehouse_pipeline → warehouse parquet, asserting dependency
ordering output, FK-filter semantics, idempotent reruns, and the
incremental slice path."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import schemas
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
    pipeline as P,
)

TS = dt.datetime(2013, 7, 1, 12, 0, 0)
TS_OLD = dt.datetime(2013, 6, 1, 12, 0, 0)
D = dt.date(2013, 7, 1)


@pytest.fixture(scope="module")
def staging_dir(spark, tmp_path_factory):
    """Minimal but fully-linked VC universe: 2 companies + 1 fund
    entity, a fund, a funding round, 2 investments (one orphaned on a
    missing company), an IPO, an acquisition, a person + relationship."""
    root = tmp_path_factory.mktemp("staging")
    rows = {
        "company": [
            (1, "c:1", None, "west", "1 Main St", None, "sf", None, None, "us", None, None, TS, TS),
            (2, "c:2", None, "east", "2 Side St", None, "ny", None, None, "us", None, None, TS_OLD, TS_OLD),
            (3, "f:1", None, None, None, None, None, None, None, None, None, None, TS, TS),
        ],
        "funds": [
            ("10", "f:1", " Fund One ", D, Decimal("100.00"), "EUR", None, "desc", TS, TS),
        ],
        "funding_rounds": [
            (100, "c:1", D, "series-a", "a", Decimal("5.00"), Decimal("5.00"), "USD",
             None, None, None, None, None, None, "3", True, False, None, TS, TS),
        ],
        "investments": [
            (1000, 100, "c:1", "f:1", TS, TS),
            (1001, 100, "c:missing", "f:1", TS, TS),  # orphan → dropped
        ],
        "ipos": [
            ("500", "c:1", Decimal("1000.00"), "USD", Decimal("10.00"), "USD",
             TS, "ABC", None, "ipo desc", TS, TS),
        ],
        "acquisition": [
            (700, "c:1", "c:2", "cash", Decimal("50.00"), "USD", TS, None, "deal", TS, TS),
        ],
        "people": [
            ("p1", "p:1", "Ada", "Lovelace", None, "c:1"),
        ],
        "relationships": [
            ("r1", "p:1", "c:1", "2010-01-01", None, "false", "1", "CEO",
             "2013-07-01 12:00:00", "2013-07-01 12:00:00"),
        ],
    }
    for name, data in rows.items():
        spark.createDataFrame(data, schema=schemas.STAGING[name]).write.mode(
            "overwrite"
        ).parquet(f"{root}/{name}")
    return str(root)


def test_pipeline_end_to_end(spark, staging_dir, tmp_path):
    wh = str(tmp_path / "wh")
    manifest = P.run_warehouse_pipeline(spark, staging_dir, wh, audit=True)
    assert list(manifest) == list(P.WAREHOUSE_ORDER)
    assert manifest["dim_date"] == 29220
    assert manifest["dim_company"] == 3
    assert manifest["dim_funds"] == 1
    assert manifest["dim_people"] == 1
    assert manifest["fct_investments"] == 1  # orphan dropped (§1.4)
    assert manifest["fct_ipos"] == 1
    assert manifest["fct_acquisition"] == 1
    assert manifest["bridge_company_people"] == 1

    fact = spark.read.parquet(f"{wh}/fct_investments").collect()[0]
    assert fact["funded_at"] == 20130701  # smart key from funding_rounds
    assert fact["num_of_participants"] == "3"
    bridge = spark.read.parquet(f"{wh}/bridge_company_people").collect()[0]
    assert bridge["relationship_start_at"] == 20100101
    assert bridge["relationship_end_at"] is None
    assert bridge["title"] == "CEO"


def test_pipeline_rerun_idempotent(spark, staging_dir, tmp_path):
    wh = str(tmp_path / "wh2")
    m1 = P.run_warehouse_pipeline(spark, staging_dir, wh, audit=True)
    m2 = P.run_warehouse_pipeline(spark, staging_dir, wh, audit=True)
    assert m1 == m2  # overwrite, never append-duplicate (quirk §2.9.4)


def test_pipeline_incremental_slice(spark, staging_dir, tmp_path):
    wh = str(tmp_path / "wh3")
    # ds 2013-07-02 → slice = created_at::date == 2013-07-01; company
    # c:2 (created 2013-06-01) falls outside the slice
    manifest = P.run_warehouse_pipeline(
        spark, staging_dir, wh, ds="2013-07-02", audit=True
    )
    assert manifest["dim_company"] == 2
    # people/relationships have no timestamp-typed created_at filter
    # effect in this fixture (string-typed staging columns)
    assert manifest["fct_investments"] == 1


def test_pipeline_incremental_preserves_history(spark, staging_dir, tmp_path):
    """ADVICE r01: a daily incremental run must MERGE into the
    warehouse, not replace each table with only that day's rows — and
    existing surrogate keys must survive so facts never dangle."""
    wh = str(tmp_path / "wh4")
    P.run_warehouse_pipeline(spark, staging_dir, wh, audit=True)  # full load
    before = {
        r["nk_company_id"]: r["sk_company_id"]
        for r in spark.read.parquet(f"{wh}/dim_company").collect()
    }
    assert len(before) == 3

    # ds slice covers only 2013-07-01 rows (c:2 created 2013-06-01 is
    # outside), but the older company must stay in the dim
    m = P.run_warehouse_pipeline(spark, staging_dir, wh, ds="2013-07-02", audit=True)
    assert m["dim_company"] == 3
    after = {
        r["nk_company_id"]: r["sk_company_id"]
        for r in spark.read.parquet(f"{wh}/dim_company").collect()
    }
    assert after == before  # keys stable, nothing re-assigned

    # facts upsert on the natural id: rerunning the same day converges
    assert m["fct_investments"] == 1
    m2 = P.run_warehouse_pipeline(spark, staging_dir, wh, ds="2013-07-02", audit=True)
    assert m2 == m

    dim = spark.read.parquet(f"{wh}/dim_company")
    assert dim.count() == dim.select("nk_company_id").distinct().count()


def test_airflow_dag_import_gated():
    """The TaskFlow shell degrades cleanly when Airflow is absent; when
    present, the factory builds a DAG with the reference's ordering."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
        airflow_dag as AD,
    )

    assert set(AD._UPSTREAM) == set(P.WAREHOUSE_ORDER)
    # facts depend on dims; bridge on its two dims (reference main.py:120)
    assert "dim_company" in AD._UPSTREAM["fct_investments"]
    assert "dim_people" in AD._UPSTREAM["bridge_company_people"]
    if not AD.HAS_AIRFLOW:
        import pytest as _pytest
        with _pytest.raises(ImportError, match="airflow"):
            AD.build_warehouse_dag("/s", "/w")
    else:
        dag = AD.build_warehouse_dag("/s", "/w")
        assert {t.task_id for t in dag.tasks} == set(P.WAREHOUSE_ORDER)


def test_run_single_table_unit(spark, staging_dir, tmp_path):
    """Per-table task unit: dims then one fact, exactly as an external
    scheduler would drive it."""
    wh = str(tmp_path / "wh5")
    for t in ("dim_date", "dim_company", "dim_funds"):
        P.run_warehouse_table(spark, t, staging_dir, wh)
    P.run_warehouse_table(spark, "fct_investments", staging_dir, wh)
    assert spark.read.parquet(f"{wh}/fct_investments").count() == 1


def test_pipeline_two_day_incremental_sequence(spark, tmp_path):
    """Two consecutive daily runs: day-2's new company appends with the
    NEXT surrogate key; day-1 rows and keys are untouched."""
    import pyspark.sql.functions as F  # noqa: F401

    d1 = dt.datetime(2013, 7, 1, 9, 0, 0)
    d2 = dt.datetime(2013, 7, 2, 9, 0, 0)
    stg = str(tmp_path / "stg")
    base_company = [
        (1, "c:1", None, None, "1 A St", None, "sf", None, None, "us", None, None, d1, d1),
        (2, "c:2", None, None, "2 B St", None, "ny", None, None, "us", None, None, d2, d2),
    ]
    empty = {
        "funds": [], "funding_rounds": [], "investments": [], "ipos": [],
        "acquisition": [], "people": [], "relationships": [],
    }
    spark.createDataFrame(base_company, schema=schemas.STAGING["company"]).write.mode(
        "overwrite"
    ).parquet(f"{stg}/company")
    for name, rows in empty.items():
        spark.createDataFrame(rows, schema=schemas.STAGING[name]).write.mode(
            "overwrite"
        ).parquet(f"{stg}/{name}")

    wh = str(tmp_path / "wh")
    m1 = P.run_warehouse_pipeline(spark, stg, wh, ds="2013-07-02", audit=True)
    assert m1["dim_company"] == 1  # only c:1 created on 2013-07-01
    k1 = {r["nk_company_id"]: r["sk_company_id"]
          for r in spark.read.parquet(f"{wh}/dim_company").collect()}

    m2 = P.run_warehouse_pipeline(spark, stg, wh, ds="2013-07-03", audit=True)
    assert m2["dim_company"] == 2
    k2 = {r["nk_company_id"]: r["sk_company_id"]
          for r in spark.read.parquet(f"{wh}/dim_company").collect()}
    assert k2["c:1"] == k1["c:1"]          # day-1 key untouched
    assert k2["c:2"] == k1["c:1"] + 1      # sequence continues


def test_failure_callback_invoked_on_failing_table(spark, tmp_path):
    """A failing table build must invoke the injected on_failure hook
    with an Airflow-shaped context, then re-raise — the engine-side
    twin of the reference's Slack notifier wiring."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
        airflow_dag as AD,
        pipeline as P,
    )

    seen: list[str] = []
    cb = AD.make_failure_callback(seen.append)
    with pytest.raises(Exception):
        # nonexistent staging dir -> first table raises
        P.run_warehouse_pipeline(
            spark, str(tmp_path / "no_staging"), str(tmp_path / "wh"),
            on_failure=cb,
        )
    assert len(seen) == 1
    msg = seen[0]
    assert "Task failed" in msg
    assert "run_warehouse_pipeline" in msg


def test_failure_callback_transport_errors_are_swallowed(caplog):
    """An alerting outage must never mask the task failure."""
    import logging

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
        airflow_dag as AD,
    )

    def broken_transport(msg: str) -> None:
        raise ConnectionError("webhook down")

    cb = AD.make_failure_callback(broken_transport)
    with caplog.at_level(logging.ERROR):
        cb({"task_id": "t", "dag_id": "d", "ds": "2026-01-01",
            "exception": RuntimeError("boom")})
    assert any("transport raised" in r.message for r in caplog.records)

    # default transport: logs the formatted message
    with caplog.at_level(logging.ERROR):
        AD.make_failure_callback()({"task_id": "t2"})
    assert any("t2" in r.message for r in caplog.records)


def test_failure_message_reference_fields():
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans import (
        airflow_dag as AD,
    )

    msg = AD.format_failure_message(
        {"task_id": "dim_company", "dag_id": "vc_warehouse",
         "ds": "2026-08-14", "exception": ValueError("x")}
    )
    for field in ("*Task*: dim_company", "*Dag*: vc_warehouse",
                  "*Execution time*: 2026-08-14", "*Log url*:", "*Exception*: x"):
        assert field in msg
    # formatter never raises on an empty context
    assert "?" in AD.format_failure_message({})
