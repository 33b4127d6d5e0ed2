"""dim_date hard-parity tests (SURVEY.md §7.2): sampled dates incl.
leap days, year boundaries, ISO week 52/53 edges, against hand-checked
Postgres to_char semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.plans.dim_date import (
    SPAN_DAYS,
    build_dim_date,
)


def _row(spark, day: str):
    dd = build_dim_date(spark)
    return dd.filter(F.col("date_actual") == day).collect()[0]


def test_span_and_ids(spark):
    dd = build_dim_date(spark)
    assert dd.count() == SPAN_DAYS
    first, last = dd.orderBy("date_id").limit(1).collect()[0], dd.orderBy(
        F.col("date_id").desc()
    ).limit(1).collect()[0]
    assert first["date_id"] == 19500101
    assert last["date_actual"] == dt.date(1950, 1, 1) + dt.timedelta(days=SPAN_DAYS - 1)


def test_leap_day(spark):
    r = _row(spark, "2000-02-29")
    assert r["date_id"] == 20000229
    assert r["day_suffix"] == "29th"
    assert r["day_name"] == "Tuesday"
    assert r["day_of_year"] == 60
    assert r["last_day_of_month"] == dt.date(2000, 2, 29)
    assert r["first_day_of_quarter"] == dt.date(2000, 1, 1)
    assert r["mmddyyyy"] == "02292000"


def test_iso_week_boundary(spark):
    # 2021-01-01 is a Friday in ISO week 53 of ISO year 2020 (PG EXTRACT(ISOYEAR))
    r = _row(spark, "2021-01-01")
    assert r["week_of_year"] == 53
    assert r["week_of_year_iso"] == "2020-W53"
    assert r["year_actual"] == 2021
    # 2024-12-30 is a Monday in ISO week 1 of ISO year 2025
    r2 = _row(spark, "2024-12-30")
    assert r2["week_of_year"] == 1
    assert r2["week_of_year_iso"] == "2025-W01"


def test_day_suffix_teens(spark):
    for day, suf in [(1, "1st"), (2, "2nd"), (3, "3rd"), (11, "11th"),
                     (12, "12th"), (13, "13th"), (21, "21st"), (22, "22nd"),
                     (23, "23rd"), (24, "24th"), (30, "30th"), (31, "31st")]:
        r = _row(spark, f"2013-07-{day:02d}")
        assert r["day_suffix"] == suf, (day, r["day_suffix"])


def test_week_of_month_is_postgres_W(spark):
    # PG to_char 'W' = (day-1)/7+1, not ISO week-in-month
    assert _row(spark, "2013-07-01")["week_of_month"] == 1
    assert _row(spark, "2013-07-07")["week_of_month"] == 1
    assert _row(spark, "2013-07-08")["week_of_month"] == 2
    assert _row(spark, "2013-07-31")["week_of_month"] == 5


def test_week_bounds_iso_monday(spark):
    r = _row(spark, "2013-07-04")  # Thursday
    assert r["first_day_of_week"] == dt.date(2013, 7, 1)   # Monday
    assert r["last_day_of_week"] == dt.date(2013, 7, 7)    # Sunday
    assert r["weekend_indr"] == "weekday"
    assert _row(spark, "2013-07-06")["weekend_indr"] == "weekend"
    assert _row(spark, "2013-07-07")["weekend_indr"] == "weekend"
