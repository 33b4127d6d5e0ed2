"""Golden unit tests for the expression library (SURVEY.md §5) —
each cleansing branch the reference's regexes target."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.functions import (
    expr as E,
)


def _vals(spark, data, expr):
    df = spark.createDataFrame([Row(x=v) for v in data], schema="x string")
    return [r["y"] for r in df.select(expr.alias("y")).collect()]


def test_clean_address_branches(spark):
    cases = {
        "#Main St": "main st",
        ".Apartment 1A": "apartment 1a",
        "??": None,          # symbols only
        ".323": None,        # strip '.' → digits only
        "------": None,
        " !? ": None,
        "a": None,           # too short
        " b ": None,
        "": None,
        "  12 Elm Road  ": "12 elm road",
        "#.#.OK Street": "ok street",
    }
    got = _vals(spark, list(cases), E.clean_address(F.col("x")))
    assert got == list(cases.values())


def test_clean_address_null(spark):
    assert _vals(spark, [None], E.clean_address(F.col("x"))) == [None]


def test_to_usd_rates_and_passthrough(spark):
    rows = [
        ("USD", Decimal("100.00"), 100.00),
        ("CAD", Decimal("100.00"), 72.00),
        ("EUR", Decimal("100.00"), 114.00),
        ("SEK", Decimal("100.00"), 10.00),
        ("AUD", Decimal("100.00"), 64.00),
        ("JPY", Decimal("100.00"), 0.70),
        ("GBP", Decimal("100.00"), 133.00),
        ("NIS", Decimal("100.00"), 28.00),
        ("IDR", Decimal("100.00"), 100.00),  # unknown → passthrough (quirk §2.9.7)
        (None, Decimal("100.00"), 100.00),
    ]
    df = spark.createDataFrame(
        [(c, a) for c, a, _ in rows], schema="cur string, amt decimal(15,2)"
    )
    got = [r["usd"] for r in df.select(E.to_usd("cur", "amt").alias("usd")).collect()]
    for (cur, _amt, want), g in zip(rows, got):
        assert float(g) == want, (cur, g, want)


def test_entity_type(spark):
    cases = {"c:1": "company", "f:9": "fund", "p:2": None, "": None}
    got = _vals(spark, list(cases), E.entity_type(F.col("x")))
    assert got == list(cases.values())


def test_concat_address(spark):
    df = spark.createDataFrame(
        [
            ("12 main", "suite 4", "12 main, suite 4"),
            (None, "suite 4", "suite 4"),
            ("", "suite 4", "suite 4"),
            ("12 main", None, "12 main"),
            ("12 main", "", "12 main"),
            (None, None, None),
        ],
        schema="a string, b string, want string",
    )
    got = df.select(E.concat_address("a", "b").alias("y"), "want").collect()
    for r in got:
        assert r["y"] == r["want"]


def test_normalize_and_null_if_empty(spark):
    assert _vals(spark, ["  MiXeD  "], E.normalize_lower(F.col("x"))) == ["mixed"]
    assert _vals(spark, ["  us "], E.normalize_upper(F.col("x"))) == ["US"]
    assert _vals(spark, ["   "], E.normalize_lower(F.col("x"))) == [None]
    assert _vals(spark, [""], E.null_if_empty(F.col("x"))) == [None]


def test_date_key_and_try_date_key(spark):
    df = spark.createDataFrame([("2013-07-04",)], schema="d string")
    got = df.select(
        E.date_key(F.col("d").cast("date")).alias("k"),
        E.try_date_key(F.lit("garbage")).alias("bad"),
        E.try_date_key(F.lit("2013-07-04")).alias("ok"),
    ).collect()[0]
    assert got["k"] == 20130704
    assert got["bad"] is None
    assert got["ok"] == 20130704


def test_scrub_newlines(spark):
    assert _vals(spark, ["a\nb\nc"], E.scrub_newlines(F.col("x"))) == ["a b c"]
