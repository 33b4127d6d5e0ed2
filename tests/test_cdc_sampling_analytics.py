"""Golden tests for operators/cdc, operators/sampling,
operators/analytics, and functions/text.chunk_windows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.functions import (
    text as TX,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    analytics as ANA,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    cdc as CDC,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    sampling as SMP,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# --- cdc.snapshot_diff ------------------------------------------------------

def test_snapshot_diff_classifies_all_transitions(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        ["k", "v", "p"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "x", 40.0), (5, "e", 50.0)],
        ["k", "v", "p"],
    )
    res = CDC.snapshot_diff(old, new, ["k"], ["v", "p"])
    by_key = {r["k"]: r for r in res.collect()}
    assert by_key[1]["change_type"] == "delete"
    assert by_key[3]["change_type"] == "update"  # value diff
    assert by_key[4]["change_type"] == "update"  # NULL -> value is an update
    assert by_key[5]["change_type"] == "insert"
    assert 2 not in by_key  # unchanged dropped by default
    assert by_key[3]["old_p"] == 30.0 and by_key[3]["new_p"] == 31.0
    assert by_key[5]["old_v"] is None and by_key[5]["new_v"] == "e"


def test_snapshot_diff_keep_unchanged_partitions_keyspace(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "z")], ["k", "v"])
    res = CDC.snapshot_diff(old, new, ["k"], ["v"], keep_unchanged=True)
    kinds = dict(res.select("k", "change_type").collect())
    assert kinds == {1: "unchanged", 2: "update"}


# --- sampling ---------------------------------------------------------------

def test_cap_per_group_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(30)], ["id", "grp"]
    )
    a = SMP.cap_per_group(df, ["grp"], "id", 4)
    b = SMP.cap_per_group(df, ["grp"], "id", 4)
    rows_a = sorted(a.select("id", "grp").collect())
    assert rows_a == sorted(b.select("id", "grp").collect())  # rerun-stable
    per_group = a.groupBy("grp").count().collect()
    assert all(r["count"] == 4 for r in per_group)
    assert a.select(F.max("sample_rank")).first()[0] == 4


def test_cap_per_group_small_groups_untouched(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], ["id", "grp"])
    assert SMP.cap_per_group(df, ["grp"], "id", 5).count() == 2


def test_weighted_mix_replication_and_epochs(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "fr")], ["id", "lang"]
    )
    res = SMP.weighted_mix(df, spark, "lang", {"en": 3, "de": 2})
    counts = dict(res.groupBy("id").count().collect())
    assert counts == {1: 3, 2: 2, 3: 1}
    en_epochs = sorted(
        r["epoch"] for r in res.filter(F.col("id") == 1).collect()
    )
    assert en_epochs == [1, 2, 3]
    assert "_mix_weight" not in res.columns


# --- text.chunk_windows -----------------------------------------------------

def test_chunk_windows_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(25))  # 25 tokens
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    res = TX.chunk_windows(df, size=20, stride=10).collect()
    by_chunk = {r["chunk_id"]: r for r in res}
    assert sorted(by_chunk) == [0, 1, 2]
    assert by_chunk[0]["n_chunk_tokens"] == 20
    assert by_chunk[0]["chunk_text"].startswith("w0 w1 ")
    assert by_chunk[1]["chunk_start"] == 10
    assert by_chunk[1]["chunk_text"].split(" ")[0] == "w10"  # overlap
    assert by_chunk[2]["n_chunk_tokens"] == 5  # short tail
    assert by_chunk[2]["chunk_text"] == "w20 w21 w22 w23 w24"


def test_chunk_windows_short_and_blank_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "   ")], ["doc_id", "text"]
    )
    res = TX.chunk_windows(df, size=20, stride=10)
    rows = {r["doc_id"]: r for r in res.collect()}
    assert res.count() == 2  # one chunk each
    assert rows[1]["n_chunk_tokens"] == 3
    assert rows[2]["n_chunk_tokens"] == 0 and rows[2]["chunk_text"] == ""


# --- analytics --------------------------------------------------------------

def _funnel_events(spark):
    rows = [
        # u1 completes all three within windows
        (1, "view", _ts("2024-01-01 10:00:00")),
        (1, "click", _ts("2024-01-01 10:30:00")),
        (1, "purchase", _ts("2024-01-01 20:00:00")),
        # u2 clicks too late (2h after view)
        (2, "view", _ts("2024-01-01 10:00:00")),
        (2, "click", _ts("2024-01-01 12:00:00")),
        (2, "purchase", _ts("2024-01-01 12:30:00")),
        # u3 purchase BEFORE click -> must not count (order matters)
        (3, "view", _ts("2024-01-01 09:00:00")),
        (3, "purchase", _ts("2024-01-01 09:10:00")),
        (3, "click", _ts("2024-01-01 09:20:00")),
        # u4 never views
        (4, "click", _ts("2024-01-01 09:00:00")),
    ]
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


def test_funnel_ordering_and_windows(spark):
    res = ANA.funnel(
        _funnel_events(spark),
        [("view", None), ("click", "1 HOUR"), ("purchase", "1 DAY")],
    )
    got = {r["step"]: (r["step_idx"], r["n_users"]) for r in res.collect()}
    assert got["view"] == (1, 3)  # u1,u2,u3
    assert got["click"] == (2, 2)  # u1, u3 (u2 outside 1h)
    assert got["purchase"] == (3, 1)  # only u1 (u3's purchase precedes click)


def test_funnel_empty_stage_yields_zero_not_missing(spark):
    res = ANA.funnel(
        _funnel_events(spark), [("view", None), ("error", "1 HOUR")]
    )
    got = {r["step"]: r["n_users"] for r in res.collect()}
    assert got == {"view": 3, "error": 0}


def test_retention_cohort_triangle(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")),  # cohort week 0
        (1, _ts("2024-01-09 10:00:00")),  # offset 1
        (1, _ts("2024-01-10 10:00:00")),  # same week -> same cell, deduped
        (2, _ts("2024-01-02 10:00:00")),  # cohort week 0
        (3, _ts("2024-01-08 10:00:00")),  # cohort week 1
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    res = ANA.retention_cohort(ev, origin="2024-01-01")
    cells = {
        (r["cohort_week"], r["week_offset"]): r["n_users"] for r in res.collect()
    }
    assert cells == {(0, 0): 2, (0, 1): 1, (1, 0): 1}


def test_schema_drift_and_gate(spark):
    from pyspark.sql import types as T

    old = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("id", T.LongType(), True),  # nullability loosened
            T.StructField("name", T.IntegerType()),   # type changed
            T.StructField("extra", T.StringType()),   # added
        ]
    )  # flag removed
    drift = {(d["column"], d["change"]) for d in CDC.schema_drift(old, new)}
    assert drift == {
        ("id", "nullability_changed"),
        ("name", "type_changed"),
        ("extra", "added"),
        ("flag", "removed"),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="breaking schema drift"):
        CDC.assert_schema_compatible(old, new)
    # added-only drift passes the default gate
    CDC.assert_schema_compatible(
        old,
        T.StructType(list(old.fields) + [T.StructField("x", T.StringType())]),
    )


def test_schema_gate_nullability_loosening_is_breaking():
    """A NOT NULL dropped (nullable False→True) is exactly the drift
    the load gate exists to catch; tightening (True→False) is a
    stricter contract and passes."""
    import pytest as _pytest
    from pyspark.sql import types as T

    old = T.StructType([T.StructField("id", T.LongType(), False)])
    loosened = T.StructType([T.StructField("id", T.LongType(), True)])
    with _pytest.raises(ValueError, match="nullability_changed"):
        CDC.assert_schema_compatible(old, loosened)
    CDC.assert_schema_compatible(
        old, loosened, allow_nullability_loosening=True
    )
    # tightening is not breaking
    CDC.assert_schema_compatible(loosened, old)


# --- cdc.apply_changes ------------------------------------------------------

def test_apply_changes_upsert_delete_latest_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "s", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update
            (2, "b3", 22.0, 3, "U"),   # later update wins
            (3, "c", 30.0, 1, "D"),    # delete
            (4, "d", 40.0, 1, "U"),    # insert
            (5, "e", 50.0, 2, "U"),    # same-seq U+D pair: delete wins
            (5, "e", 50.0, 2, "D"),
        ],
        ["k", "s", "v", "seq", "op"],
    )
    got = sorted(
        (r["k"], r["s"], r["v"])
        for r in CDC.apply_changes(base, changes, ["k"], "seq").collect()
    )
    assert got == [(1, "a", 10.0), (2, "b3", 22.0), (4, "d", 40.0)]


def test_apply_changes_roundtrips_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 21.0), (4, "d", 40.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    diff = CDC.snapshot_diff(old, new, ["k"], ["s", "v"])
    feed = diff.select(
        "k",
        F.col("new_s").alias("s"),
        F.col("new_v").alias("v"),
        F.lit(1).alias("seq"),
        F.when(F.col("change_type") == "delete", "D").otherwise("U").alias("op"),
    )
    merged = CDC.apply_changes(old, feed, ["k"], "seq")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, new.collect()))


def test_apply_changes_null_op_is_upsert_not_delete(spark):
    """A NULL op must upsert: three-valued logic on `op != 'D'` used to
    drop the row from survivors while the anti-join still removed the
    key — a malformed change row became a silent delete."""
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    changes = spark.createDataFrame(
        [(1, "a2", 5, None), (3, "c", 5, None)],
        "k long, s string, seq long, op string",
    )
    got = sorted(
        (r["k"], r["s"])
        for r in CDC.apply_changes(base, changes, ["k"], "seq").collect()
    )
    assert got == [(1, "a2"), (2, "b"), (3, "c")]


def test_apply_changes_validate_flags_ambiguous_ties(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    base = spark.createDataFrame([(1, "a")], ["k", "s"])
    # two NON-delete changes share (key, seq): which payload wins is
    # partition-order-dependent -> validate=True must fail the job
    ambiguous = spark.createDataFrame(
        [(1, "x", 7, "U"), (1, "y", 7, "U")], ["k", "s", "seq", "op"]
    )
    with pytest.raises((Py4JJavaError, Exception), match="CDC_AMBIGUOUS_CHANGE"):
        CDC.apply_changes(base, ambiguous, ["k"], "seq", validate=True).collect()
    # a same-seq upsert+delete pair is NOT ambiguous (delete wins by
    # contract), and two same-seq deletes converge (payload ignored)
    fine = spark.createDataFrame(
        [(1, "x", 7, "U"), (1, "x", 7, "D"), (2, "z", 1, "D"), (2, "z", 1, "D")],
        ["k", "s", "seq", "op"],
    )
    got = sorted(
        (r["k"], r["s"])
        for r in CDC.apply_changes(base, fine, ["k"], "seq", validate=True).collect()
    )
    assert got == []


def test_weighted_median_rejects_negative_weights(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, -1.0)], ["g", "v", "w"]
    )
    with pytest.raises(Exception, match="WEIGHTED_MEDIAN_NEGATIVE_WEIGHT"):
        # validate=True is the default: a negative weight fails the
        # job rather than returning a silently wrong median
        ANA.weighted_median(df, ["g"], "v", "w").collect()


def test_weighted_median_validate_off_skips_check(spark):
    # explicit validate=False opt-out for callers with proven-clean
    # weights (perf contract — no raise_error in the projection)
    df = spark.createDataFrame(
        [("a", 1.0, 2.0), ("a", 2.0, -1.0)], ["g", "v", "w"]
    )
    ANA.weighted_median(df, ["g"], "v", "w", validate=False).collect()  # no raise


def test_weighted_bernoulli_sample_rate_and_determinism(spark):
    """Inclusion tracks the weight (0 -> never, max -> always), reruns
    are byte-identical, and different salts draw different samples."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        sampling as SMP,
    )

    rows = [(i, 0 if i < 100 else (1000 if i < 200 else 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w long")
    take = lambda salt: {  # noqa: E731
        r["id"]
        for r in SMP.weighted_bernoulli_sample(
            df, "id", "w", max_weight=1000, salt=salt
        ).collect()
    }
    got = take("s1")
    # w=0 never sampled; w=max always sampled
    assert not any(i < 100 for i in got)
    assert all(i in got for i in range(100, 200))
    # w=500 -> p=0.5: comfortably between the degenerate extremes
    mid = sum(1 for i in got if i >= 200)
    assert 20 <= mid <= 80
    # reruns identical; a different salt draws a different mid-set
    assert take("s1") == got
    assert {i for i in take("other") if i >= 200} != {i for i in got if i >= 200}

    import pytest

    with pytest.raises(ValueError, match="max_weight"):
        SMP.weighted_bernoulli_sample(df, "id", "w", max_weight=0)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
