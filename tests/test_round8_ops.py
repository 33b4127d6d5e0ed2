"""Round-8 continuation operators: MDM survivorship (golden records),
benchmark decontamination laws live in test_llm_ops.py, JPEG codec in
test_jpeg_codec.py. These tests pin the semantic laws the registry
oracles can't state alone."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    dedup as DD,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    linkage as LNK,
)


def _records(spark):
    return spark.createDataFrame(
        [
            # component {1,2,3}: name nulls on the lowest id, type mode
            Row(id=1, name=None, size=None, type="A"),
            Row(id=2, name="acme corp", size=5, type="B"),
            Row(id=3, name="acme corp.", size=6, type="B"),
            # singleton
            Row(id=9, name="solo llc", size=1, type="Z"),
            # component {10, 11}: all-null attribute survives as NULL,
            # type tie 'C' vs 'D' breaks to the smaller value
            Row(id=10, name=None, size=None, type="D"),
            Row(id=11, name=None, size=2, type="C"),
        ]
    )


def _components(spark):
    return spark.createDataFrame(
        [Row(id=1, component=1), Row(id=2, component=1), Row(id=3, component=1),
         Row(id=9, component=9), Row(id=10, component=10), Row(id=11, component=10)]
    )


def test_golden_records_survivorship_rules(spark):
    got = {
        r.component: r
        for r in LNK.golden_records(
            _records(spark), _components(spark), "id",
            first_nonnull_cols=["name", "size"], mode_cols=["type"],
        ).collect()
    }
    assert set(got) == {1, 9, 10}
    # first-nonnull-by-lowest-id: id=1 has NULL name, so id=2's survives
    assert got[1].name == "acme corp" and got[1].size == 5
    assert got[1].n_members == 3
    # mode with ties broken by value: B appears twice
    assert got[1].type == "B"
    # singleton survives as itself
    assert got[9].name == "solo llc" and got[9].size == 1 and got[9].type == "Z"
    assert got[9].n_members == 1
    # all-null attribute stays NULL; tie C-vs-D -> C
    assert got[10].name is None and got[10].size == 2
    assert got[10].type == "C"


def test_golden_records_is_complete_partition(spark):
    """Every input row belongs to exactly one golden row: n_members
    sums to the record count and components are distinct."""
    golden = LNK.golden_records(
        _records(spark), _components(spark), "id",
        first_nonnull_cols=["name"],
    )
    rows = golden.collect()
    assert sum(r.n_members for r in rows) == _records(spark).count()
    assert len({r.component for r in rows}) == len(rows)


def test_golden_records_composes_with_cc(spark):
    """The full pipeline law: pairs -> connected_components ->
    golden_records yields one row per component of the pair graph."""
    recs = _records(spark)
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=10, id_b=11)]
    )
    comps = DD.connected_components(
        recs.select("id"), pairs, id_col="id"
    )
    golden = LNK.golden_records(recs, comps, "id", first_nonnull_cols=["name"])
    assert golden.count() == 3  # {1,2,3}, {9}, {10,11}
    by_comp = {r.component: r.n_members for r in golden.collect()}
    assert by_comp == {1: 3, 9: 1, 10: 2}


# ---------------------------------------------------------------------------
# z-order multi-column pruning (operators/layout.pruned_read_multi)
# ---------------------------------------------------------------------------


def _zorder_table(spark, tmp_path):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        layout as LAY,
    )

    # two independent uniform dims so 1-D clustering cannot help dim b
    df = spark.createDataFrame(
        [(i, i % 97, (i * 31) % 89) for i in range(10_000)],
        "id long, a int, b int",
    )
    zpath = str(tmp_path / "z")
    LAY.zorder_write(df, zpath, F.col("a"), F.col("b"), files=16, bits=8)
    apath = str(tmp_path / "a1d")
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.parquet(apath)
    )
    return df, zpath, apath


def test_zorder_prune_matches_full_scan(spark, tmp_path):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        layout as LAY,
    )

    df, zpath, _ = _zorder_table(spark, tmp_path)
    zmaps = LAY.collect_zone_maps(spark, zpath, ["a", "b"])
    got = LAY.pruned_read_multi(
        spark, zpath, zmaps, [("a", 10, 30), ("b", 10, 30)]
    )
    want = df.filter("a BETWEEN 10 AND 30 AND b BETWEEN 10 AND 30")
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in want.collect()
    )
    # strict subset of the table's files is opened
    assert len(set(got.inputFiles())) < len(
        set(spark.read.parquet(zpath).inputFiles())
    )


def test_zorder_prunes_second_dim_better_than_1d(spark, tmp_path):
    """The reason z-order exists: on a predicate over BOTH dims, the
    z-layout's survivor set must be smaller than the 1-D layout's for
    the same zone-map logic (1-D files span b's full range, so the b
    range never prunes them)."""
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        layout as LAY,
    )

    _, zpath, apath = _zorder_table(spark, tmp_path)
    preds = [("a", 10, 30), ("b", 10, 30)]
    z_files = len(
        set(
            LAY.pruned_read_multi(
                spark, zpath, LAY.collect_zone_maps(spark, zpath, ["a", "b"]),
                preds,
            ).inputFiles()
        )
    )
    a_files = len(
        set(
            LAY.pruned_read_multi(
                spark, apath, LAY.collect_zone_maps(spark, apath, ["a", "b"]),
                preds,
            ).inputFiles()
        )
    )
    assert z_files < a_files, (z_files, a_files)


def test_zorder_prune_empty_range_keeps_schema(spark, tmp_path):
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        layout as LAY,
    )

    df, zpath, _ = _zorder_table(spark, tmp_path)
    zmaps = LAY.collect_zone_maps(spark, zpath, ["a", "b"])
    got = LAY.pruned_read_multi(
        spark, zpath, zmaps, [("a", 1000, 2000), ("b", 0, 100)]
    )
    assert got.count() == 0
    assert got.columns == df.columns

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
