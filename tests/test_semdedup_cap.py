"""SemDeDup per-cell cap (VERDICT r11 #6 — the guard alternative to
decade-2 scaling evidence): the within-cell quadratic is bounded by
construction. Mirrors the LSH hot-bucket cap contract
(operators/dedup.banded_pairs max_bucket_size +
band_bucket_overflow): over-cap cells skip pruning (documented recall
trade, every member kept), overflow accounting names exactly what was
skipped, clones never count toward the cap, and capped == exact
whenever no cell exceeds the cap."""

from __future__ import annotations

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    similarity as SIM,
)

DIM = 4


def _corpus(spark, with_clones=False):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # centroid 0 / cell-0 min id
        (1, [0.0, 1.0, 0.0, 0.0]),       # centroid 1 / cell-1 min id
    ]
    # cell-0 flood: 10 DISTINCT near-identical vectors
    rows += [
        (i, [1.0, 0.001 * (i - 1), 0.0, 0.0]) for i in range(2, 12)
    ]
    # cell 1: two vectors near centroid 1
    rows += [(12, [0.001, 1.0, 0.0, 0.0]), (13, [0.002, 1.0, 0.0, 0.0])]
    if with_clones:
        rows += [(20, [1.0, 0.001, 0.0, 0.0]), (21, [1.0, 0.001, 0.0, 0.0])]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _run(spark, corpus, **kw):
    return {
        r["vec_id"]: (r["cell"], r["kept"], r["pruned_by"])
        for r in SIM.semantic_dedup(
            corpus,
            dim=DIM,
            n_centroids=2,
            threshold=0.4,
            centroid_source=corpus.filter("vec_id < 2"),
            **kw,
        ).collect()
    }


def test_capped_equals_exact_when_under_cap(spark):
    corpus = _corpus(spark)
    exact = _run(spark, corpus)
    capped = _run(spark, corpus, max_cell_size=100)
    assert capped == exact
    # sanity: the exact run prunes the flood down to its min id
    assert exact[0] == (0, True, None)
    for i in range(2, 12):
        assert exact[i][1] is False and exact[i][2] == 0


def test_over_cap_cell_skips_pruning_others_unaffected(spark):
    corpus = _corpus(spark)
    capped = _run(spark, corpus, max_cell_size=5)
    # cell 0 holds 11 distinct reps > 5: every verdict kept, no
    # provenance — the documented recall trade
    for i in [0] + list(range(2, 12)):
        assert capped[i] == (0, True, None), f"vec {i}"
    # cell 1 (2 reps + the centroid vector) still prunes exactly
    assert capped[1] == (1, True, None)
    assert capped[12] == (1, False, 1)
    assert capped[13] == (1, False, 1)


def test_overflow_accounting_names_the_skipped_cell(spark):
    corpus = _corpus(spark)
    over = {
        r["cell"]: r["n_reps"]
        for r in SIM.semdedup_cell_overflow(
            corpus,
            dim=DIM,
            n_centroids=2,
            max_cell_size=5,
            centroid_source=corpus.filter("vec_id < 2"),
        ).collect()
    }
    assert over == {0: 11}
    # a big-enough cap reports nothing
    assert (
        SIM.semdedup_cell_overflow(
            corpus,
            dim=DIM,
            n_centroids=2,
            max_cell_size=100,
            centroid_source=corpus.filter("vec_id < 2"),
        ).count()
        == 0
    )


def test_clones_do_not_count_toward_the_cap(spark):
    """Byte-identical vectors collapse before the cap is measured —
    a boilerplate flood is one rep, not an overflow."""
    corpus = _corpus(spark, with_clones=True)
    over = {
        r["cell"]: r["n_reps"]
        for r in SIM.semdedup_cell_overflow(
            corpus,
            dim=DIM,
            n_centroids=2,
            max_cell_size=5,
            centroid_source=corpus.filter("vec_id < 2"),
        ).collect()
    }
    assert over == {0: 11}  # clones of vec 2's vector add no reps
    # and with a cap that admits cell 0 (11 <= 11), the clones are
    # pruned through their representative as in the exact rule
    capped = _run(spark, corpus, max_cell_size=11)
    assert capped[20] == (0, False, 0)
    assert capped[21] == (0, False, 0)

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
