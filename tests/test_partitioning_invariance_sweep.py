"""Partitioning-invariance sweep: every registry query — including
the five seeded-hash queries with no SQL oracle — must produce
IDENTICAL results when the physical partitioning changes.

This is the determinism claim the docstrings make ("deterministic
under any partitioning") tested directly, engine-vs-engine: the same
query runs once under the default layout (32 shuffle partitions,
default scan splits) and once under an adversarial layout (7 shuffle
partitions, 64 KiB scan splits → many small input partitions), and
the canonicalized row sets must match exactly. On a 1000-executor
cluster the partition count is whatever the cluster decides that day;
any result that depends on it — float accumulation order, first()
without ordering, limit without total order, sampled boundaries — is
a silent-corruption bug. (Round 3's surrogate-key resampled-boundary
bug was exactly this class; the rebuilt operator is provably
layout-independent, and this sweep keeps the whole surface that way.)

Unlike the oracle sweeps this needs no DuckDB: Spark is compared to
itself, so the five rows-only xxhash queries get a full value check
here too.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.slow

SF_DIR = "/root/testdata/sf0.001"

ADVERSARIAL = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.files.openCostInBytes": "0",
}


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(v)
            else:
                v = str(v)
            vals.append(v)
        rows.append(tuple(vals))
    rows.sort()
    return rows


@pytest.mark.parametrize("name", list(entry_mod.queries()))
def test_result_is_partitioning_invariant(spark, name):
    fn = entry_mod.queries()[name]

    baseline = _canon(fn(spark, SF_DIR))

    saved = {k: spark.conf.get(k, None) for k in ADVERSARIAL}
    try:
        for k, v in ADVERSARIAL.items():
            spark.conf.set(k, v)
        adversarial = _canon(fn(spark, SF_DIR))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert len(baseline) == len(adversarial), (
        f"{name}: row count depends on partitioning "
        f"({len(baseline)} vs {len(adversarial)})"
    )
    if baseline != adversarial:
        diffs = [
            (a, b) for a, b in zip(baseline, adversarial) if a != b
        ][:3]
        raise AssertionError(
            f"{name}: results depend on physical partitioning: {diffs}"
        )
