"""Streaming decontamination: documents arriving as a stream are
flagged against a STATIC eval-benchmark gram set with exactly the
batch operator's semantics — the continuous-ingest version of
operators/dedup.contamination_hits. The law pinned here: replaying
the corpus through foreachBatch micro-batches and accumulating hit
counts yields BIT-IDENTICAL per-doc results to the one-shot batch
scan (per-doc gram sets are batch-local because a doc arrives whole —
counts are additive across batches only if a doc spans batches, which
ingest never does; we still assert the grouped-merge form to prove
the accumulation algebra)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
    dedup as DD,
)
from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
    read_table,
)


def test_stream_decontaminate_matches_batch(spark, sf_dir, tmp_path):
    docs = read_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)

    want = {
        (r["id"], r["n_contaminated_grams"])
        for r in DD.contamination_hits(train, eval_df, n=3).collect()
    }

    # replay the train side in 5 deterministic micro-batches through
    # the SAME operator against the static eval frame, accumulating
    # into a dict keyed by doc id (foreachBatch = the sink a real
    # continuous decontamination job uses before quarantine routing)
    acc: dict[int, int] = {}
    for b in range(5):
        batch = train.filter(F.pmod(F.col("doc_id"), F.lit(5)) == b)
        for r in DD.contamination_hits(batch, eval_df, n=3).collect():
            acc[r["id"]] = acc.get(r["id"], 0) + r["n_contaminated_grams"]
    got = set(acc.items())
    assert got == want


def test_stream_decontaminate_foreachbatch_sink(spark, sf_dir, tmp_path):
    """Genuine Structured Streaming run: parquet source → per-batch
    contamination_hits vs the static eval grams → append to a sink
    table; the union of sink rows equals the batch result."""
    docs = read_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train_batch = docs.filter(F.col("doc_id") % 97 != 0)
    want = {
        (r["id"], r["n_contaminated_grams"])
        for r in DD.contamination_hits(train_batch, eval_df, n=3).collect()
    }

    src = tmp_path / "docs_src"
    src.mkdir()
    train_batch.write.parquet(str(src / "part0"))

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark import (
        schemas,
    )

    stream = spark.readStream.schema(schemas.TESTDATA["documents"]).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src / "part0"))

    sink: list[tuple] = []

    def handle(batch_df, _bid):
        hits = DD.contamination_hits(batch_df, eval_df, n=3)
        sink.extend(
            (r["id"], r["n_contaminated_grams"]) for r in hits.collect()
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # docs arrive whole (one row per doc), so per-batch hits are final:
    # no id appears twice and the union equals the batch twin
    ids = [i for i, _ in sink]
    assert len(ids) == len(set(ids))
    assert set(sink) == want

# round-13: GATE-covered heavy suite — deselected from the default
# (driver-budget) collection, runs via tools/round_gate.py / -m 'slow or not slow'
import pytest  # noqa: E402
pytestmark = pytest.mark.slow
