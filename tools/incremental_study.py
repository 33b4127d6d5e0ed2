"""Incremental-dedup scaling study (round 5).

Claim under test: with a persisted LSH index, the cost of deduping a
FIXED-SIZE daily shard against the corpus scales with the shard (plus
one linear scan of the index), NOT with corpus size — while a full
recompute re-pays the whole corpus every day. This is the difference
between a daily pipeline whose cost is O(day's data) and one whose
cost grows without bound as the corpus accumulates.

Method: reuse the seeded 10x document set from tools/scaling_study.py
(same generator, same perturbations). At each corpus scale (1x =
sf0.1's 5,000 docs; 10x = 50,000), hold the SHARD fixed: the 500 docs
with doc_id % 10 == 0 from the 1x set, re-keyed above the corpus id
range so ids never collide. Then time, median of --reps after a
warm-up:

- full    : minhash_lsh_pairs_poly(corpus ∪ shard) — the daily cost
            WITHOUT an index (re-shingle + re-band everything);
- inc     : incremental_lsh_pairs(shard, prebuilt index,
            update_index=False) — sign the shard, band-join it
            against the persisted band table (broadcast onto one
            index scan), score candidates;
- append  : one-shot index append cost (build_lsh_index mode=append),
            reported separately (it mutates the index, so it is
            measured once, not repped).

The index build over the corpus is excluded from the daily cost by
design — it is the one-time (or rebuild-cadence) amortized cost the
incremental mode exists to avoid re-paying.

Usage: python tools/incremental_study.py [--out /tmp/scale10]
       [--reps 3] [--workdir /tmp/incr_study]
Prints one JSON line; paste/refresh BENCH_SCALING.md from it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--workdir", default="/tmp/incr_study")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not os.path.exists(f"{args.out}/documents.parquet"):
        from scaling_study import build_10x

        build_10x(args.out)

    from pyspark.sql import functions as F

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.operators import (
        dedup as DD,
    )
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.session import (
        build_session,
    )

    spark = build_session("incremental-study")
    # the fixed daily shard: 500 docs from the 1x set, re-keyed past
    # any corpus id (1x ids < 5e3, 10x ids < 5e4 -> offset 1e6)
    shard = (
        spark.read.parquet(f"{SF01}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    shard.persist().count()

    result: dict[str, dict] = {}
    for label, src in (("1x", f"{SF01}/documents.parquet"),
                       ("10x", f"{args.out}/documents.parquet")):
        corpus = spark.read.parquet(src)
        n_corpus = corpus.count()
        idx = f"{args.workdir}/index_{label}"
        shutil.rmtree(idx, ignore_errors=True)

        t0 = time.time()
        DD.build_lsh_index(corpus, idx, mode="overwrite")
        t_build = time.time() - t0

        def med(fn):
            fn()  # warm-up
            samples = []
            for _ in range(args.reps):
                t0 = time.time()
                fn()
                samples.append(time.time() - t0)
            samples.sort()
            return samples[len(samples) // 2]

        full_q = lambda: DD.minhash_lsh_pairs_poly(  # noqa: E731
            corpus.unionByName(shard), "doc_id", "text", threshold=0.5
        ).count()
        inc_q = lambda: DD.incremental_lsh_pairs(  # noqa: E731
            shard, idx, threshold=0.5, update_index=False
        ).count()

        t_full = med(full_q)
        t_inc = med(inc_q)
        t0 = time.time()
        DD.build_lsh_index(shard, idx, mode="append")
        t_append = time.time() - t0

        result[label] = {
            "corpus_docs": n_corpus,
            "shard_docs": shard.count(),
            "index_build_sec": round(t_build, 3),
            "full_recompute_sec": round(t_full, 3),
            "incremental_sec": round(t_inc, 3),
            "append_sec": round(t_append, 3),
        }

    r1, r10 = result["1x"], result["10x"]
    summary = {
        "full_growth_10x": round(
            r10["full_recompute_sec"] / r1["full_recompute_sec"], 2
        ),
        "incremental_growth_10x": round(
            r10["incremental_sec"] / r1["incremental_sec"], 2
        ),
        "incremental_speedup_at_10x": round(
            r10["full_recompute_sec"]
            / (r10["incremental_sec"] + r10["append_sec"]),
            2,
        ),
    }
    print(json.dumps({"reps": args.reps, "scales": result, "summary": summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
