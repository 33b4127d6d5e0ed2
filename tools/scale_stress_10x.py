"""One-decade scale stress for the heavy-tier queries (VERDICT r8 #2).

BENCH_SCALING.md argues scale posture from sf0.01→sf0.1 exponents and
plan shape; this tool adds a REAL decade above the bench SF: it
materializes a ~10x sf0.1 corpus (sf1-equivalent: 6M lineitem, 50k
docs, 1M events, 20k embeddings) and times the riskiest operators at
both scales in the same session, reporting the observed exponent
log10(t_10x / t_1x). Exponent ≈ 1 ⇒ linear; ≫ 1 is the
UnboundedFollowing-class surprise this exists to catch.

Corpus construction = 10 replicas of sf0.1 with disjoint key spaces
(all FK columns shifted by replica * 10^9, so joins never cross
replicas) and SIMILARITY-BREAKING mutations where identity replication
would corrupt the workload's statistics rather than scale them:

- ``documents.text``: per-replica vowel/consonant rotation
  (``translate``) — WITHIN-replica near-dup structure is preserved
  exactly (a bijective char substitution preserves pairwise shingle
  Jaccard), while cross-replica clones share almost no 3-grams. A
  naive copy would make every doc a 10-way exact near-dup and grow
  LSH pair output ~50x — a different workload, not a bigger one.
- ``part.p_brand``: replica-suffixed — p_brand is a linkage blocking
  key, so cross-replica name clones never enter the same block (a
  real 10x master table does not repeat every entity 10 times).

Usage:
    python tools/scale_stress_10x.py [--rebuild] [--dir /tmp/spark_graft_scale10x]
                                     [query ...]
Prints one JSON line {query: {t_1x, t_10x, exponent}}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
KEY_OFFSET = 10**9
SRC = "/root/testdata/sf0.1"

# every FK/id column that must shift per replica (keyspaces disjoint,
# FKs consistent because ALL keys shift by the same amount)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

DEFAULT_QUERIES = [
    "dedup_incremental_lsh_build",
    "dedup_incremental_lsh_probe",
    "dedup_minhash_poly",
    "embedding_ivf_int8",
    "link_golden_records",
    "graph_label_propagation",
    "graph_khop_reachability",
    "graph_triangle_count",
    "text_bpe_tokenize_large",
    "text_decontaminate",
]


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def build_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.sources.io import (
        read_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    for t in COPY_AS_IS:
        read_table(spark, SRC, t).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, keys in KEY_COLS.items():
        base = read_table(spark, SRC, t)
        reps = []
        for i in range(REPLICAS):
            rep = base
            for kcol in keys:
                rep = rep.withColumn(
                    kcol, F.col(kcol) + F.lit(i * KEY_OFFSET)
                )
            if t == "documents" and i > 0:
                vow, cons = "aeiou", "rstln"
                rep = rep.withColumn(
                    "text",
                    F.translate(
                        F.translate("text", vow, _rot(vow, i % 5)),
                        cons,
                        _rot(cons, (i // 5) * 2),
                    ),
                )
            if t == "part" and i > 0:
                rep = rep.withColumn(
                    "p_brand", F.concat("p_brand", F.lit(f"-r{i}"))
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"built {t}", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--dir", default="/tmp/spark_graft_scale10x")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    queries = args.queries or DEFAULT_QUERIES

    import __spark_entry__ as entry
    from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.session import (
        build_session,
    )

    spark = build_session("scale-stress-10x")
    marker = os.path.join(args.dir, "documents.parquet", "_SUCCESS")
    if args.rebuild or not os.path.exists(marker):
        t0 = time.time()
        build_corpus(spark, args.dir)
        print(f"corpus built in {time.time()-t0:.0f}s", file=sys.stderr)

    qs = entry.queries()
    out = {}
    for name in queries:
        fn = qs[name]
        res = {}
        for label, sf_dir in (("t_1x", SRC), ("t_10x", args.dir)):
            fn(spark, sf_dir).count()  # warm-up
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            res[label] = round(time.perf_counter() - t0, 3)
        res["exponent"] = round(math.log10(res["t_10x"] / res["t_1x"]), 2)
        out[name] = res
        print(f"{name}: {res}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
