"""Interleaved A/B bench driver (round 13): alternates old-code and
new-code isolated bench.py subset runs (A B A B ...) so slow host
drift cancels out of the pairwise ratios — the protocol the r12
single-shot comparisons lacked (controls swung 0.8-1.1x between
back-to-back runs on this host).

Usage:
  python tools/ab_interleave.py <old_repo_dir> <new_repo_dir> <pairs> <q1,q2,...>

Each leg is a fresh `python bench.py` process with
SPARK_GRAFT_BENCH_ONLY=<subset> and SPARK_GRAFT_BENCH_REPS=3 (median
of 3 inside each leg; the pairing handles cross-leg drift). Prints
per-query median-of-pairs ratio old/new (>1 = new faster).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_leg(repo: str, subset: str, reps: int = 3) -> dict[str, float]:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_BENCH_REPS=str(reps),
        SPARK_GRAFT_CPUS=env.get("SPARK_GRAFT_CPUS", "32"),
        SPARK_GRAFT_SF_DIR=env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_BENCH_ONLY=subset,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    # FIRST json line = the full per-query map (the last line is the
    # worst-10+controls summary, which silently drops queries that got
    # fast — exactly the ones an A/B cares about)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][0]
    return json.loads(line)["queries"]


def main() -> None:
    old_repo, new_repo, pairs, subset = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
        sys.argv[4],
    )
    olds: dict[str, list[float]] = {}
    news: dict[str, list[float]] = {}
    for i in range(pairs):
        o = run_leg(old_repo, subset)
        n = run_leg(new_repo, subset)
        for k, v in o.items():
            olds.setdefault(k, []).append(v)
        for k, v in n.items():
            news.setdefault(k, []).append(v)
        print(f"pair {i + 1}/{pairs} done", flush=True)
    result = {}
    for k in sorted(olds):
        om = statistics.median(olds[k])
        nm = statistics.median(news[k])
        ratios = [a / b for a, b in zip(olds[k], news[k])]
        result[k] = {
            "old_med": round(om, 3),
            "new_med": round(nm, 3),
            "ratio_med": round(statistics.median(ratios), 3),
            "old": [round(x, 3) for x in olds[k]],
            "new": [round(x, 3) for x in news[k]],
        }
        print(
            f"{om:7.3f} -> {nm:7.3f}  x{statistics.median(ratios):5.2f}  {k}",
            flush=True,
        )
    with open("/tmp/ab_result.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
