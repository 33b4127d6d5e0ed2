"""Variance-band bench regression gate (VERDICT r8 #7).

Rounds 1-8 gated performance with a bare "2x the recorded baseline"
rule. Recordings show 0.88x-1.4x same-query host noise across rounds,
so 2x is simultaneously too loose for stable multi-second queries
(a real 1.8x regression passes) and occasionally too tight for noisy
sub-second ones. This gate compares a candidate bench run against
BENCH.json's per-query (median, sigma) — recorded by
``SPARK_GRAFT_BENCH_REPS=5 python bench.py`` — and flags

    t_candidate > min( 2 * median,                       # never looser
                       median + max(K * sigma,           # variance band
                                    REL_FLOOR * median,  # noise floor
                                    ABS_FLOOR) )         # timer floor

For queries recorded before sigma existed (or single-rep recordings)
the variance term drops out and the rel/abs floors still apply, so the
gate degrades gracefully to "1.25x with a 150 ms floor, capped by 2x".

Usage:
    python tools/bench_gate.py CANDIDATE.json [--baseline BENCH.json]
                               [--k 5] [--rel 0.25] [--abs 0.15]

Exit 0 = no regressions; 1 = regressions (printed per query);
missing baselines for new queries are reported but never fail the
gate (record them with the 5-rep protocol instead).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def evaluate(
    candidate: dict,
    baseline: dict,
    k: float = 5.0,
    rel_floor: float = 0.25,
    abs_floor: float = 0.15,
) -> dict:
    base_q = baseline.get("queries", {})
    base_sigma = baseline.get("sigma", {})
    cand_q = candidate.get("queries", {})
    regressions = []
    checked = 0
    for name, t in cand_q.items():
        med = base_q.get(name)
        if med is None:
            continue
        checked += 1
        sigma = base_sigma.get(name)
        # with a recorded sigma the variance band carries the gate and
        # the relative floor tightens (0.6x the legacy floor); without
        # one (legacy single-rep recordings) the full rel floor applies
        rel = rel_floor * 0.6 if sigma is not None else rel_floor
        band = med + max(k * (sigma or 0.0), rel * med, abs_floor)
        threshold = min(2.0 * med, band)
        if t > threshold:
            regressions.append(
                {
                    "query": name,
                    "sec": t,
                    "baseline_median": med,
                    "sigma": base_sigma.get(name),
                    "threshold": round(threshold, 3),
                    "ratio": round(t / med, 3) if med else None,
                }
            )
    unrecorded = sorted(set(cand_q) - set(base_q))
    stale = sorted(set(base_q) - set(cand_q))
    regressions.sort(key=lambda r: -(r["ratio"] or 0))
    return {
        "checked": checked,
        "regressions": regressions,
        "unrecorded": unrecorded,
        "baseline_only": stale,
    }


def _coerce_candidate(doc: dict) -> dict:
    """Accept bench.py stdout JSON directly, or a driver BENCH_r{N}
    record ({'parsed': <bench json>} when complete, or a truncated
    'tail' string — recovered best-effort by regexing name: sec
    pairs)."""
    if "queries" in doc:
        return doc
    if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
        return doc["parsed"]
    import re

    tail = doc.get("tail", "")
    pairs = re.findall(r'\\?"([a-z0-9_]+)\\?":\s*([0-9]+\.[0-9]+)', tail)
    queries = {
        name: float(sec)
        for name, sec in pairs
        if name not in ("value", "sf")
    }
    return {"queries": queries}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate", help="bench output JSON to gate")
    ap.add_argument(
        "--baseline", default=os.path.join(REPO, "BENCH.json")
    )
    ap.add_argument("--k", type=float, default=5.0)
    ap.add_argument("--rel", type=float, default=0.25)
    ap.add_argument("--abs", dest="abs_floor", type=float, default=0.15)
    args = ap.parse_args()

    with open(args.candidate) as f:
        candidate = json.load(f)
    candidate = _coerce_candidate(candidate)
    with open(args.baseline) as f:
        baseline = json.load(f)

    result = evaluate(candidate, baseline, args.k, args.rel, args.abs_floor)
    for r in result["regressions"]:
        print(
            f"REGRESSION {r['query']}: {r['sec']}s vs median "
            f"{r['baseline_median']}s (sigma={r['sigma']}, threshold "
            f"{r['threshold']}s, ratio {r['ratio']}x)"
        )
    if result["unrecorded"]:
        print(f"unrecorded (new, need 5-rep baselines): {result['unrecorded']}")
    if result["baseline_only"]:
        print(f"baseline-only (dropped from headline): {result['baseline_only']}")
    print(
        json.dumps(
            {
                "checked": result["checked"],
                "n_regressions": len(result["regressions"]),
                "n_unrecorded": len(result["unrecorded"]),
            }
        )
    )
    return 1 if result["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
