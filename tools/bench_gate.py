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

Control normalization (VERDICT r9 #3): three rounds running, the
single-rep per-round bench produced >1.5x flags that evaporated under
5-rep isolation — the raw wall-time gate cannot separate host/JVM
state from code regressions. Every bench run times the CONTROL
queries (stable, code-frozen shapes: a scan+agg, a text scan, a
broadcast join); the gate estimates the host factor as the median of
(candidate_control / baseline_control) and normalizes every candidate
time by it before applying the band. A genuinely regressed query
moves AGAINST the controls and still flags; a uniformly slow host
moves WITH them and doesn't. The factor is clamped to [0.67, 1.5] —
beyond that the host is too disturbed to adjudicate and the run
should be repeated instead of silently rescaled (the gate prints the
raw factor either way).

Usage:
    python tools/bench_gate.py CANDIDATE.json [--baseline BENCH.json]
                               [--k 5] [--rel 0.25] [--abs 0.15]
                               [--no-controls]

Exit 0 = no regressions; 1 = regressions (printed per query);
missing baselines for new queries are reported but never fail the
gate (record them with the 5-rep protocol instead).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Stable, code-frozen shapes used to estimate host state. Keep in sync
# with bench.py CONTROLS (guarded by tests/test_bench_controls.py).
CONTROLS = ["q1_pricing_summary", "text_stats", "join_inner_fk_agg"]

# beyond this the host is too disturbed to adjudicate by rescaling
FACTOR_CLAMP = (0.67, 1.5)


def _control_ratios(candidate: dict, baseline: dict, exclude: str | None = None):
    base_q = baseline.get("queries", {})
    cand_q = candidate.get("queries", {})
    return [
        cand_q[c] / base_q[c]
        for c in CONTROLS
        if c != exclude and c in cand_q and base_q.get(c)
    ]


def host_factor(
    candidate: dict, baseline: dict, exclude: str | None = None
) -> "tuple[float, float | None]":
    """(clamped, raw) median candidate/baseline ratio over the control
    queries present in both runs; (1.0, None) when fewer than two
    controls are available. ``exclude`` drops one control from the
    estimate — used to gate each control against its PEERS
    (leave-one-out), so a uniformly slow host exonerates the controls
    too while a single control that regressed in code still flags."""
    ratios = _control_ratios(candidate, baseline, exclude)
    if len(ratios) < 2:
        return 1.0, None
    raw = statistics.median(ratios)
    return min(max(raw, FACTOR_CLAMP[0]), FACTOR_CLAMP[1]), raw


def evaluate(
    candidate: dict,
    baseline: dict,
    k: float = 5.0,
    rel_floor: float = 0.25,
    abs_floor: float = 0.15,
    use_controls: bool = True,
) -> dict:
    base_q = baseline.get("queries", {})
    base_sigma = baseline.get("sigma", {})
    cand_q = candidate.get("queries", {})
    factor, raw_factor = (
        host_factor(candidate, baseline) if use_controls else (1.0, None)
    )
    regressions = []
    checked = 0
    for name, t in cand_q.items():
        med = base_q.get(name)
        if med is None:
            continue
        checked += 1
        # control-normalize: judge the query against how the HOST
        # moved, not the wall clock. A control is judged against its
        # PEER controls (leave-one-out) — normalizing a control by a
        # factor containing itself would blind the gate to a real
        # regression in control code, while raw gating would flag all
        # controls on any slow host.
        if not use_controls:
            t_norm = t
        elif name in CONTROLS:
            t_norm = t / host_factor(candidate, baseline, exclude=name)[0]
        else:
            t_norm = t / factor
        sigma = base_sigma.get(name)
        # with a recorded sigma the variance band carries the gate and
        # the relative floor tightens (0.6x the legacy floor); without
        # one (legacy single-rep recordings) the full rel floor applies
        rel = rel_floor * 0.6 if sigma is not None else rel_floor
        band = med + max(k * (sigma or 0.0), rel * med, abs_floor)
        threshold = min(2.0 * med, band)
        if t_norm > threshold:
            regressions.append(
                {
                    "query": name,
                    "sec": t,
                    "sec_normalized": round(t_norm, 3),
                    "baseline_median": med,
                    "sigma": base_sigma.get(name),
                    "threshold": round(threshold, 3),
                    "ratio": round(t_norm / med, 3) if med else None,
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
        "host_factor": round(factor, 4),
        "host_factor_raw": round(raw_factor, 4) if raw_factor else None,
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
    ap.add_argument(
        "--no-controls",
        action="store_true",
        help="gate on raw wall time (legacy pre-r10 behavior)",
    )
    args = ap.parse_args()

    with open(args.candidate) as f:
        candidate = json.load(f)
    candidate = _coerce_candidate(candidate)
    with open(args.baseline) as f:
        baseline = json.load(f)

    result = evaluate(
        candidate,
        baseline,
        args.k,
        args.rel,
        args.abs_floor,
        use_controls=not args.no_controls,
    )
    print(
        f"host factor {result['host_factor']}"
        + (
            f" (raw {result['host_factor_raw']})"
            if result.get("host_factor_raw") is not None
            else " (controls unavailable)"
        )
    )
    for r in result["regressions"]:
        print(
            f"REGRESSION {r['query']}: {r['sec']}s "
            f"(normalized {r['sec_normalized']}s) vs median "
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
                "host_factor": result["host_factor"],
            }
        )
    )
    return 1 if result["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
