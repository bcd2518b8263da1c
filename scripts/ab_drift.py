"""Interleaved A/B adjudication of the aggregate TPC-H drift gate
(VERDICT r13 'what's wrong' #1): the r13 driver bench recorded a
persistent +15.9% host-normalized move of the pinned 21-query TPC-H
subset while the subset's code was untouched — either residual host
drift the median range-sum probe under-corrects, or genuine
session-level overhead creep. A cross-round comparison cannot decide
this because the two measurements ran hours apart on a gusty host;
this script decides it by running BOTH checkouts in the SAME window,
strictly alternating A B A B ... so any host gust lands on both sides
symmetrically and cancels in the pairwise deltas.

Usage:
    python scripts/ab_drift.py [--pairs 3] [--sf-dir /root/testdata/sf0.1] \
        [--a /root/repo/.worktrees/r12] [--b /root/repo]

Each leg is a fresh subprocess (own JVM) that warms up with one tiny
query, runs the 21 pinned TPC-H queries once each, and prints one JSON
line. The verdict compares per-pair sums: a code-level regression
shows the SAME sign in every pair; host gusts show up as pair-to-pair
scatter. Prints one JSON summary line and exits 0."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the pinned aggregate-drift subset, imported from the gate this script
# adjudicates — a hardcoded copy could silently diverge from it
# (round-14 review finding). Imported from THIS checkout: the A/B legs
# run the checkout-specific QUERIES, but the measured subset must be
# the single current definition on both sides.
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("bench_mod", os.path.join(REPO, "bench.py"))
_bench = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
SUBSET = list(_bench._DRIFT_SUBSET)

_RUNNER = r"""
import json, os, sys, time
from chapterhousedb_spark.session import build_session
from chapterhousedb_spark.workload import QUERIES

subset = json.loads(sys.argv[1])
sf_dir = sys.argv[2]
spark = build_session(app_name="chdb-ab-drift")
QUERIES["scan_filter_project"](spark, sf_dir).limit(1).collect()  # warmup
t0 = time.perf_counter()
spark.range(50_000_000).selectExpr("sum(id)").collect()
probe = time.perf_counter() - t0
times = {}
for name in subset:
    t0 = time.perf_counter()
    QUERIES[name](spark, sf_dir).collect()
    times[name] = round(time.perf_counter() - t0, 3)
print(json.dumps({"queries": times, "total": round(sum(times.values()), 3),
                  "probe_sec": round(probe, 3)}))
"""


def run_leg(path: str, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUNNER)
        runner = f.name
    env = dict(os.environ, PYTHONPATH=path)
    try:
        out = subprocess.run(
            [sys.executable, runner, json.dumps(SUBSET), sf_dir],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
        )
    finally:
        os.unlink(runner)
    if out.returncode != 0:
        raise RuntimeError(
            f"leg at {path} failed rc={out.returncode}:\n{out.stderr[-2000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--a", default=os.path.join(REPO, ".worktrees", "r12"))
    ap.add_argument("--b", default=REPO)
    args = ap.parse_args()
    legs = []
    for i in range(args.pairs):
        # alternate WITHIN-pair order (a,b / b,a / a,b ...): a monotone
        # host ramp — thermal, background load growing or draining —
        # otherwise lands systematically on the second leg and reads
        # as a code delta
        order = (("a", args.a), ("b", args.b))
        if i % 2:
            order = order[::-1]
        for label, path in order:
            rec = run_leg(path, args.sf_dir)
            rec["label"] = label
            rec["pair"] = i
            legs.append(rec)
            print(
                json.dumps(
                    {
                        "leg": f"{label}{i}",
                        "total": rec["total"],
                        "probe_sec": rec["probe_sec"],
                    }
                ),
                file=sys.stderr,
            )
    a_totals = [r["total"] for r in legs if r["label"] == "a"]
    b_totals = [r["total"] for r in legs if r["label"] == "b"]
    pair_delta_pct = [
        round(100.0 * (b - a) / a, 2) for a, b in zip(a_totals, b_totals)
    ]
    # per-query medians across legs: scatter-resistant per-query view
    per_q = {}
    for q in SUBSET:
        am = statistics.median(
            r["queries"][q] for r in legs if r["label"] == "a"
        )
        bm = statistics.median(
            r["queries"][q] for r in legs if r["label"] == "b"
        )
        per_q[q] = {
            "a_med": round(am, 3),
            "b_med": round(bm, 3),
            "delta_pct": round(100.0 * (bm - am) / am, 1) if am else None,
        }
    med_a = statistics.median(a_totals)
    med_b = statistics.median(b_totals)
    same_sign = all(d > 0 for d in pair_delta_pct) or all(
        d < 0 for d in pair_delta_pct
    )
    drift_pct = round(100.0 * (med_b - med_a) / med_a, 2)
    print(
        json.dumps(
            {
                "metric": "ab_drift_tpch_subset",
                "a_totals": a_totals,
                "b_totals": b_totals,
                "pair_delta_pct": pair_delta_pct,
                "median_delta_pct": drift_pct,
                "same_sign_all_pairs": same_sign,
                "verdict": (
                    "code_level"
                    if same_sign and abs(drift_pct) > 5.0
                    else "host_noise"
                ),
                "per_query": per_q,
                "sf_dir": args.sf_dir,
                "n_pairs": args.pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
