"""Per-query min-of-N bench for the large-SF protocol (BASELINE.md):
run bench.py N times back-to-back, take the per-query MIN (the
settled-machine estimator for noop-sink scale runs, where the
dominant noise is one-sided host interference), record raw totals.

Usage: python tools/bench_minof.py OUT.json [N=2]

Environment passes through to bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_BENCH_SINK, $SPARK_GRAFT_BENCH_SKIP, ...). Refuses on an
unsettled machine (load1 >= 1.0) unless HSQ_BENCH_FORCE=1.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    out_path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    load1 = os.getloadavg()[0]
    if load1 >= 1.0 and not os.environ.get("HSQ_BENCH_FORCE"):
        sys.exit(f"machine not settled (load1={load1:.2f}); wait or "
                 f"set HSQ_BENCH_FORCE=1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    for i in range(n):
        p = subprocess.run([sys.executable,
                            os.path.join(here, "bench.py")],
                           capture_output=True, text=True)
        full = os.path.join(here, "bench_full.json")
        if p.returncode != 0 or not os.path.exists(full):
            sys.exit(f"run {i}: bench failed (rc={p.returncode}); "
                     f"stderr tail: {p.stderr[-500:]}")
        with open(full) as f:
            runs.append(json.load(f))
        os.rename(full, full + f".minof_run{i}")
    queries = {}
    cache_state = {}
    for q in runs[0]["queries"]:
        # prefer the min over WARM runs: a cold content-addressed
        # rebuild (wiped /tmp) reads ~3x steady-state and is a
        # measurement artifact, not a plan cost — gate the warm number
        # (BASELINE.md invariant; round-10 ann_pq 39.1s false flag)
        states = [r.get("cache_state", {}).get(q) for r in runs]
        pairs = [(r["queries"][q], s) for r, s in zip(runs, states)
                 if r["queries"].get(q) == r["queries"].get(q)]
        warm = [v for v, s in pairs if s != "cold"]
        queries[q] = (min(warm) if warm else
                      min(v for v, _ in pairs) if pairs else float("nan"))
        if any(states):
            cache_state[q] = [s or "nocache" for s in states]
    out = {
        "metric": "operator_suite_wall_clock",
        "value": round(sum(v for v in queries.values() if v == v), 3),
        "unit": "sec",
        "queries": queries,
        "sf": runs[0].get("sf"),
        "sink": os.environ.get("SPARK_GRAFT_BENCH_SINK", "collect"),
        "skipped": sorted(s for s in os.environ.get(
            "SPARK_GRAFT_BENCH_SKIP", "").split(",") if s),
        "protocol": f"per_query_min_of_{n}_full_runs_warm_preferred",
        "run_totals": [round(r["value"], 3) for r in runs],
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    if cache_state:
        # per-run cold/warm per cached query; the recorded min above is
        # the min over warm runs when one exists
        out["cache_state"] = cache_state
        all_cold = sorted(q for q, ss in cache_state.items()
                          if all(s == "cold" for s in ss))
        if all_cold:
            out["cold_only"] = all_cold
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
