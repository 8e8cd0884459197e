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
    steal_flags = {}
    for q in runs[0]["queries"]:
        # prefer the min over CLEAN runs — neither cold (a
        # content-addressed rebuild reads ~3x steady-state; round-10
        # ann_pq 39.1s false flag) nor steal-polluted (co-tenant
        # hypervisor preemption >= 2% CPU steal stretches a run 2-4x on
        # a byte-identical plan; BRACKET_SF10_r11). Both are
        # measurement artifacts, not plan costs.
        states = [r.get("cache_state", {}).get(q) for r in runs]
        steals = [r.get("host_steal", {}).get(q) for r in runs]
        vals = [r["queries"].get(q) for r in runs]
        triples = [(v, s, st) for v, s, st in zip(vals, states, steals)
                   if v == v and v is not None]
        clean = [v for v, s, st in triples if s != "cold" and st is None]
        queries[q] = (min(clean) if clean else
                      min(v for v, _, _ in triples) if triples
                      else float("nan"))
        if any(states):
            cache_state[q] = [s or "nocache" for s in states]
        if any(st is not None for st in steals):
            steal_flags[q] = steals
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
        # the min over clean (warm, unstolen) runs when one exists
        out["cache_state"] = cache_state
        all_cold = sorted(q for q, ss in cache_state.items()
                          if all(s == "cold" for s in ss))
        if all_cold:
            out["cold_only"] = all_cold
    gates = [r.get("settle_gate") for r in runs]
    if any(gates):
        # per-run pre-run settle gate result (bench.py holds each run
        # until a 5s steal sample reads <1%, up to SPARK_GRAFT_SETTLE_SECS)
        out["settle_gate"] = gates
    if steal_flags:
        out["host_steal"] = steal_flags
        all_stolen = sorted(q for q, ss in steal_flags.items()
                            if all(st is not None for st in ss))
        if all_stolen:
            out["steal_only"] = all_stolen
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))


if __name__ == "__main__":
    main()
