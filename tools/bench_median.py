"""Median-of-3 bench per the BASELINE.md protocol: run bench.py N times
back-to-back, take the per-query MEDIAN, record raw suite totals.

Usage: python tools/bench_median.py [OUT.json] [N=3]

Environment passes through to bench.py ($SPARK_GRAFT_SF_DIR etc.).
Refuses to start unless 1-minute load average is under 1.0 (settled-
machine precondition; override with HSQ_BENCH_FORCE=1).
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
        # bench.py TRUNCATES its stdout line to fit the driver's tail
        # buffer (queries_shown < total past ~100 queries) — the full
        # per-query payload is what it writes to bench_full.json; read
        # THAT, and stash a per-run copy since each run overwrites it.
        full = os.path.join(here, "bench_full.json")
        if p.returncode != 0 or not os.path.exists(full):
            sys.exit(f"run {i}: bench failed (rc={p.returncode}); "
                     f"stderr tail: {p.stderr[-500:]}")
        with open(full) as f:
            rec = json.load(f)
        with open(f"/tmp/bench_run_{i}.json", "w") as f:
            json.dump(rec, f)
        runs.append(rec)
        print(f"run {i}: total={rec['value']}s n={len(rec['queries'])}",
              flush=True)

    missing = [(i, q) for i, r in enumerate(runs)
               for q in set(runs[0]["queries"]) - set(r["queries"])]
    if missing:
        sys.exit(f"runs disagree on the query set: {missing}")

    qnames = runs[0]["queries"].keys()
    med = {q: round(statistics.median(r["queries"][q] for r in runs), 3)
           for q in qnames}
    out = {
        "metric": runs[0]["metric"],
        "value": round(sum(med.values()), 3),
        "unit": "sec",
        "queries": med,
        "sf": runs[0]["sf"],
        "protocol": f"median_of_{n}_settled_runs",
        "run_totals": [r["value"] for r in runs],
    }
    if "queries_noop" in runs[0]:
        out["queries_noop"] = {
            q: round(statistics.median(
                r["queries_noop"][q] for r in runs), 3)
            for q in runs[0]["queries_noop"]}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("value", "run_totals", "protocol", "sf")}))


if __name__ == "__main__":
    main()
