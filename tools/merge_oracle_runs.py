"""Merge partial verify_oracle JSON artifacts into one suite artifact.

The full 152-query sf10 suite is too slow for one serial process (Spark
idles while DuckDB computes the oracle and vice versa), so round 5 runs
it as two parallel halves plus a prefix from an earlier serial run.
This stitches them back into the committed ORACLE_SF10_r{N}.json with
recomputed summary counts.

Usage: python tools/merge_oracle_runs.py OUT.json IN1.json IN2.json ...
       [--keep-log LOG names,comma,separated]

``--keep-log``: recover {"status","rows"} entries for the named queries
from a verify_oracle stdout log of a run that was stopped before it
wrote JSON (only PASS lines are recovered — anything else must re-run).
"""
from __future__ import annotations

import json
import re
import sys


def main():
    args = sys.argv[1:]
    out = args.pop(0)
    keep_log, keep_names = None, set()
    if "--keep-log" in args:
        i = args.index("--keep-log")
        keep_log, keep_names = args[i + 1], set(args[i + 2].split(","))
        del args[i:i + 3]

    queries: dict = {}
    sf_dir = None
    if keep_log:
        for line in open(keep_log):
            m = re.search(r"PASS (\w+) \((\d+) rows\)", line)
            if m and m.group(1) in keep_names:
                queries[m.group(1)] = {"status": "pass",
                                       "rows": int(m.group(2)),
                                       "source": "prefix_run_log"}
        missing = keep_names - set(queries)
        if missing:
            sys.exit(f"keep-log is missing PASS lines for: {missing}")
    def rank(entry):
        # real verdicts beat placeholders regardless of argument order:
        # verify_oracle writes {"status": "skip"} rows for every
        # --skip'ed query, and a half-run's skip must never clobber a
        # recovered pass/fail
        return {"pass": 3, "fail": 3, "weak": 2}.get(entry["status"], 1)

    for path in args:
        d = json.load(open(path))
        sf_dir = sf_dir or d.get("sf_dir")
        for name, entry in d["queries"].items():
            prev = queries.get(name)
            if prev is None or rank(entry) > rank(prev):
                queries[name] = entry
            elif (rank(entry) == rank(prev)
                  and entry["status"] != prev["status"]):
                sys.exit(f"CONFLICT on {name!r}: {prev['status']} vs "
                         f"{entry['status']} ({path}) — resolve by "
                         f"re-running the query, not by merge order")

    summary = {"sf_dir": sf_dir, "queries": queries,
               "n_queries": len(queries),
               "n_pass": sum(v["status"] == "pass"
                             for v in queries.values()),
               "n_fail": sum(v["status"] == "fail"
                             for v in queries.values()),
               "n_weak": sum(v["status"] == "weak"
                             for v in queries.values()),
               "merged_from": args + ([keep_log] if keep_log else [])}
    with open(out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"wrote {out}: {summary['n_pass']} pass, "
          f"{summary['n_fail']} fail, {summary['n_weak']} weak "
          f"({len(queries)} queries)")


if __name__ == "__main__":
    main()
