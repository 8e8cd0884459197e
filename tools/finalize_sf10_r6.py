"""Assemble ORACLE_SF10_r6.json from the round-6 partial runs.

Inputs (in priority order handled by merge_oracle_runs ranking):
- ORACLE_SF10_main_r6.json  -- part-1 serial run: 41 value passes, then
  the session died; its {"err": "spark_error"} placeholder FAILs for the
  unreached queries are dropped here (they were never executed — the
  chunk runs below re-ran every one of them).
- /tmp/oracle_sf10_part2_prefix.log -- the restarted serial run's 10
  PASS lines (ann/curve/stat block), recovered via --keep-log semantics.
- ORACLE_SF10_c{0,1,2}.json -- the three parallel chunk runs covering
  the remaining 105 queries.
- ORACLE_SF10_annpq_r6.json -- dedicated ann_pq value-level pass.
- ORACLE_SF10_shc_r6.json   -- dedicated simhash_pairs_capped run
  (optional; merged if present).
- /tmp/ORACLE_SF10_nd.json  -- embedding_neardup rows-only (19.1M rows);
  its value-level evidence is the committed NEARDUP_SF10_r6.json sampled
  oracle (1/23 id sample, 32,076/32,076 pairs) — the entry is annotated
  with that pointer.

Usage: python tools/finalize_sf10_r6.py
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def main():
    main_r6 = json.load(open(f"{REPO}/ORACLE_SF10_main_r6.json"))
    kept = {k: v for k, v in main_r6["queries"].items()
            if v.get("status") == "pass"}
    dropped = len(main_r6["queries"]) - len(kept)
    print(f"main_r6: kept {len(kept)} passes, dropped {dropped} "
          f"never-executed placeholders")
    tmp_main = "/tmp/ORACLE_SF10_main_passonly.json"
    json.dump({"sf_dir": main_r6.get("sf_dir"), "queries": kept},
              open(tmp_main, "w"))

    prefix_names = []
    for line in open("/tmp/oracle_sf10_part2_prefix.log"):
        for m in re.finditer(r"PASS (\w+) \((\d+) rows\)", line):
            prefix_names.append(m.group(1))
    print(f"prefix log: {sorted(set(prefix_names))}")

    nd = json.load(open("/tmp/ORACLE_SF10_nd.json"))
    nd_entry = nd["queries"]["embedding_neardup"]
    nd_entry["note"] = ("value-level evidence: NEARDUP_SF10_r6.json "
                        "(sampled 1/23 DuckDB brute force, 32076/32076)")
    tmp_nd = "/tmp/ORACLE_SF10_nd_annot.json"
    json.dump({"sf_dir": nd.get("sf_dir"),
               "queries": {"embedding_neardup": nd_entry}},
              open(tmp_nd, "w"))

    # c1 re-ran embedding_neardup rows-only at 10 cores, which OOMs the
    # BLAS-block python workers (the verify skill pins this op at <=8
    # cores); the dedicated 8-core run (/tmp/ORACLE_SF10_nd.json +
    # NEARDUP_SF10_r6.json sampled value pass) is the evidence — drop
    # the OOM'd entry so it can't outrank the real one in the merge.
    c1 = json.load(open(f"{REPO}/ORACLE_SF10_c1.json"))
    c1["queries"].pop("embedding_neardup", None)
    tmp_c1 = "/tmp/ORACLE_SF10_c1_filtered.json"
    json.dump(c1, open(tmp_c1, "w"))

    # c0 hit a mid-run module-reload ImportError on ann_pq_exact (the
    # IVF-PQ commit landed while its long-lived interpreter held the
    # old similarity module) — never a query result; the dedicated
    # re-run artifact below carries the real verdict.
    c0 = json.load(open(f"{REPO}/ORACLE_SF10_c0.json"))
    c0["queries"].pop("ann_pq_exact", None)
    tmp_c0 = "/tmp/ORACLE_SF10_c0_filtered.json"
    json.dump(c0, open(tmp_c0, "w"))

    inputs = [tmp_main, tmp_nd,
              f"{REPO}/ORACLE_SF10_annpq_r6.json",
              tmp_c0,
              tmp_c1,
              f"{REPO}/ORACLE_SF10_c2.json",
              f"{REPO}/ORACLE_SF10_ivfpq_r6.json",
              f"{REPO}/ORACLE_SF10_pqexact_r6.json"]
    shc = f"{REPO}/ORACLE_SF10_shc_r6.json"
    if os.path.exists(shc):
        inputs.append(shc)
    cmd = [sys.executable, f"{REPO}/tools/merge_oracle_runs.py",
           f"{REPO}/ORACLE_SF10_r6.json", *inputs,
           "--keep-log", "/tmp/oracle_sf10_part2_prefix.log",
           ",".join(sorted(set(prefix_names)))]
    subprocess.run(cmd, check=True)

    out = json.load(open(f"{REPO}/ORACLE_SF10_r6.json"))
    sys.path.insert(0, REPO)
    import __spark_entry__  # registry size check
    n_reg = len(__spark_entry__.queries())
    print(f"coverage: {out['n_queries']}/{n_reg} registry queries; "
          f"{out['n_pass']} pass, {out['n_fail']} fail, "
          f"{out['n_weak']} weak")
    missing = set(__spark_entry__.queries()) - set(out["queries"])
    if missing:
        print(f"MISSING from sf10 artifact: {sorted(missing)}")


if __name__ == "__main__":
    main()
