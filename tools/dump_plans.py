"""Dump ``explain("formatted")`` for named driver queries to files.

The optimization rounds commit before/after physical plans under
``plans/r<N>/<query>_{before,after}.txt`` so plan-shape claims in
OPTIMIZATION_r<N>.md are checkable without running Spark. Run this from
the tree whose plan you want (a git worktree of the pre-change commit
for the ``_before`` files, HEAD for ``_after``).

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] --queries a,b,c

Writes OUT_DIR/<query>_<SUFFIX>.txt. ``sf_dir`` defaults to
/root/testdata/sf0.01 (plan shape, not timing — small SF is fine; the
row-count-gated strategies pick their small-SF branch, which is noted
in the header line of each file).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = list(sys.argv[1:])
    names = []
    if "--queries" in args:
        i = args.index("--queries")
        names = [n for n in args[i + 1].split(",") if n]
        del args[i:i + 2]
    if len(args) < 2:
        sys.exit(__doc__)
    out_dir, suffix = args[0], args[1]
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    qs = E.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} (explain formatted)\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
