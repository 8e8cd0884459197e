"""Plan-hygiene audit over every driver query: exchanges, python-eval
nodes, join strategies, scan pushdown. Writes PLAN_AUDIT.md.

Red flags it hunts:
- BatchEvalPython  -> row-at-a-time python UDF in the plan (never OK);
- ArrowEvalPython / mapInPandas nodes are listed (expected only where
  pandas semantics or BLAS genuinely require python);
- CartesianProduct without an intentional broadcast;
- exchange counts per query (shuffle budget visibility).

Usage: python tools/audit_plans.py [sf_dir]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    qs = E.queries()

    rows = []
    flagged = []
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            rows.append((name, "-", "-", f"ERROR {str(e)[:80]}"))
            flagged.append(name)        # a broken query fails the gate
            continue
        n_ex = len(re.findall(r"(?<![A-Za-z])Exchange", plan))
        notes = []
        if "BatchEvalPython" in plan:
            notes.append("ROW-AT-A-TIME-PYTHON")
            flagged.append(name)
        py_nodes = sorted(set(re.findall(
            r"(ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)))
        if py_nodes:
            notes.append("+".join(py_nodes))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        if "CartesianProduct" in joins:
            notes.append("CARTESIAN")
            flagged.append(name)
        rows.append((name, n_ex, "+".join(joins) or "-",
                     " ".join(notes) or "-"))

    lines = ["# PLAN_AUDIT — physical-plan hygiene per driver query",
             "",
             f"sf_dir: {sf_dir}. Exchanges counted on the initial "
             "physical plan (executedPlan before AQE re-optimization). "
             "BatchEvalPython (row-at-a-time python), unintended "
             "CartesianProduct, and query build errors are hard failures.",
             "",
             "| query | exchanges | joins | python/flags |",
             "|---|---|---|---|"]
    for name, n_ex, joins, notes in rows:
        lines.append(f"| {name} | {n_ex} | {joins} | {notes} |")
    lines.append("")
    lines.append(f"**Flags: {sorted(set(flagged)) or 'none'}**")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLAN_AUDIT.md"), "w") as f:
        f.write(out)
    print(out)
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
