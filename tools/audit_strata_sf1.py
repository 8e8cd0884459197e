"""Plan-parity audit for the strata operator family at sf1.

The exchange-budget assertions in tests/test_plans.py run at the toy
test SF; this tool pins that the SAME physical budgets hold on the sf1
fixture — per query it records the exchange count at the test SF
(sf0.001) and at sf1, asserts equality (a plan that grows extra
shuffles with data size is a scale bug, not a constant-factor cost),
and times the sf1 execution. Committed per round as
STRATA_SF1_r{N}.json.

Usage: python tools/audit_strata_sf1.py [SF1_DIR] [--json OUT.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the strata engine surface: stratified @agg fast paths, bucketing,
# stratified fill/fence (fit is eager; the audited plan is the apply +
# aggregation), and the stratified spearman (constant-in-M exchanges)
QUERIES = ["strat_mean", "strat_median", "strat_value_counts",
           "bucket_counts", "quantile_bucket_counts", "fill_mean",
           "fence_sum", "spearman_corr", "value_counts", "mode"]


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    sf1_dir = args[0] if args else "/tmp/sf1"
    base_dir = "/root/testdata/sf0.001"

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from handyspark_spark.core.util import exchange_count
    import __spark_entry__ as E
    qs = E.queries()

    results, ok = {}, True
    for name in QUERIES:
        fn = qs[name]
        e_base = exchange_count(fn(spark, base_dir))
        df1 = fn(spark, sf1_dir)
        e_sf1 = exchange_count(df1)
        t0 = time.perf_counter()
        n = df1.count()
        dt = round(time.perf_counter() - t0, 3)
        match = e_base == e_sf1
        ok &= match
        results[name] = {"exchanges_sf0.001": e_base,
                         "exchanges_sf1": e_sf1,
                         "budget_holds": match,
                         "sf1_rows": int(n), "sf1_sec": dt}
        print(f"{'PASS' if match else 'FAIL'} {name}: "
              f"exchanges {e_base} -> {e_sf1}, {n} rows, {dt}s")

    payload = {"sf1_dir": sf1_dir, "queries": results,
               "all_budgets_hold": ok}
    if json_out:
        with open(json_out, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    print("PASS" if ok else "FAIL")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
