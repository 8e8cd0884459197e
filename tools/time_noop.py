"""Noop-sink per-query timer: like time_query.py but terminates each
query with the noop datasource write instead of a driver collect —
isolates executor-side compute for queries whose output is grid/pair
fan-out (the bench suite's "queries_noop" convention).

Usage:
    python tools/time_noop.py SF_DIR query [query ...] [--runs N] [--force]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = list(sys.argv[1:])
    runs, force = 2, False
    if "--force" in args:
        force = True
        args.remove("--force")
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    sf_dir, names = args[0], args[1:]
    load1 = os.getloadavg()[0]
    if load1 >= 1.0 and not force:
        sys.exit(f"machine unsettled (load1={load1:.2f}); pass --force")

    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "40g")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.driver.memory", mem)
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())
    import __spark_entry__ as E
    qs = E.queries()
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name}: runs={times} min={min(times)} "
              f"median={statistics.median(times)}", flush=True)


if __name__ == "__main__":
    main()
