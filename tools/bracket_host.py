"""Host-state bracketing for the sf10 wall-time swings (WATCHLIST
round-10: tpch_q5 5.7-34.9s on a byte-identical plan).

Runs a named query N times in one session, and around EVERY run samples
the subsystems the watchlist shortlisted:

- /proc/stat        -> CPU steal%, iowait%, system% over the run
- /proc/vmstat      -> compact_stall, pgsteal_*, pgscan_*, thp deltas
- GC                -> JVM GC time delta via py4j (getGarbageCollectorMXBeans)
- /proc/pressure/*  -> PSI some/full avg10 snapshots (cpu, memory, io)

Prints one line per run: wall seconds + every counter delta, so a slow
run can be attributed to the subsystem that moved with it.

Usage: python tools/bracket_host.py SF_DIR QUERY [N=8] [--json OUT]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VMSTAT_KEYS = [
    "compact_stall", "compact_fail", "compact_success",
    "pgsteal_kswapd", "pgsteal_direct", "pgscan_kswapd", "pgscan_direct",
    "thp_fault_alloc", "thp_collapse_alloc", "pgmajfault",
]


def read_proc_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return list(map(int, parts[1:]))


def read_vmstat():
    out = {}
    try:
        with open("/proc/vmstat") as f:
            for line in f:
                k, _, v = line.partition(" ")
                if k in VMSTAT_KEYS:
                    out[k] = int(v)
    except OSError:
        pass
    return out


def read_psi():
    out = {}
    for res in ("cpu", "memory", "io"):
        try:
            with open(f"/proc/pressure/{res}") as f:
                for line in f:
                    kind = line.split()[0]
                    avg10 = float(line.split("avg10=")[1].split()[0])
                    out[f"psi_{res}_{kind}_avg10"] = avg10
        except OSError:
            pass
    return out


def gc_ms(spark):
    """Total JVM GC milliseconds across collectors (driver == executor
    in local mode, so this IS the executor GC)."""
    try:
        jvm = spark.sparkContext._jvm
        beans = jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(beans.get(i).getCollectionTime()
                   for i in range(beans.size()))
    except Exception:
        return 0


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out_json]
    sf_dir, name = args[0], args[1]
    n = int(args[2]) if len(args) > 2 else 8

    from pyspark.sql import SparkSession
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "40g"))
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    fn = E.queries()[name]

    fn(spark, sf_dir).collect()  # warm (plan, JIT, page cache)
    rows = []
    for i in range(n):
        s0, v0, g0 = read_proc_stat(), read_vmstat(), gc_ms(spark)
        p0 = read_psi()
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        wall = time.monotonic() - t0
        s1, v1, g1 = read_proc_stat(), read_vmstat(), gc_ms(spark)
        p1 = read_psi()
        ds = [y - x for x, y in zip(s0, s1)]
        tot = sum(ds) or 1
        # jiffy accounting vs wall: a guest vCPU that the hypervisor
        # deschedules WITHOUT paravirt steal reporting simply stops
        # ticking — tick_ratio well under 1.0 means invisible
        # co-tenant starvation, which /proc/stat percentages can't show
        hz = os.sysconf("SC_CLK_TCK")
        ncpu = os.cpu_count()
        rec = {
            "run": i, "wall_s": round(wall, 2),
            "tick_ratio": round(tot / (ncpu * wall * hz), 3),
            "gc_ms": g1 - g0,
            "steal_pct": round(100 * ds[7] / tot, 2),
            "iowait_pct": round(100 * ds[4] / tot, 2),
            "system_pct": round(100 * ds[2] / tot, 2),
            "user_pct": round(100 * ds[0] / tot, 2),
            "idle_pct": round(100 * ds[3] / tot, 2),
        }
        for k in VMSTAT_KEYS:
            if k in v0 and k in v1 and v1[k] != v0[k]:
                rec[k] = v1[k] - v0[k]
        for k, v in p1.items():
            if v >= 0.5 or p0.get(k, 0) >= 0.5:
                rec[k] = v
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    walls = sorted(r["wall_s"] for r in rows)
    print(f"# spread: min={walls[0]} max={walls[-1]} "
          f"ratio={walls[-1] / walls[0]:.2f}", flush=True)
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "query": name, "runs": rows},
                      f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
