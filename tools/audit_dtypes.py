"""Audit dtype-class agreement between every queries() result and its
oracle_sql() result in pandas form.

The driver's correctness gate hashes values after its own normalization;
a column that is int64 on the Spark side but float64 on the DuckDB side
(e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64) can hash-mismatch even
when the values are numerically identical.  This tool flags every such
column so the oracle SQL can be CAST-fixed.

Usage: python tools/audit_dtypes.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dclass(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("datetime"):
        return "datetime"
    if s == "bool":
        return "bool"
    return "object"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    qs, oracles = E.queries(), E.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:200]}")
            bad += 1
            continue
        for c in sorted(set(sdf.columns) & set(odf.columns)):
            sc, oc = dclass(sdf[c].dtype), dclass(odf[c].dtype)
            if sc != oc:
                print(f"MISMATCH {name}.{c}: spark={sdf[c].dtype} "
                      f"oracle={odf[c].dtype}")
                bad += 1
    print(f"\n{bad} dtype-class mismatches")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()


