"""Upsample the driver-generated testdata to a larger scale factor.

Usage: python tools/make_sf.py SRC_DIR DST_DIR [FACTOR=10]

Replicates every fact table FACTOR times with consistent key offsets
(copy i shifts each key family by i * (max_key + 1), so FK joins keep
their fan-out: 10x customers x 10x orders joins exactly like 1x x 1x,
ten times over). Dimension tables (nation, region) stay 1x — their
keys are referenced unshifted. Document text gets a per-copy suffix
token so exact-dedup does not collapse the whole corpus while
near-dup structure (LSH bucketing) stays realistic. Timestamps keep
their values: time-window aggregations get FACTOR-times denser windows,
the realistic shape for a larger corpus over the same period.

Pure DuckDB — no Spark needed to build the fixture.
"""
from __future__ import annotations

import os
import sys

import duckdb

FACT_OFFSETS = {
    # table -> {column: key-family whose (max+1) is the offset unit}
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
KEY_SOURCE = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
    "docid": ("documents", "doc_id"),
    "vecid": ("embeddings", "vec_id"),
}
DIMENSIONS = ["nation", "region"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    units = {}
    for fam, (tbl, col) in KEY_SOURCE.items():
        units[fam] = con.sql(
            f"SELECT MAX({col}) + 1 FROM "
            f"'{src}/{tbl}.parquet'").fetchone()[0]

    for t in DIMENSIONS:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
                f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied 1x")

    for t, offs in FACT_OFFSETS.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in offs:
                sel.append(f"{c} + i * {units[offs[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # keep copy 0 byte-identical; later copies get one
                # suffix token -> near-dups, not exact dups
                sel.append("CASE WHEN i = 0 THEN text ELSE "
                           "text || ' c' || i::VARCHAR END AS text")
            else:
                sel.append(c)
        q = (f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
             f"(SELECT UNNEST(RANGE({factor})) AS i) ORDER BY i")
        con.sql(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM "
                    f"'{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


if __name__ == "__main__":
    main()
