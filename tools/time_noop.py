"""Noop-sink per-query timer — a shim over ``time_query.py --sink noop``
(kept for the CLI its defaults established: 2 runs, 40g driver).

Usage:
    python tools/time_noop.py SF_DIR query [query ...] [--runs N] [--force]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "40g")
    argv = sys.argv[1:]
    if "--runs" not in argv:
        argv += ["--runs", "2"]
    sys.argv = [sys.argv[0]] + argv + ["--sink", "noop"]
    import time_query
    time_query.main()
