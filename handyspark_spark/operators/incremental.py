"""Incremental aggregate maintenance: mergeable partial aggregates.

The streaming/batch-incremental pattern a 100 TB pipeline runs daily:
keep a compact per-key STATE table of algebraic aggregate pieces
(count / sum / min / max / sum-of-squares), fold each new data slice
into it with one co-grouped merge, and FINALIZE (mean/std/...) only when
serving. Recomputing from raw history is O(history); merging states is
O(|keys|) — the whole point.

Every piece here is an *algebraic* aggregate (Gray et al., "Data Cube",
Data Mining and Knowledge Discovery 1(1), 1997 — the classic
distributive/algebraic/holistic taxonomy): states merge by + / min / max,
so merge order never changes the result and partial states from ANY
partitioning (time slices, sources, streaming micro-batches) combine.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_aggregate", "merge_states", "finalize_state"]

_PIECES = ("n", "s", "s2", "mn", "mx")


def partial_aggregate(df: DataFrame, keys: list[str],
                      value_col: str) -> DataFrame:
    """One grouped pass -> per-key state (n, s, s2, mn, mx) for
    ``value_col``. NULL values contribute nothing (SQL aggregate
    convention)."""
    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("s2"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"))


def merge_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two state tables: full outer join on the keys, piecewise
    merge. Both sides are |keys|-sized — at scale this is the cheap join
    (co-partitioned if both states were written bucketed on the keys)."""
    bb = b
    for p in _PIECES:
        bb = bb.withColumnRenamed(p, f"_b_{p}")
    j = a.join(bb, keys, "full_outer")
    z = F.lit(0)
    return j.select(
        *keys,
        (F.coalesce("n", z) + F.coalesce("_b_n", z)).alias("n"),
        (F.coalesce("s", F.lit(0.0)) + F.coalesce("_b_s", F.lit(0.0)))
        .alias("s"),
        (F.coalesce("s2", F.lit(0.0)) + F.coalesce("_b_s2", F.lit(0.0)))
        .alias("s2"),
        # Spark's least/greatest skip NULLs (keys present on one side
        # merge correctly); coalesce guards the all-NULL edge
        F.coalesce(F.least("mn", "_b_mn"), F.col("mn"), F.col("_b_mn"))
        .alias("mn"),
        F.coalesce(F.greatest("mx", "_b_mx"), F.col("mx"), F.col("_b_mx"))
        .alias("mx"))


def finalize_state(state: DataFrame, keys: list[str],
                   round_to: int = 6) -> DataFrame:
    """State -> servable aggregates (n, total, mean, std, min, max).
    Sample std via the sum-of-squares identity
    ``var = (s2 - s²/n) / (n-1)``, clamped at 0 against floating
    cancellation; NULL when n < 2 (matches STDDEV_SAMP)."""
    n, s, s2 = F.col("n"), F.col("s"), F.col("s2")
    var = (s2 - s * s / n) / (n - F.lit(1))
    std = F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))

    # IEEE-deterministic rounding: floor(x*10^d + 0.5)/10^d in plain
    # double ops. Spark's ROUND re-expands the double as BigDecimal and
    # HALF_UPs the decimal digits; DuckDB rounds in float math — the two
    # disagree ~1e-5 of the time at representation boundaries (21/100k
    # user means flipped by exactly 1e-6 at sf1). This formula is the
    # same three IEEE ops on both engines, so results are bit-identical.
    p = F.lit(float(10 ** round_to))
    r6 = lambda c: F.floor(c * p + F.lit(0.5)) / p  # noqa: E731
    # mean divides the GRID-SNAPPED total, not the raw sum: the raw
    # double sum differs between engines/partitionings by a few ulps,
    # and s/n can land on a rounding boundary; r6(s) snaps both engines
    # to the same representable double first, making mean deterministic
    return state.select(
        *keys, "n",
        r6(s).alias("total"),
        r6(r6(s) / n).alias("mean"),
        F.when(n >= 2, r6(std)).alias("std"),
        F.col("mn").alias("min"),
        F.col("mx").alias("max"))
