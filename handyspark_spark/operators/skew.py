"""Skew-aware aggregation and join helpers.

At 100 TB a single hot key (one language, one boilerplate document, one
null-heavy join column) can pin an entire stage on one task. Two standard
mitigations, exposed as composable helpers:

- ``salted_agg``: two-phase aggregation — phase 1 groups on
  (key, random-salt) so a hot key's rows spread over N partial groups,
  phase 2 merges partials per key. Correct for any algebraic aggregate
  expressed as (partial expr, merge expr) pairs.
- ``salted_join``: replicate the small side N ways, salt the big side —
  an explicit fallback for when AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``, on by default here) doesn't
  apply (e.g. non-shuffle joins, or pre-3.0 clusters).

Note: Spark's AQE already splits skewed SHUFFLE partitions adaptively;
these helpers are for the cases the runtime can't see — pre-aggregation
before a shuffle whose key histogram you already know is degenerate.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr(col), merge_expr(partial_col)) pairs for algebraic aggs
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, keys: list[str], aggs: dict[str, tuple],
               salt_buckets: int = 16) -> DataFrame:
    """``aggs``: {out_name: (fn_name, colname)} with fn_name in
    sum/count/min/max (avg = sum+count composed by the caller — it is not
    algebraic over partials without both).

    Result is EXACTLY the plain ``groupBy(keys)`` aggregation; the salt
    only reshapes the first shuffle."""
    salted = df.withColumn("_salt",
                           (F.rand(42) * salt_buckets).cast("int"))
    partials = []
    finals = []
    for out, (fn, col) in aggs.items():
        p_fn, m_fn = _ALGEBRAIC[fn]
        partials.append(p_fn(F.col(col) if col else None)
                        .alias(f"_p_{out}"))
        finals.append(m_fn(F.col(f"_p_{out}")).alias(out))
    phase1 = salted.groupBy(*(keys + ["_salt"])).agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(big: DataFrame, small: DataFrame, big_key: str,
                small_key: str, salt_buckets: int = 8,
                how: str = "inner") -> DataFrame:
    """Salt the big side, replicate the small side ``salt_buckets``× —
    every hot key's rows land in distinct shuffle partitions.

    Only big-side-preserving join types are valid: with the small side
    replicated, right/full outer joins would emit one (possibly
    null-padded) row per surviving replica."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r} "
            "(small-side replication breaks right/full outer semantics)")
    b = big.withColumn("_salt", (F.rand(42) * salt_buckets).cast("int"))
    s = (small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i)
                                     for i in range(salt_buckets)]))))
    out = b.join(s, (F.col(big_key) == F.col(small_key)) &
                 (b["_salt"] == s["_salt"]), how)
    return out.drop("_salt")
