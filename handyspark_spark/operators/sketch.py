"""Count-min sketch — frequency estimation in fixed memory.

Completes the mergeable-sketch family (HLL distinct counts are native
``approx_count_distinct``; set membership is ``operators/bloom.py``): CMS
answers "how often does item x occur" over a stream/corpus too large for
an exact per-key table, with one-sided error (never underestimates;
overestimates by at most ε·N with probability 1-δ, ε = e/width,
δ = e^-depth).

Distributed representation mirrors the Bloom filter: the sketch IS a
DataFrame of (d, w_idx, cnt) cells — build = one explode (depth rows per
item) + one groupBy sum (map-side combined), output ≤ depth × width rows
regardless of input size. Two sketches merge by union + re-sum (counts
are additive), which is what makes per-day incremental builds work.
Probes broadcast the cell table. Hashing is seeded xxhash64 — JVM-native,
no UDFs anywhere.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_estimate", "cms_merge", "cms_topk"]

_SEED0 = 101


def _cells(col: Column, width: int, depth: int) -> Column:
    return F.array(*[
        F.struct(F.lit(d).alias("d"),
                 F.pmod(F.xxhash64(col, F.lit(_SEED0 + d)), F.lit(width))
                 .alias("w_idx"))
        for d in range(depth)])


def cms_build(df: DataFrame, col: str, width: int = 8192,
              depth: int = 4, weight: Column | str | None = None
              ) -> DataFrame:
    """Build the (d, w_idx, cnt) cell table. ``weight`` counts each row
    by a column (e.g. token counts) instead of 1."""
    w = (F.lit(1) if weight is None else
         (F.col(weight) if isinstance(weight, str) else weight))
    c = F.col(col)
    return (df.select(F.explode(_cells(c, width, depth)).alias("_c"),
                      w.cast("long").alias("_w"))
            .groupBy(F.col("_c.d").alias("d"),
                     F.col("_c.w_idx").alias("w_idx"))
            .agg(F.sum("_w").alias("cnt")))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth) — counts
    are additive, so merge order never matters (incremental daily
    builds)."""
    return (a.unionByName(b)
            .groupBy("d", "w_idx").agg(F.sum("cnt").alias("cnt")))


def cms_estimate(items: DataFrame, col: str, cms: DataFrame,
                 width: int = 8192, depth: int = 4,
                 out_col: str = "est") -> DataFrame:
    """Point-query estimates for candidate items: min over the depth
    probed cells (absent cell = 0). Cell table broadcasts; cost is
    depth rows per item."""
    probes = (items.select(F.col(col).alias("_k"))
              .distinct()
              .select("_k", F.explode(_cells(F.col("_k"), width, depth))
                      .alias("_c"))
              .select("_k", F.col("_c.d").alias("d"),
                      F.col("_c.w_idx").alias("w_idx")))
    est = (probes.join(F.broadcast(cms), ["d", "w_idx"], "left")
           .groupBy("_k")
           .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .alias(out_col))
           .withColumnRenamed("_k", col))
    return items.join(est, col, "left")


def cms_topk(df: DataFrame, col: str, k: int = 10, width: int = 8192,
             depth: int = 4, candidate_fraction: float = 0.05,
             seed: int = 42) -> DataFrame:
    """Approximate heavy hitters in bounded memory: candidates come from
    a ROW sample (an item occurring n times survives with prob
    1-(1-f)^n, so true heavy hitters are almost surely present in any
    few-percent sample); their frequencies come from the sketch over the
    FULL data. Output: (value, est) top-k by estimate. Candidate
    discovery is sampled, so borderline tail members can vary between
    layouts — the head is stable. The exact equivalent is one
    groupBy-count + TakeOrdered; CMS wins when the sketch is maintained
    incrementally and the raw data is gone."""
    cms = cms_build(df, col, width, depth)
    cand = df.sample(candidate_fraction, seed=seed).select(col).distinct()
    est = cms_estimate(cand, col, cms, width, depth)
    return (est.orderBy(F.desc("est"), F.asc(col)).limit(k))
