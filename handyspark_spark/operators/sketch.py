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

__all__ = ["cms_build", "cms_estimate", "cms_merge", "cms_topk",
           "hll_state", "hll_merge_estimate", "kll_state",
           "kll_merge_quantiles", "theta_state", "theta_overlap"]

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


# ---------------------------------------------------------------------------
# Native Datasketches wrappers (Spark 4 JVM implementations) — binary,
# mergeable sketch STATE as first-class table columns. These cover the
# "sketch per slice, merge later" incremental pattern the algebraic
# (n, s, s2) states in operators/incremental.py cannot: distinct counts
# (HLL), quantiles (KLL), and set intersections/differences (theta).
# ---------------------------------------------------------------------------

def hll_state(df: DataFrame, col: str, by: list[str] | None = None,
              lg_k: int = 12, out_col: str = "hll") -> DataFrame:
    """Per-group HLL sketch state (binary) — build once per slice (day,
    source, ...), store next to the slice; |groups| rows out."""
    g = df.groupBy(*(by or []))
    return g.agg(F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias(out_col))


def hll_merge_estimate(states: DataFrame, by: list[str] | None = None,
                       state_col: str = "hll",
                       out_col: str = "n_distinct") -> DataFrame:
    """Merge slice sketches (any order/grouping) and estimate distinct
    counts — the O(|slices|) daily-rollup path that never rescans
    history."""
    g = states.groupBy(*(by or []))
    return g.agg(F.hll_sketch_estimate(
        F.hll_union_agg(F.col(state_col))).alias(out_col))


def kll_state(df: DataFrame, col: str, by: list[str] | None = None,
              k: int = 200, out_col: str = "kll") -> DataFrame:
    """Per-group KLL quantile-sketch state over a double column."""
    g = df.groupBy(*(by or []))
    return g.agg(F.kll_sketch_agg_double(
        F.col(col).cast("double"), F.lit(k)).alias(out_col))


def kll_merge_quantiles(states: DataFrame, probs: list[float],
                        by: list[str] | None = None,
                        state_col: str = "kll") -> DataFrame:
    """Merge KLL slice states and read quantiles — mergeable
    percentiles for incremental pipelines (native ``percentile_approx``
    gives one-shot GK sketches but no storable/mergeable state)."""
    g = states.groupBy(*(by or []))
    # kll_sketch_merge_double is a BINARY scalar (no aggregate form):
    # fold the collected slice states — slice count is small by
    # construction (days/sources), so the per-group list is bounded
    lst = g.agg(F.collect_list(state_col).alias("_l"))
    merged = lst.select(
        *(by or []),
        F.aggregate(
            F.slice(F.col("_l"), 2, F.greatest(F.size("_l") - 1,
                                               F.lit(0))),
            F.element_at(F.col("_l"), 1),
            lambda acc, x: F.kll_sketch_merge_double(acc, x))
        .alias("_m"))
    cols = [F.kll_sketch_get_quantile_double(F.col("_m"), F.lit(p))
            .alias(f"q{str(p).replace('.', '_')}") for p in probs]
    return merged.select(*(by or []), *cols)


def theta_state(df: DataFrame, col: str, by: list[str] | None = None,
                out_col: str = "theta") -> DataFrame:
    """Per-group theta sketch state — distinct SETS you can union,
    intersect, and difference without the raw data."""
    g = df.groupBy(*(by or []))
    return g.agg(F.theta_sketch_agg(F.col(col)).alias(out_col))


def theta_overlap(a: DataFrame, b: DataFrame, state_col: str = "theta"
                  ) -> DataFrame:
    """Overlap report between two single-row theta states: estimated
    |A|, |B|, |A ∩ B|, |A \\ B| — e.g. user overlap between event types
    or doc overlap between crawl snapshots, computed from sketches
    alone."""
    aa = a.select(F.col(state_col).alias("_a"))
    bb = b.select(F.col(state_col).alias("_b"))
    j = aa.crossJoin(F.broadcast(bb))
    return j.select(
        F.theta_sketch_estimate(F.col("_a")).alias("n_a"),
        F.theta_sketch_estimate(F.col("_b")).alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("_a"), F.col("_b"))).alias("n_and"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("_a"), F.col("_b"))).alias("n_only_a"))
