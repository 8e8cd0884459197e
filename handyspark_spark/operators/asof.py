"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-sort-fill composition (strategy (a) from the
build brief: composition of existing DataFrame ops):

1. tag left (probe) and right (reference) rows, union them on the time
   axis;
2. one window pass per ``by``-key ordered by (time, side): ``last(...,
   ignorenulls=True)`` carries the most recent right-side values forward;
3. keep only left rows.

Cost: ONE shuffle on the ``by`` key (the window partition) — the same
shuffle a sort-merge join would pay, but with no range-explosion. This is
the standard scalable as-of pattern (pandas ``merge_asof`` semantics,
direction='backward').
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: str | None = None, right_on: str | None = None,
              right_by: str | None = None,
              direction: str = "backward",
              suffix: str = "_right") -> DataFrame:
    """For each left row, attach the right row with the largest
    ``right_on <= on`` (backward) or smallest ``right_on >= on``
    (forward), matching on the optional ``by`` equality key.

    Right-side value columns come back suffixed; right rows with identical
    (by, time) are reduced to their LAST occurrence in sort order to keep
    the join deterministic.
    """
    right_on = right_on or on
    right_by = right_by or by
    rcols = [c for c in right.columns if c not in (right_on, right_by)]

    lt = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(on))
    rt = right.withColumn("_side", F.lit(0)) \
              .withColumn("_t", F.col(right_on))
    if by:
        rt = rt.withColumnRenamed(right_by, by) if right_by != by else rt

    # align schemas for the union
    for c in rcols:
        lt = lt.withColumn(f"_r_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    rt_sel = [F.col(by).alias(by)] if by else []
    rt_sel += [F.col("_t"), F.col("_side")]
    rt_sel += [F.col(c).alias(f"_r_{c}") for c in rcols]
    for c in left.columns:
        if c != by:
            rt = rt.withColumn(f"_l_{c}", F.lit(None).cast(
                dict(left.dtypes)[c]))
    lt_sel = ([F.col(by)] if by else []) + [F.col("_t"), F.col("_side")] \
        + [F.col(f"_r_{c}") for c in rcols] \
        + [F.col(c).alias(f"_l_{c}") for c in left.columns if c != by]
    rt_full = rt.select(*rt_sel, *[F.col(f"_l_{c}")
                                   for c in left.columns if c != by])
    lt_full = lt.select(*lt_sel)
    u = lt_full.unionByName(rt_full)

    part = [by] if by else []
    if direction == "backward":
        w = (Window.partitionBy(*part).orderBy(F.asc("_t"), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, 0))
    elif direction == "forward":
        w = (Window.partitionBy(*part).orderBy(F.asc("_t"), F.desc("_side"))
             .rowsBetween(0, Window.unboundedFollowing))
    else:
        raise ValueError("direction must be 'backward' or 'forward'")
    fill = F.last if direction == "backward" else F.first
    for c in rcols:
        u = u.withColumn(f"_f_{c}", fill(F.col(f"_r_{c}"),
                                         ignorenulls=True).over(w))

    out = u.filter(F.col("_side") == 1)
    sel = [F.col(f"_l_{c}").alias(c) for c in left.columns if c != by]
    if by:
        sel = [F.col(by)] + sel
    sel += [F.col(f"_f_{c}").alias(f"{c}{suffix}" if c in left.columns
                                   else c) for c in rcols]
    return out.select(*sel)
