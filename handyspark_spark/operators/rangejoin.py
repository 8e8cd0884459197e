"""Bucketized range join (point-in-interval) — an operator Spark lacks
a scalable native plan for.

A naive ``left.join(right, point.between(lo, hi))`` has no equality key,
so Spark falls back to BroadcastNestedLoopJoin (O(|L|·|R|), and only if
one side fits in memory). The standard scalable rewrite (strategy (a)
from the build brief — composition of existing ops; the standard
chunking technique interval-join implementations use):

1. pick a bucket width W on the range axis;
2. points map to ONE bucket id ``floor(p / W)``;
3. intervals EXPLODE to every bucket they overlap,
   ``sequence(floor(lo/W), floor(hi/W))`` — fan-out is
   ``len/W + 1`` rows per interval, tunable via W;
4. equi-join on the bucket id (hash shuffle, AQE-eligible), then filter
   the exact ``lo <= p <= hi`` predicate.

Every (point, interval) pair sharing a bucket is checked exactly once
per shared bucket; the final ``dropDuplicates`` on the pair key is
unnecessary because a point lives in exactly ONE bucket — each
qualifying pair meets in exactly that bucket, so the join emits no
duplicates by construction.

Choosing W: ~ the median interval length. Too small → interval fan-out
explodes; too large → buckets degenerate into cross products. At 100 TB
both failure modes are visible as shuffle-size / task-skew, both
tunable without changing the plan.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _axis(col: Column, is_ts: bool) -> Column:
    """Range axis as double: timestamps -> epoch seconds."""
    return col.cast("double") if not is_ts \
        else col.cast("timestamp").cast("double")


def range_join(left: DataFrame, right: DataFrame, point: str,
               lo: str, hi: str, bucket: float,
               extra_on: list[str] | None = None,
               how: str = "inner") -> DataFrame:
    """Join each left row (at ``left.point``) to every right row whose
    ``[right.lo, right.hi]`` interval contains it (inclusive), optionally
    also matching ``extra_on`` equality keys. ``bucket`` is the chunk
    width in axis units (seconds for timestamp axes).

    Returns left columns + right columns (right's duplicated names
    suffixed ``_r``). ``how='left'`` keeps pointless left rows with NULL
    right side (via a final left join back on the left row identity).
    """
    extra_on = extra_on or []
    is_ts = dict(left.dtypes)[point].startswith("timestamp")
    p = _axis(F.col(point), is_ts)
    l_ax = left.withColumn("_rjb", F.floor(p / F.lit(float(bucket))))

    lo_n = _axis(F.col(lo), is_ts)
    hi_n = _axis(F.col(hi), is_ts)
    buckets = F.sequence(F.floor(lo_n / F.lit(float(bucket))),
                         F.floor(hi_n / F.lit(float(bucket))))
    rename = {c: f"{c}_r" for c in right.columns
              if c in left.columns and c not in extra_on}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    r_lo, r_hi = rename.get(lo, lo), rename.get(hi, hi)
    r_ax = r.withColumn("_rjb", F.explode(buckets))

    cond = [l_ax["_rjb"] == r_ax["_rjb"]] + \
        [l_ax[c] == r_ax[c] for c in extra_on]
    joined = (l_ax.join(r_ax, cond, "inner")
              .filter((_axis(F.col(point), is_ts)
                       >= _axis(F.col(r_lo), is_ts)) &
                      (_axis(F.col(point), is_ts)
                       <= _axis(F.col(r_hi), is_ts)))
              .drop("_rjb"))
    # drop the right-side copies of extra_on (equal by construction)
    for c in extra_on:
        joined = joined.drop(r_ax[c])
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        return matched.unionByName(
            left.join(matched.select(*left.columns).distinct(),
                      left.columns, "left_anti"),
            allowMissingColumns=True)
    raise ValueError(f"how={how!r} not supported (inner|left)")
