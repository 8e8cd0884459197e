"""Time-series regularization: resample to a fixed grid, gap-fill,
SCD2 history tables.

Beyond-reference surface. Event logs are irregular; models and BI want
regular grids and validity intervals. Both operators here are
single-exchange plans keyed on the entity:

- ``resample``: per-entity fixed-interval grid (generated with
  ``F.sequence`` — no driver loop, no cross join against a calendar
  table), events aggregated into their bucket, empty buckets NULL or
  forward-filled. The grid generation fans out map-side from one row per
  entity, so the shuffle carries |entities| rows plus the events — never
  |entities| x |grid| through an exchange.
- ``scd2_history``: slowly-changing-dimension type-2 intervals from an
  attribute log — keep rows where the tracked attributes CHANGED
  (LAG compare), then close each interval with LEAD. The standard
  warehouse history build, two window functions over one sorted
  exchange.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["resample", "scd2_history"]


def resample(df: DataFrame, ts_col: str, key_col: str,
             interval_seconds: int, value_col: str,
             agg: str = "sum", fill: str | None = None) -> DataFrame:
    """Aggregate ``value_col`` onto a regular per-entity time grid.

    Grid: every ``interval_seconds`` bucket from the entity's first to
    last event (inclusive), as ``bucket_ts`` timestamps. ``agg``:
    sum/count/avg/min/max. Buckets with no events carry NULL, or the
    previous bucket's value when ``fill='ffill'`` (one extra window over
    the same keyed exchange, ``last_value IGNORE NULLS``).

    Plan (run-length): bucket each event (map-only), aggregate per
    (entity, bucket) — ONE corpus shuffle; then every OCCUPIED bucket
    owns the grid run ``[b, next_occupied_b - 1]`` (``lead`` over one
    small keyed window on the occupied-cell table), and the run is
    exploded map-side with its value — ffill is free (the run carries
    the last non-null value) and the dense grid NEVER crosses an
    exchange. The naive shape (explode per-entity spans, left-join the
    buckets, window the grid for ffill) shuffles the full |entities| ×
    |buckets| grid twice — at 100 TB the grid dwarfs the corpus, so
    shuffling only |occupied cells| rows is the scale win; the fan-out
    happens after the last exchange."""
    iv = int(interval_seconds)
    ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bucket = (ep / F.lit(iv * 1_000_000)).cast("long")
    aggfn = {"sum": F.sum, "count": F.count, "avg": F.avg,
             "min": F.min, "max": F.max}[agg]
    per_bucket = (df
                  .select(F.col(key_col).alias("_k"),
                          bucket.alias("_b"),
                          F.col(value_col).alias("_v"))
                  .filter(F.col("_b").isNotNull())  # null ts never grids
                  .groupBy("_k", "_b")
                  .agg(F.round(aggfn("_v"), 6).alias("_val")))
    w = Window.partitionBy("_k").orderBy("_b")
    if fill == "ffill":
        # an occupied bucket can aggregate to NULL (all-null values);
        # ffill skips it, same as last_value IGNORE NULLS over the grid
        carry = F.last("_val", ignorenulls=True).over(
            Window.partitionBy("_k").orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0))
    else:
        carry = F.col("_val")
    runs = per_bucket.select(
        "_k", "_b", carry.alias("_cv"), F.col("_val").alias("_ov"),
        F.coalesce(F.lead("_b").over(w) - 1, F.col("_b")).alias("_end"))
    gb = F.explode(F.sequence("_b", "_end")).alias("_gb")
    out = runs.select("_k", "_b", "_cv", "_ov", gb)
    val = (F.col("_cv") if fill == "ffill"
           else F.when(F.col("_gb") == F.col("_b"), F.col("_ov")))
    return out.select(
        F.col("_k").alias(key_col),
        F.timestamp_micros(F.col("_gb") * iv * 1_000_000)
        .alias("bucket_ts"),
        val.alias(f"{agg}_{value_col}"))


def scd2_history(df: DataFrame, key_col: str, ts_col: str,
                 attr_cols: list[str],
                 tiebreak_col: str | None = None) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an attribute log:
    one row per (entity, attribute-state run) with
    ``valid_from`` / ``valid_to`` (NULL = current) timestamps.

    Change detection is null-safe (``eqNullSafe``); consecutive events
    with identical tracked attributes collapse into one interval. Two
    windows (LAG compare + LEAD close) over one sorted exchange."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.lag(a).over(w))
    changed = (df.withColumn("_same", same)
               .filter(~F.coalesce("_same", F.lit(False)))
               .drop("_same"))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (changed
            .select(key_col, *attr_cols,
                    F.col(ts_col).alias("valid_from"),
                    F.lead(ts_col).over(w2).alias("valid_to")))


def rolling_zscore(df: DataFrame, ts_col: str, key_col: str,
                   value_col: str, lookback: int = 20,
                   min_points: int = 5, threshold: float = 3.0,
                   tiebreak_col: str | None = None) -> DataFrame:
    """Per-entity rolling-window anomaly score: z = (x - mean) / std over
    the PREVIOUS ``lookback`` points (the current row is excluded, so a
    spike cannot mask itself), NULL until ``min_points`` of history
    exist. One keyed sort exchange shared by both window aggregates;
    per-entity frames keep everything parallel at any entity count —
    the skew risk is a single hot entity, same as every keyed window
    here. Appends ``zscore`` and ``is_anomaly``."""
    from pyspark.sql import Window
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        # same-ts events otherwise enter the frame in nondeterministic
        # order — part of the determinism contract (see event_transitions)
        order.append(F.col(tiebreak_col).asc())
    w = (Window.partitionBy(key_col).orderBy(*order)
         .rowsBetween(-lookback, -1))
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    npts = F.count(value_col).over(w)
    z = F.when((npts >= min_points) & (std > 0),
               (F.col(value_col) - mean) / std)
    return (df.withColumn("zscore", z)
            .withColumn("is_anomaly",
                        F.when(z.isNotNull(), F.abs(z) > threshold)))
