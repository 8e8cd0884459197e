"""Structured-Streaming-ready event-time windowing.

The reference has NO streaming surface (SURVEY.md §2.11); this module is
the forward-looking extension over the driver's ``events`` table. Every
builder here works identically on a batch DataFrame and a streaming
DataFrame (``readStream``) — that symmetry is the point: the batch run IS
the correctness oracle for the streaming plan.

- ``tumbling`` / ``sliding``: ``F.window`` aggregations.
- ``session``: ``F.session_window`` (gap-based).
- ``with_watermark``: late-data bound for streaming mode.
- ``sessionize``: explicit gaps-and-islands sessionization (lag + cumsum
  windows) — same result as ``session`` in batch, and the form an ANSI
  oracle can replicate.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    return df.withWatermark(ts_col, delay)


def tumbling(df: DataFrame, ts_col: str, duration: str,
             group_cols: list[str] | None = None,
             aggs: list[Column] | None = None) -> DataFrame:
    """Non-overlapping event-time windows; epoch-aligned (same alignment
    as DuckDB time_bucket for whole-hour/day durations)."""
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    keys = [F.window(F.col(ts_col), duration)] + [
        F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in out.columns if c not in ("window",) + tuple(
            group_cols or [])])


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str,
            group_cols: list[str] | None = None,
            aggs: list[Column] | None = None) -> DataFrame:
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    keys = [F.window(F.col(ts_col), duration, slide)] + [
        F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in out.columns if c not in ("window",) + tuple(
            group_cols or [])])


def session(df: DataFrame, ts_col: str, gap: str,
            group_cols: list[str] | None = None,
            aggs: list[Column] | None = None) -> DataFrame:
    """Gap-based session windows via native ``F.session_window`` —
    streaming-capable (with watermark) stateful sessionization."""
    aggs = aggs or [F.count(F.lit(1)).alias("cnt")]
    keys = [F.session_window(F.col(ts_col), gap)] + [
        F.col(c) for c in (group_cols or [])]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *(group_cols or []),
        *[c for c in out.columns if c not in ("session_window",) + tuple(
            group_cols or [])])


def sessionize(df: DataFrame, ts_col: str, key_col: str,
               gap_seconds: int) -> DataFrame:
    """Explicit batch sessionization (gaps-and-islands): session id =
    cumulative count of gap-breaks per key. One shuffle on the key."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # fractional-second epoch diff (cast-to-double), not unix_timestamp
    # (which truncates to whole seconds and shifts gap boundaries); the
    # intermediate cast("timestamp") is a no-op for LTZ input but keeps
    # TIMESTAMP_NTZ columns working (NTZ has no direct numeric cast)
    cur = F.col(ts_col).cast("timestamp").cast("double")
    prv = prev.cast("timestamp").cast("double")
    is_new = (prev.isNull() | (cur - prv > gap_seconds)).cast("long")
    return df.withColumn("session_id",
                         F.sum(is_new).over(
                             w.rowsBetween(Window.unboundedPreceding, 0)))


def session_counts(df: DataFrame, ts_col: str, key_col: str,
                   gap_seconds: int) -> DataFrame:
    """Per-key session count — ANSI-oracle-friendly projection of
    ``sessionize``."""
    s = sessionize(df, ts_col, key_col, gap_seconds)
    return (s.groupBy(key_col)
             .agg(F.count_distinct("session_id").alias("n_sessions"),
                  F.count(F.lit(1)).alias("n_events")))


def stream_from_events_dir(spark, path: str, schema) -> DataFrame:
    """``readStream`` entry for a parquet events directory — the streaming
    twin of ``sources.loader.load_table``."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(path))


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str,
                 watermark_delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark`` — rows
    whose event time has passed the watermark are evicted from state, so
    memory is O(keys-per-watermark-window), not O(all keys ever)).
    On a batch DataFrame falls back to plain dropDuplicates."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return (df.withWatermark(ts_col, watermark_delay)
              .dropDuplicatesWithinWatermark(keys))


def stream_join(left: DataFrame, right: DataFrame, keys: list[str],
                left_ts: str, right_ts: str,
                tolerance: str = "1 hour",
                watermark_delay: str = "1 hour",
                how: str = "inner") -> DataFrame:
    """Stream-stream (or batch) equi-join with an event-time band:
    rows match when the keys are equal AND ``right_ts`` lies within
    ``[left_ts - tolerance, left_ts + tolerance]``.

    The band is part of the JOIN CONDITION (not a post-filter): that is
    what lets Spark BOUND stream-stream join state — each side's buffered
    rows are evicted once the other side's watermark passes their band.
    Without a time constraint in the condition, state grows without limit
    and outer variants are rejected outright. Watermarks are attached
    automatically to whichever side streams. The same call on batch
    frames produces the identical join minus state management — the batch
    run is the correctness oracle for the streaming one (pinned in
    tests/test_streaming.py).

    ``how``: 'inner', 'left_outer', 'right_outer', or 'full_outer' (the
    stream-stream set Spark supports). Right-side non-key columns that
    collide with left names come back suffixed ``_r``.
    """
    renames = {c: f"{c}_r" for c in right.columns
               if c in left.columns and c not in keys}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    rts = renames.get(right_ts, right_ts)
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark_delay)
    if r.isStreaming:
        r = r.withWatermark(rts, watermark_delay)
    lo = F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
    hi = F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
    cond = F.col(rts).between(lo, hi)
    for k in keys:
        cond = (left[k] == r[k]) & cond
    out = left.join(r, cond, how)
    # keep ONE copy of each key column (coalesce for the outer sides,
    # where the unmatched side's key is NULL)
    key_cols = [F.coalesce(left[k], r[k]).alias(k) for k in keys]
    rest = ([left[c] for c in left.columns if c not in keys]
            + [r[c] for c in r.columns if c not in keys])
    return out.select(*key_cols, *rest)


def funnel_counts(df: DataFrame, steps: list[str], ts_col: str = "ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  within: str | None = None) -> DataFrame:
    """First-touch conversion funnel: for each step k, the number of
    users who performed ``steps[0..k]`` IN ORDER — step k's timestamp is
    the MIN event time strictly after the user's step-(k-1) timestamp
    (and, when ``within`` is set, no later than step-1's timestamp +
    ``within`` — the classic conversion window).

    Plan: one filtered min-aggregation per step, chained by equi-joins on
    the user key — after the first shuffle every join is co-partitioned
    on ``user_col``, so the funnel costs one wide exchange plus
    |users|-sized joins regardless of event volume; the final counts
    collapse to a single row unpivoted to (step, step_name, n_users)."""
    t_prev = None
    users = None
    for k, step in enumerate(steps, start=1):
        ev = df.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t"))
        if users is None:
            users = ev.groupBy("_u").agg(F.min("_t").alias(f"_t{k}"))
            if within:
                users = users.withColumn(
                    "_deadline",
                    F.col(f"_t{k}") + F.expr(f"INTERVAL {within}"))
        else:
            cond = F.col("_t") > F.col(t_prev)
            if within:
                cond = cond & (F.col("_t") <= F.col("_deadline"))
            nxt = (ev.join(users.select("_u", t_prev,
                                        *(["_deadline"] if within else [])),
                           "_u")
                   .filter(cond)
                   .groupBy("_u").agg(F.min("_t").alias(f"_t{k}")))
            users = users.join(nxt, "_u", "left")
        t_prev = f"_t{k}"
    counts = users.agg(*[
        F.count(F.col(f"_t{k}")).alias(f"_n{k}")
        for k in range(1, len(steps) + 1)])
    stack = F.expr("stack({}, {})".format(
        len(steps),
        ", ".join(f"{k}, '{s}', _n{k}"
                  for k, s in enumerate(steps, start=1))))
    return counts.select(stack.alias("step", "step_name", "n_users"))
