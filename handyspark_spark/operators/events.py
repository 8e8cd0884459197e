"""Event-log analytics: trailing-window features, transition matrices,
cohort retention.

Beyond-reference surface (the reference has no event operators; these are
the standard point-in-time feature / product-analytics queries a lake
engine is asked for). All three are single-shuffle plans keyed on the
entity column:

- ``trailing_features``: time-range window frames (``rangeBetween`` over
  epoch-microseconds) — per-entity sort, no self-join. The classic
  "features as of each event" shape for training-data generation: every
  output row only sees strictly-past-or-current data, so there is no
  label leakage by construction.
- ``event_transitions``: LAG/LEAD adjacency counted into a Markov
  transition table. One per-entity window + one vocabulary-sized group.
- ``cohort_retention``: per-entity first-activity month (one grouped
  min), month-indexed activity distinct counts. Two shuffles, both keyed
  and combinable map-side.

At 100 TB all of these scale as "one exchange of the event log on
entity id" — the windows never cross entities, so skew is bounded by the
hottest single entity, and AQE's skew-join/salting applies if one entity
dominates.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["trailing_features", "event_transitions", "cohort_retention"]


def _epoch_us(ts_col) -> Column:
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    # NTZ-safe numeric event time; microsecond resolution so sub-second
    # events order/frame identically to engines comparing raw timestamps
    return F.unix_micros(c.cast("timestamp"))


def trailing_features(df: DataFrame, ts_col: str, key_col: str,
                      value_col: str,
                      windows_seconds: list[int] = (3600, 86400 * 7),
                      prefix: str = "f") -> DataFrame:
    """Point-in-time trailing aggregates per event row: for each window
    length W, the count and value-sum of the entity's events in
    ``(t - W, t]`` (inclusive of the current row — Spark's and SQL's
    RANGE frame convention).

    All window lengths share ONE sorted exchange (same partition + order
    spec, frames differ only in bounds), so adding a window is free of
    extra shuffles. Columns: ``{prefix}_cnt_{W}s``, ``{prefix}_sum_{W}s``.
    """
    ep = _epoch_us(ts_col)
    out = df.withColumn("_ep", ep)
    for w in windows_seconds:
        fr = (Window.partitionBy(key_col).orderBy("_ep")
              .rangeBetween(-int(w) * 1_000_000 + 1, 0))
        out = (out
               .withColumn(f"{prefix}_cnt_{w}s",
                           F.count(F.lit(1)).over(fr))
               .withColumn(f"{prefix}_sum_{w}s",
                           F.round(F.sum(value_col).over(fr), 6)))
    return out.drop("_ep")


def event_transitions(df: DataFrame, ts_col: str, key_col: str,
                      type_col: str,
                      tiebreak_col: str | None = None) -> DataFrame:
    """Markov transition counts between consecutive event types per
    entity: (from_type, to_type, n). Event order is (ts, tiebreak) so
    same-timestamp events have a deterministic adjacency — REQUIRED for
    any cross-engine comparison.

    One per-entity window (LEAD) + one |types|²-sized grouped count."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(type_col).over(w)
    return (df.select(F.col(type_col).alias("from_type"),
                      nxt.alias("to_type"))
            .filter(F.col("to_type").isNotNull())
            .groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n")))


def cohort_retention(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    """Cohort retention table: entities bucketed by first-activity month,
    counted distinct per months-since-cohort index.

    Returns (cohort_month: timestamp at month start, month_index: int,
    n_active: bigint). Month arithmetic is integer (year*12 + month),
    portable across engines (no months_between float conventions); the
    month is surfaced as a timestamp because pandas/Arrow lower DATE
    columns to python objects, which cross-engine comparers then treat
    as strings."""
    ts = F.col(ts_col).cast("timestamp")
    mnum = (F.year(ts) * 12 + F.month(ts)).alias("_m")
    acts = df.select(F.col(key_col).alias("_k"), mnum)
    first = acts.groupBy("_k").agg(F.min("_m").alias("_m0"))
    joined = acts.join(first, "_k")
    cohort = F.make_date(
        F.floor((F.col("_m0") - 1) / 12).cast("int"),
        ((F.col("_m0") - 1) % 12) + 1, F.lit(1)).cast("timestamp")
    return (joined
            .select(cohort.alias("cohort_month"),
                    (F.col("_m") - F.col("_m0")).cast("int")
                    .alias("month_index"), "_k")
            .groupBy("cohort_month", "month_index")
            .agg(F.count_distinct("_k").alias("n_active")))
