"""Custom stateful streaming operators via ``applyInPandasWithState``.

The brief's strategy (b) for operators Spark lacks: arbitrary per-key
state machines over a stream. The example operator here — a per-key
running aggregate (count / sum / max, emitted on every update) — is the
canonical shape: swap ``_update`` for any sessionizer, decaying counter,
or CDC reconciler and the plumbing stays identical.

Batch-vs-stream contract: the final state per key must equal the batch
``groupBy(key).agg(...)`` over the same data (pinned in
tests/test_streaming.py)."""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id long, n_events long, sum_value double, "
                 "max_value double")
STATE_SCHEMA = "n long, s double, m double"


def _update(key, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (n, s, m) = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [s], "max_value": [m]})


def running_user_stats(events: DataFrame,
                       key_col: str = "user_id") -> DataFrame:
    """Streaming per-key running stats; on a batch DataFrame falls back to
    the equivalent groupBy aggregation (same output schema) so the
    operator is usable in both modes."""
    if not events.isStreaming:
        from pyspark.sql import functions as F
        return (events.groupBy(F.col(key_col).cast("long").alias("user_id"))
                .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                     F.sum("value").cast("double").alias("sum_value"),
                     F.max("value").cast("double").alias("max_value")))
    return (events.groupBy(key_col)
            .applyInPandasWithState(_update, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "update",
                                    GroupStateTimeout.NoTimeout))
