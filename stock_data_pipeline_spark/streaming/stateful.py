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
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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


_CENT = Decimal("0.01")

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("crossed_at_total", DoubleType()),
        StructField("events_until_cross", LongType()),
    ]
)
ALERT_STATE_SCHEMA = StructType(
    [
        StructField("running_cents", LongType()),
        StructField("n", LongType()),
        StructField("alerted", LongType()),  # 0/1 — fired exactly once
    ]
)


def _update_threshold_alert(threshold_cents: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        running, n, alerted = state.get if state.exists else (0, 0, 0)
        out = []
        # applyInPandasWithState may split one key's micro-batch rows
        # across several Arrow chunks (spark.sql.execution.arrow.
        # maxRecordsPerBatch), so the (ts, event_id) sort must happen
        # over the concatenation, not per chunk — per-key-per-batch
        # memory is bounded by the batch size anyway. The money
        # accumulates in exact integer cents (HALF_UP, matching the
        # DECIMAL(18,2) batch twin q135) so the fold is order-robust
        # across replays and bit-identical to the batch path.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            for v in batch.sort_values(["ts", "event_id"])["value"]:
                n += 1
                running += int(
                    Decimal(str(v)).quantize(_CENT, rounding=ROUND_HALF_UP) * 100
                )
                if not alerted and running >= threshold_cents:
                    alerted = 1
                    out.append((key[0], running / 100.0, n))
        state.update((running, n, alerted))
        yield pd.DataFrame(
            out, columns=["user_id", "crossed_at_total", "events_until_cross"]
        )

    return update


def threshold_alerts_per_user(events: DataFrame, threshold_cents: int) -> DataFrame:
    """Exactly-once threshold-crossing alerts: for each user, emit ONE
    row the first time their cumulative ``value`` reaches the threshold
    — the rate-limit / fraud-alert / quota shape.

    State is 3 scalars per user (running cents, event count, fired
    flag): O(keys) memory, each micro-batch touches only its keys.
    The append-mode output is the alert stream. The deterministic
    batch twin (same fold: cumulative integer-cent sum in (ts,
    event_id) order, first row reaching the threshold) is q135's
    oracle-checked query — what the streaming path emits
    incrementally, the batch path must reproduce from the full log.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_threshold_alert(threshold_cents),
        outputStructType=ALERT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("emit_seq", LongType()),
        StructField("key", LongType()),
        StructField("mg_count", LongType()),
    ]
)
MG_STATE_SCHEMA = StructType(
    [
        StructField("emit_seq", LongType()),
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _update_mg(k_budget: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seq, ks, cs = state.get
            counters = dict(zip(ks, cs))
        else:
            seq, counters = 0, {}
        for pdf in pdfs:
            # value_counts is descending-count (deterministic) — merge
            # key by key so the ≤ k_budget−1 live-counter bound holds
            # between insertions (same discipline as q305's batch pass)
            vc = pdf["key"].value_counts()
            for kk, c in vc.items():
                counters[int(kk)] = counters.get(int(kk), 0) + int(c)
                if len(counters) >= k_budget:
                    kth = sorted(counters.values(), reverse=True)[k_budget - 1]
                    counters = {
                        a: b - kth for a, b in counters.items() if b - kth > 0
                    }
        seq += 1
        ks = sorted(counters)
        state.update((seq, ks, [counters[a] for a in ks]))
        yield pd.DataFrame(
            {
                "shard": pd.array([key[0]] * len(ks), dtype="Int64"),
                "emit_seq": pd.array([seq] * len(ks), dtype="Int64"),
                "key": pd.array(ks, dtype="Int64"),
                "mg_count": pd.array([counters[a] for a in ks], dtype="Int64"),
            }
        )

    return update


def streaming_heavy_hitter_candidates(
    events: DataFrame, key_col: str = "user_id", n_shards: int = 8, k_budget: int = 256
) -> DataFrame:
    """Streaming Misra–Gries heavy-hitter candidates — the incremental
    twin of q305's batch phase 1. Rows are sharded by ``key % n_shards``
    (every occurrence of a key lands in ONE shard, so the MG error
    bound applies to the key's full stream mass); each shard keeps an
    MG(k_budget) summary in group state and re-emits its candidate set
    (with a monotone ``emit_seq``) every micro-batch, so the latest
    emission per shard is always the current summary.

    Losslessness across the stream: a key with total count
    > N_total/k_budget has shard-local count > shard_rows/k_budget
    (its shard holds all of its rows and shard_rows ≤ N_total), where
    the MG bound cannot evict it — candidates ⊇ true heavy hitters at
    every point in the stream, exactly like the batch operator. State
    is ≤ n_shards · k_budget counters TOTAL regardless of the key
    universe; a downstream exact recount (q305 phase 2, or a
    foreachBatch join) finishes the job.
    """
    keyed = events.select(
        (F.col(key_col) % n_shards).cast("long").alias("shard"),
        F.col(key_col).cast("long").alias("key"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _update_mg(k_budget),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
