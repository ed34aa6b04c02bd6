"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference enriches rows batch-side (pandas merges re-run per cron
tick, e.g. the sector weight join in
/root/reference/stock_data_pipeline/sectors.py); these are the
Structured Streaming shapes of the same semantics, written — like the
rest of ``streaming/`` — so one function serves both the batch
DataFrame (oracle-checkable twin) and the readStream DataFrame
(production). ``withWatermark`` is a no-op on a batch frame, so the
stream path and the batch twin share one code path.

Scale notes:
- stream-static is STATELESS: each micro-batch hash-joins against the
  static side, re-resolving file-source snapshots per batch — broadcast
  the dim so no stream-side shuffle ever happens.
- stream-stream buffers both sides in state; the watermarks plus the
  time-range join condition are what let Spark evict state, so they are
  required arguments here, not options. State per key ≈ rows within
  the interval bound — O(rate × window), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (inner/left_outer — the
    only stream-static forms Spark supports with the stream on the
    left). The dim is broadcast: the streaming side keeps its
    partitioning, zero shuffle per micro-batch."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"stream-static join supports inner/left, got {how!r}")
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_ts: str,
    r_ts: str,
    within: str = "1 hour",
    l_watermark: str = "10 minutes",
    r_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right rows to left rows with the same ``key`` where
    ``l_ts < r_ts <= l_ts + within`` (the funnel/attribution shape:
    right events caused within ``within`` of a left event).

    Both sides MUST carry watermarks and the join MUST have the time
    bound — that pair is what bounds the join state buffer; omitting
    either on a real stream grows state forever. Column names other
    than ``key`` must be disjoint (rename before calling), and the two
    timestamp columns must be named differently.
    """
    if l_ts == r_ts:
        raise ValueError("rename timestamp columns to be distinct before joining")
    lw = left.withWatermark(l_ts, l_watermark)
    rw = right.withWatermark(r_ts, r_watermark)
    cond = (
        (lw[key] == rw[key])
        & (F.col(r_ts) > F.col(l_ts))
        & (F.col(r_ts) <= F.col(l_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
