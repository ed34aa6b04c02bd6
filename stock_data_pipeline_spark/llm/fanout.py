"""Shared fan-out guard sizing for the ANN stack (r07/r08).

Every row-multiplying broadcast join in the ANN operators sits behind
an explicit-count composite-key repartition (REPARTITION_BY_NUM — the
one shuffle origin AQE never coalesces; see tests/test_fanout_guard.py
and SCALE.md for the measured failure). This module owns the COUNT.

r07 used ``defaultParallelism`` exactly; the r07 ADVICE pointed out two
problems with that: (a) it is captured at plan-build time, so dynamic
allocation or late executor scale-up undercounts the cluster, and
(b) exactly-cores partitioning leaves zero slack for stragglers or
speculative execution on a CPU-bound fan-out stage. The default is now
``multiplier × defaultParallelism`` (multiplier 2), and every ANN
operator threads a ``num_partitions`` override through to here so a
caller who knows the cluster better than plan-time
``defaultParallelism`` does can just say so. Results are pinned
partition-count-invariant (tests/test_fanout_guard.py), so any value
here is safe — only the wall clock changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

FANOUT_SLACK_MULTIPLIER = 2


def fanout_partitions(df: DataFrame, num_partitions: int | None = None) -> int:
    """Partition count for a fan-out guard repartition: the explicit
    ``num_partitions`` if the caller gave one, else
    ``FANOUT_SLACK_MULTIPLIER × defaultParallelism`` captured from the
    DataFrame's session at plan-build time."""
    if num_partitions is not None:
        if num_partitions < 1:
            raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
        return num_partitions
    return (
        FANOUT_SLACK_MULTIPLIER
        * df.sparkSession.sparkContext.defaultParallelism
    )
