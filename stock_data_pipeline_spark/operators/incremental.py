"""Incremental-load semantics — SURVEY.md §2 F1/G1/D4.

The reference's append-idempotence pattern: probe ``MAX(date)`` already
in the sink, keep only newer rows, append, enforce the ``date`` primary
key (functions.py:23-39, ticker.py:26-31, postgresql_connection.py:38-40).

Scale notes: ``latest_value`` is a single-column max — Catalyst turns it
into a partial-agg + 1-row exchange, and with date-partitioned tables
the scan prunes to the newest partitions. ``append_incremental`` is a
broadcast of one scalar, never a shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_value(df: DataFrame, col: str):
    """G1 — ``SELECT MAX(col)`` as a driver-side scalar (None on empty).

    Reference: ticker.py:26-31 (SQL MAX probe) and functions.py:69-73
    (the sort-desc-take-first pandas variant — same result, worse plan).
    """
    return df.agg(F.max(col).alias("latest")).first()["latest"]


def filter_after(df: DataFrame, col: str, cutoff) -> Column | DataFrame:
    """F1 — keep rows strictly newer than ``cutoff``; no-op if None.

    Reference: check_table_append_compatibility, functions.py:23-39.
    """
    if cutoff is None:
        return df
    return df.filter(F.col(col) > F.lit(cutoff))


def append_incremental(existing: DataFrame, incoming: DataFrame, col: str) -> DataFrame:
    """F1+B1 — the reference's staleness-guarded append as one lazy plan:
    rows of ``incoming`` at-or-before the sink's max(``col``) are
    dropped, the rest unioned on.

    Uses a left-anti-ish scalar subquery instead of collecting the max
    to the driver, so the whole thing stays one DAG (the driver-scalar
    variant is :func:`latest_value` + :func:`filter_after`).
    """
    cutoff = existing.agg(F.max(col).alias("__cutoff"))
    newer = (
        incoming.crossJoin(F.broadcast(cutoff))
        .filter((F.col("__cutoff").isNull()) | (F.col(col) > F.col("__cutoff")))
        .drop("__cutoff")
    )
    return existing.unionByName(newer)


def enforce_primary_key(df: DataFrame, keys: list[str], order_by: list[str] | None = None) -> DataFrame:
    """D4 — Spark has no enforced PRIMARY KEY; reproduce the invariant as
    a deterministic dedupe: keep one row per key. With ``order_by`` the
    kept row is the first under that ordering (descending), making the
    result reproducible (plain ``dropDuplicates`` keeps an arbitrary row).

    Reference: ALTER TABLE ... ADD PRIMARY KEY (date) at
    postgresql_connection.py:38-40 / functions.py:152-155.
    """
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance: merge a persisted
    partial-aggregate ``state`` with a ``delta`` partial computed over
    only the new data — the at-scale alternative to re-aggregating all
    of history on every refresh.

    Works for aggregates that are commutative monoids per column:
    ``sum_cols`` re-SUM (COUNT is SUM of partial counts), ``max_cols``
    re-MAX, ``min_cols`` re-MIN. Derived aggregates (AVG, stddev,
    ratios) must be stored as their mergeable parts (sum+count,
    moment sums — see q57/q94) and computed at read time.

    One union + one hash aggregate over the key domain (map-side
    combine makes the shuffle carry one row per key per side). Keys
    present in only one side pass through — unionByName is the
    null-safe outer merge.
    """
    agg = [F.sum(c).alias(c) for c in sum_cols]
    agg += [F.max(c).alias(c) for c in (max_cols or [])]
    agg += [F.min(c).alias(c) for c in (min_cols or [])]
    return state.unionByName(delta).groupBy(*keys).agg(*agg)
