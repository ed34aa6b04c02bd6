"""Sorts / limits / top-N — SURVEY.md §2 F7, S1–S3.

Reference patterns: sort-desc-take-first as a MAX substitute
(functions.py:69-73), tail-N day slices for the percent-change charts
(sectors.py:176-177).

Scale notes: per-group top-N via ``row_number`` over a partitioned
window shuffles once on the group key and never materializes a global
sort; global top-N uses ``orderBy().limit(n)`` which Spark executes as
``TakeOrderedAndProject`` (per-partition heaps, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_name: str | None = None,
) -> DataFrame:
    """Top-``n`` rows per group under ``order_cols`` (pass explicit
    tiebreakers — e.g. a key column — to keep results deterministic)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= n)
    if rank_name:
        return out.withColumnRenamed("__rn", rank_name)
    return out.drop("__rn")


def tail_n(df: DataFrame, order_col: str, n: int, partition_by: list[str] | None = None) -> DataFrame:
    """F7 — the last ``n`` rows by ``order_col`` (reference: last
    5/10/20/50 market days, sectors.py:176-177), returned in ascending
    order semantics (caller sorts for presentation)."""
    parts = partition_by or []
    w = Window.partitionBy(*parts).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def latest_row(df: DataFrame, order_col: str) -> DataFrame:
    """S2 — sort desc + take first ≡ argmax row (functions.py:69-73)."""
    return df.orderBy(F.col(order_col).desc()).limit(1)
