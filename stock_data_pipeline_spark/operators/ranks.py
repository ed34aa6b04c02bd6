"""Distributed global order statistics: two-phase bucketed prefixes.

An unpartitioned ``Window.orderBy(...)`` is Spark's one single-task
operator — every row moves to ONE partition, so a global row_number /
running sum / lag over a data-sized table caps out at one core no
matter how many executors exist. The scalable form (the q259
watermark-planner pattern, generalized here) splits every global
prefix computation into:

  1. a LOCAL pass, partitioned by an order-preserving bucket of the
     sort key — full cluster parallelism, each bucket independent;
  2. a TINY pass over the per-bucket aggregates (one row per non-empty
     bucket) that turns bucket totals into bucket offsets with an
     unpartitioned window — bounded by the bucket count, not the data;
  3. a broadcast join stitching offsets back onto the local results.

The bucket expression must be a non-decreasing function of the
leading sort key (rows that tie on the full sort key always share a
bucket, and bucket order equals sort order). It only shapes the
physical plan — results are bit-identical to the single-task global
window, so DuckDB oracles written against ``ROW_NUMBER() OVER (ORDER
BY ...)`` keep matching unchanged. Bucket-grain choice trades skew
for offset-table size; callers pick a grain that yields O(100-10k)
buckets at their data scale.

tests/test_plan_shapes.py asserts registry-wide that no unpartitioned
Window node reads a parquet scan without an aggregation/limit in
between — these helpers are how data-sized order statistics satisfy
that rule (reference parity: the pandas engine sorts whole frames in
memory, e.g. ``stock_data_pipeline/ticker.py`` sort_values; here the
same semantics must shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_B = "__rank_bucket"


def _offsets(df: DataFrame, bucket: Column, agg: Column, off_name: str) -> DataFrame:
    """Per-bucket aggregate ``agg`` -> exclusive prefix ``off_name``
    over buckets in ascending bucket order. One row per non-empty
    bucket; the unpartitioned window runs over this aggregated table
    only."""
    per_bucket = df.withColumn(_B, bucket).groupBy(_B).agg(agg.alias("__bagg"))
    w = Window.orderBy(_B).rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        _B, F.coalesce(F.sum("__bagg").over(w), F.lit(0)).alias(off_name)
    )


def bucketed_row_number(
    df: DataFrame, bucket: Column, order_by: list[Column], out: str = "rn"
) -> DataFrame:
    """``row_number() OVER (ORDER BY *order_by)`` as LONG ``out``,
    computed with per-bucket parallelism. ``bucket`` must be a
    non-decreasing function of the leading sort key."""
    local = df.withColumn(_B, bucket).withColumn(
        "__lrn", F.row_number().over(Window.partitionBy(_B).orderBy(*order_by))
    )
    offs = _offsets(df, bucket, F.count(F.lit(1)), "__off")
    return (
        local.join(F.broadcast(offs), _B)
        .withColumn(out, (F.col("__lrn") + F.col("__off")).cast("long"))
        .drop(_B, "__lrn", "__off")
    )


def bucketed_running_sum(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    value: Column,
    out: str = "cum",
) -> DataFrame:
    """``SUM(value) OVER (ORDER BY *order_by ROWS UNBOUNDED PRECEDING
    TO CURRENT ROW)`` as ``out``: within-bucket running sum plus the
    prior buckets' total."""
    local = (
        df.withColumn(_B, bucket)
        .withColumn("__v", value)
        .withColumn(
            "__lcum",
            F.sum("__v").over(
                Window.partitionBy(_B)
                .orderBy(*order_by)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    offs = _offsets(df.withColumn("__v", value), bucket, F.sum("__v"), "__off")
    return (
        local.join(F.broadcast(offs), _B)
        .withColumn(out, F.col("__lcum") + F.col("__off"))
        .drop(_B, "__v", "__lcum", "__off")
    )


def bucketed_lag(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    value: Column,
    out: str = "prev",
) -> DataFrame:
    """``LAG(value) OVER (ORDER BY *order_by)`` as ``out``: within-
    bucket lag, with each bucket's first row stitched to the PREVIOUS
    non-empty bucket's last value via the tiny bucket table."""
    local = (
        df.withColumn(_B, bucket)
        .withColumn("__v", value)
        .withColumn(
            "__lprev",
            F.lag("__v").over(Window.partitionBy(_B).orderBy(*order_by)),
        )
    )
    # last value of each bucket = value at the bucket's max sort key
    per_bucket = (
        df.withColumn(_B, bucket)
        .withColumn("__v", value)
        .groupBy(_B)
        .agg(F.max_by("__v", F.struct(*order_by)).alias("__last"))
    )
    prior = per_bucket.select(
        _B, F.lag("__last").over(Window.orderBy(_B)).alias("__prior_last")
    )
    return (
        local.join(F.broadcast(prior), _B)
        .withColumn(out, F.coalesce(F.col("__lprev"), F.col("__prior_last")))
        .drop(_B, "__v", "__lprev", "__prior_last")
    )


def ntile_from_rn(rn: Column, n_rows: Column, tiles: int) -> Column:
    """SQL ``NTILE(tiles)`` bin (1-based) from a precomputed global
    row_number ``rn`` over the same total order and the total row
    count: the first ``n_rows % tiles`` bins get ``n_rows div tiles +
    1`` rows, the rest ``n_rows div tiles`` (the shared Spark/DuckDB
    remainder rule). Pure integer arithmetic — pairs with
    bucketed_row_number to express ntile without a single-task global
    sort."""
    q = n_rows.cast("long") - F.pmod(n_rows.cast("long"), F.lit(tiles))
    q = (q / tiles).cast("long")  # n_rows div tiles, exact
    r = F.pmod(n_rows.cast("long"), F.lit(tiles))
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading bins
    in_big = (rn - 1 - F.pmod(rn - 1, q + 1)) / (q + 1)
    in_small = r + ((rn - big - 1 - F.pmod(rn - big - 1, F.greatest(q, F.lit(1))))
                    / F.greatest(q, F.lit(1)))
    return (
        F.when(rn <= big, in_big).otherwise(in_small).cast("long") + 1
    ).cast("int")
