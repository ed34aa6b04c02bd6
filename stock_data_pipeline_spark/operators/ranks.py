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
bucket, and bucket order equals sort order), with ``order_by`` given
as plain ascending columns (no ``desc()`` specs — the stitch compares
bucket aggregates by the same ascending order). Under that contract
the helpers are bit-identical to the single-task global window —
including NULLs (r06 ADVICE): a NULL lagged value stays NULL (the
stitch keys on each bucket's FIRST ROW, not on value nullness), a
running sum over an all-NULL prefix stays NULL exactly where the
global window's would, and a NULL bucket key (from a NULL leading
sort key) is kept via null-safe joins and sorts first, matching
Spark's ASC NULLS FIRST window order (DuckDB oracles over nullable
sort keys must spell ``NULLS FIRST`` — its ASC default is NULLS
LAST). So DuckDB oracles written against ``ROW_NUMBER() OVER (ORDER
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
_BR = "__rank_bucket_r"


def _stitch(local: DataFrame, offs: DataFrame) -> DataFrame:
    """Broadcast-join the tiny per-bucket table back onto the local
    results. NULL-SAFE on the bucket key: a NULL bucket (NULL leading
    sort key) is a real bucket — Spark windows order ASC NULLS FIRST,
    so it holds the globally-first rows — and a plain equi-join would
    silently drop it (r06 ADVICE)."""
    return local.join(
        F.broadcast(offs.withColumnRenamed(_B, _BR)),
        F.col(_B).eqNullSafe(F.col(_BR)),
    ).drop(_BR)


def _offsets(
    df: DataFrame, bucket: Column, agg: Column, off_name: str, zero: bool = True
) -> DataFrame:
    """Per-bucket aggregate ``agg`` -> exclusive prefix ``off_name``
    over buckets in ascending (NULLS FIRST) bucket order. One row per
    non-empty bucket; the unpartitioned window runs over this
    aggregated table only. ``zero=False`` keeps the first bucket's
    (and any all-NULL prefix's) offset as SQL NULL instead of 0 — the
    shape running-sum needs for NULL-faithful stitching."""
    per_bucket = df.withColumn(_B, bucket).groupBy(_B).agg(agg.alias("__bagg"))
    w = Window.orderBy(_B).rowsBetween(Window.unboundedPreceding, -1)
    off = F.sum("__bagg").over(w)
    if zero:
        off = F.coalesce(off, F.lit(0))
    return per_bucket.select(_B, off.alias(off_name))


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
        _stitch(local, offs)
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
    prior buckets' total. NULL-faithful (r06 ADVICE): SQL running SUM
    is NULL exactly until the first non-NULL value, so the local and
    offset sides combine additively only where both are non-NULL —
    never coalescing a legitimate leading-NULL run to 0."""
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
    offs = _offsets(df.withColumn("__v", value), bucket, F.sum("__v"), "__off", zero=False)
    # SUM-over-prefix algebra: NULL ⊕ x = x, x ⊕ NULL = x, NULL ⊕ NULL
    # = NULL — i.e. add where both sides saw a value, else pass the one
    # that did (matches the global window, which ignores NULLs and is
    # NULL only while NO non-NULL value has been seen yet).
    combined = (
        F.when(F.col("__lcum").isNull(), F.col("__off"))
        .when(F.col("__off").isNull(), F.col("__lcum"))
        .otherwise(F.col("__lcum") + F.col("__off"))
    )
    return (
        _stitch(local, offs)
        .withColumn(out, combined)
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
    bucket lag, with each bucket's FIRST ROW stitched to the previous
    non-empty bucket's last value via the tiny bucket table.

    The stitch is STRUCTURAL (r06 ADVICE): it keys on per-bucket
    ``row_number() == 1``, not on the lagged value being NULL — so a
    mid-bucket row whose predecessor legitimately holds NULL keeps
    NULL, exactly like the global window. ``max_by`` is null-value-
    faithful in Spark (returns the value at the max ordering even when
    that value is NULL), so an all-NULL-tail bucket also hands NULL
    to the next bucket's first row, matching LAG's offset-1 (not
    last-non-NULL) semantics."""
    w_local = Window.partitionBy(_B).orderBy(*order_by)
    local = (
        df.withColumn(_B, bucket)
        .withColumn("__v", value)
        .withColumn("__lprev", F.lag("__v").over(w_local))
        .withColumn("__brn", F.row_number().over(w_local))
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
    stitched = F.when(F.col("__brn") == 1, F.col("__prior_last")).otherwise(
        F.col("__lprev")
    )
    return (
        _stitch(local, prior)
        .withColumn(out, stitched)
        .drop(_B, "__v", "__lprev", "__brn", "__prior_last")
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
