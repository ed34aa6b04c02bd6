"""As-of (point-in-time) join — an operator Spark lacks natively,
composed from existing DataFrame ops (SURVEY.md §2 guidance: composition
first, Pandas UDF only if semantics can't be expressed).

For each left row, attach the most recent right-side values at or before
the left row's time, per key. The classic quotes-to-trades join.

Plan shape: union the two sides with a marker, one shuffle on the key,
one in-partition sort, then ``last(value, ignorenulls=True)`` over an
unbounded-preceding frame — right rows deposit values, left rows pick
them up. O(n log n) per key group, no range-explosion, no UDF; at 100 TB
this is one exchange + sort versus the quadratic windowed cross-join a
naive range join would plan. (Alternative when per-group data fits in
memory: ``applyInPandas`` + ``pd.merge_asof``; this version avoids the
Python boundary entirely.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: left row at time t gets the right-side
    ``value_cols`` from the latest right row with time ≤ t (< t when
    ``strict``), matching DuckDB/pandas ``merge_asof`` backward
    semantics. Right-side value columns must not collide with left
    column names.
    """
    l = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    r = (
        right.select(*on, F.col(right_time).alias("__t"), *value_cols)
        .withColumn("__is_left", F.lit(0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # at equal times the right row sorts first (0 < 1) so a tie is
    # visible to the left row — inclusive ≤; strict mode orders left
    # first so ties are invisible
    tie = F.col("__is_left").desc() if strict else F.col("__is_left").asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Each value is carried inside a struct that is non-NULL exactly for
    # right rows, so ``last(ignorenulls=True)`` tracks the latest *row*,
    # not the latest non-NULL *value*: a right row whose value is
    # genuinely NULL propagates that NULL forward (merge_asof/DuckDB
    # ASOF parity) instead of falling back to an older non-NULL value.
    def _carried(c: str):
        wrapped = F.when(F.col("__is_left") == 0, F.struct(F.col(c).alias("v")))
        return F.last(wrapped, ignorenulls=True).over(w)["v"].alias(c)

    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[_carried(c) for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__t")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """Nearest as-of join: left row at time t gets the right row
    minimizing |t_right − t| per key; equal distances resolve BACKWARD
    (the earlier right row), matching pandas ``merge_asof(direction=
    'nearest')``. Assumes right timestamps are unique per key (ours
    are) — otherwise the winner among identical-time rows is undefined.

    Same union-once shape as :func:`asof_join`, but both directions:
    one exchange on the key, two in-partition window sorts (backward
    carry via ``last``, forward via ``first``), then an exact integer
    microsecond distance comparison picks a side. Still no UDF, no
    range explosion — at 100 TB the cost is one shuffle + two sorts of
    the unioned sides.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    l = (
        left.withColumn("__tus", us(left_time)).withColumn("__is_left", F.lit(1))
    )
    r = (
        right.select(*on, us(right_time).alias("__tus"), *value_cols)
        .withColumn("__is_left", F.lit(0))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__tus").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__tus").asc(), F.col("__is_left").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _pick(c: str):
        wrapped = F.when(
            F.col("__is_left") == 0, F.struct(F.col("__tus").alias("t"), F.col(c).alias("v"))
        )
        back = F.last(wrapped, ignorenulls=True).over(wb)
        fwd = F.first(wrapped, ignorenulls=True).over(wf)
        return (
            F.when(back.isNull(), fwd["v"])
            .when(fwd.isNull(), back["v"])
            .when(F.col("__tus") - back["t"] <= fwd["t"] - F.col("__tus"), back["v"])
            .otherwise(fwd["v"])
            .alias(c)
        )

    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[_pick(c) for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__tus")
