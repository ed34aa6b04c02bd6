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


def asof_join_interpolated(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_col: str,
    right_id: str,
) -> DataFrame:
    """Time-interpolated as-of join: each left row at integral time t
    gets the right values bracketing it — prev = the right row
    maximizing (t_r, id) with t_r ≤ t, next = the row minimizing
    (t_r, id) with t_r ≥ t — plus the linear interpolation
    v0 + (v1 − v0)·(t − t0)/(t1 − t0), clamped to the surviving side at
    the series edges and to v0 when the bracket is degenerate (t1 = t0).

    Same single-exchange union-and-carry shape as :func:`asof_join`,
    run in BOTH directions over one partitioned sort each: no range
    join, no per-row subquery — at 100 TB this is two window passes on
    the (key, time) exchange the plain as-of already pays. Times must
    be integral (epoch micros) so the interpolation fraction divides
    exact integers; the (time, id) tie-break makes the bracket choice
    deterministic in any engine.

    Returns the left rows plus ``t0/v0/t1/v1/v_interp``.
    """
    lf = (
        left.withColumn("__t", F.col(left_time))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__rid", F.lit(None).cast("long"))
        .withColumn("__v", F.lit(None).cast("double"))
    )
    rf = (
        right.select(
            *on,
            F.col(right_time).alias("__t"),
            F.col(right_id).cast("long").alias("__rid"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    u = lf.unionByName(rf, allowMissingColumns=True)
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").desc(), F.col("__is_left").asc(), F.col("__rid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    mark = F.when(
        F.col("__is_left") == 0, F.struct(F.col("__t").alias("t"), F.col("__v").alias("v"))
    )
    carried = u.select(
        *[c for c in u.columns if c not in ("__rid", "__v")],
        F.last(mark, ignorenulls=True).over(wf).alias("__prev"),
        F.last(mark, ignorenulls=True).over(wb).alias("__next"),
    )
    out = carried.filter(F.col("__is_left") == 1)
    t0, v0 = F.col("__prev")["t"], F.col("__prev")["v"]
    t1, v1 = F.col("__next")["t"], F.col("__next")["v"]
    frac = (F.col("__t") - t0).cast("double") / (t1 - t0).cast("double")
    interp = (
        F.when(F.col("__prev").isNull(), v1)
        .when(F.col("__next").isNull(), v0)
        .when(t1 > t0, v0 + (v1 - v0) * frac)
        .otherwise(v0)
    )
    return out.select(
        *[c for c in left.columns],
        t0.alias("t0"),
        v0.alias("v0"),
        t1.alias("t1"),
        v1.alias("v1"),
        interp.alias("v_interp"),
    ).drop("__t", "__is_left")
