"""Range (interval) join — point-in-interval matching at scale.

Spark has no native range-join optimization: a plain
``l.ts BETWEEN r.start AND r.end`` predicate executes as a
BroadcastNestedLoopJoin (every point × every interval). The standard
scale pattern — used by the big lakehouse engines as a "range join
hint" — is bucketization: quantize time into fixed buckets, explode
each interval over the buckets it overlaps, equi-join on the bucket,
then apply the exact BETWEEN as a refine filter. Shuffle becomes
∝ points + Σ interval-spans/bucket, and Catalyst runs it as an
ordinary hash join (broadcast when the exploded interval side is
small).

Each (point, interval) match survives in exactly ONE bucket — the
point's own — so no dedup pass is needed after the refine filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (numeric columns — epoch days/seconds/µs).

    ``bucket`` trades shuffle width against replication: intervals are
    exploded ×(span/bucket + 1); pick it near the typical interval
    span. ``extra_keys`` adds equality conditions (e.g. user_id) that
    co-partition the join. ``how`` must be inner/left_semi — outer
    forms would emit unmatched right rows once per exploded bucket.
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"bucketed_range_join supports inner/left_semi, got {how!r}")
    extra_keys = extra_keys or []
    p = points.withColumn("__bkt", F.floor(F.col(ts_col) / bucket))
    i = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket), F.floor(F.col(end_col) / bucket)
            )
        ),
    )
    if how == "left_semi":
        # right-side columns are gone after a semi join, so the exact
        # BETWEEN must live in the join condition itself; Catalyst still
        # extracts the __bkt/extra-key equalities as hash-join keys and
        # applies BETWEEN as the residual condition
        pa, ia = p.alias("__rj_p"), i.alias("__rj_i")
        cond = F.col("__rj_p.__bkt") == F.col("__rj_i.__bkt")
        for k in extra_keys:
            cond = cond & (F.col(f"__rj_p.{k}") == F.col(f"__rj_i.{k}"))
        cond = cond & F.col(f"__rj_p.{ts_col}").between(
            F.col(f"__rj_i.{start_col}"), F.col(f"__rj_i.{end_col}")
        )
        return pa.join(ia, cond, "left_semi").drop("__bkt")
    joined = p.join(i, extra_keys + ["__bkt"], how)
    return joined.filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    ).drop("__bkt")


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each left interval to every right interval it overlaps
    (``l_start <= r_end AND r_start <= l_end``, closed intervals on a
    numeric axis).

    Both sides explode over the buckets they span and equi-join on the
    bucket; a pair overlapping several buckets would match once per
    shared bucket, so the refine keeps only the bucket that contains
    ``max(l_start, r_start)`` — the overlap's left edge — which every
    true pair shares exactly once. No dedup pass, shuffle stays
    ∝ Σ span/bucket per side.

    Column names must be disjoint across the two sides (rename before
    calling); ``extra_keys`` adds shared equality columns.
    """
    extra_keys = extra_keys or []
    lb = left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(F.floor(F.col(l_start) / bucket), F.floor(F.col(l_end) / bucket))
        ),
    )
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(F.floor(F.col(r_start) / bucket), F.floor(F.col(r_end) / bucket))
        ),
    )
    return (
        lb.join(rb, extra_keys + ["__bkt"], "inner")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (
                F.col("__bkt")
                == F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bucket)
            )
        )
        .drop("__bkt")
    )
