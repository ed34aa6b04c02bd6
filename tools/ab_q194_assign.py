"""[r10 historical record - the shipped assignment is now the cogroup
shape in tools/ab_q194_cogroup.py; struct_min here is the r09 HOF via
that tool] A/B the PQ assignment argmin shape (r10 VERDICT item 5): shipped
_assign_long materializes k=256 struct(d2, cid) per (vec_id, s) row and
array_min's the structs; the candidate computes a doubles-only distance
array and picks the winner with array_position(ds, array_min(ds)) -
cbook is cid-sorted, so the FIRST minimal index IS the lowest-cid
tie-break, and cid = cbook[idx].cid (identical values, no structs
allocated). Variants run the whole q194 so the delta is end-to-end.

Usage: python tools/ab_measure.py tools.ab_q194_assign:build [rounds]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import clustering
from stock_data_pipeline_spark.llm.clustering import _sq_dist_unrolled
from stock_data_pipeline_spark.queries import REGISTRY

from tools.ab_q194_cogroup import assign_hof as _SHIPPED  # r09 HOF shape


def assign_two_pass(pts: DataFrame, cents: DataFrame, dim: int, m: int) -> DataFrame:
    cbooks = cents.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cbook")
    )
    joined = pts.join(F.broadcast(cbooks), "s")
    # Bind the distance array as a REAL projection column before
    # anything references it: HOFs run interpreted with no CSE, so an
    # unbound `ds` used by array_min + array_position + element_at
    # would recompute all k distances three times per row (the r09
    # portable_ngram_hashes binding trap, measured 70x worse there).
    bound = joined.withColumn(
        "__ds",
        F.transform(
            F.col("cbook"), lambda c: _sq_dist_unrolled(F.col("qv"), c["cv"], dim)
        ),
    )
    idx = F.array_position(F.col("__ds"), F.array_min(F.col("__ds"))).cast("int")
    best = F.element_at(F.col("cbook"), idx)
    return bound.select(
        "vec_id",
        "s",
        "qv",
        best["cid"].alias("cid"),
        F.element_at(F.col("__ds"), idx).alias("d2"),
    )


def assign_zipfold(pts: DataFrame, cents: DataFrame, dim: int, m: int) -> DataFrame:
    """Same struct-min argmin, but the distance is an explicit
    zip_with diff + square-fold: (a-b) is computed ONCE per dim (the
    unrolled form's `(a-b)*(a-b)` duplicates the subtraction subtree,
    and interpreted HOF eval walks both copies). Fold order identical:
    0.0 + d1^2 + d2^2 + ... left to right."""
    cbooks = cents.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cbook")
    )
    joined = pts.join(F.broadcast(cbooks), "s")
    best = F.array_min(
        F.transform(
            F.col("cbook"),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"), c["cv"], lambda a, b: a.cast("double") - b
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                ).alias("d2"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return joined.select(
        "vec_id",
        "s",
        "qv",
        best["cid"].alias("cid"),
        best["d2"].alias("d2"),
    )


def build(spark, sf_dir):
    fn = REGISTRY["q194_pq_adc_topk"].fn

    def run_shipped():
        clustering._assign_long = _SHIPPED
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_two_pass():
        clustering._assign_long = assign_two_pass
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            clustering._assign_long = _SHIPPED

    def run_zipfold():
        clustering._assign_long = assign_zipfold
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            clustering._assign_long = _SHIPPED

    return {
        "struct_min": run_shipped,
        "two_pass": run_two_pass,
        "zipfold": run_zipfold,
    }
