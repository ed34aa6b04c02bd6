"""A/B the shipped cogroup-numpy PQ assignment against the r09 JVM HOF
shape (r10 VERDICT item 5). The r09 assignment ran the N*m*k distance
evals inside array transform()/aggregate() higher-order functions,
which are CodegenFallback - interpreted tree-walks at ~300 ns/eval,
measured as ~12 of q194's ~20 CPU-s at sf0.1 (tools/ab_q194_upstream
attribution). The shipped shape (clustering._assign_long) cogroups
(s, salt) slices of the corpus with that subspace's k-row codebook and
scores them in numpy (guide 4.2) - bit-identical values (exceptAll 0/0
on q193/q194/q198/q396 at sf0.001+sf0.01; IEEE binary64 ops, explicit
left fold, first-argmin == struct-min tie-break on a cid-sorted book).

Measured (r10, interleaved, 5 rounds): q194 CPU min 9.6 vs 18.3,
median 12.1 vs 22.3 (-46%); wall min 2.83 vs 2.54 (+0.3 s local
Python-dispatch constant).

Usage: python tools/ab_measure.py tools.ab_q194_cogroup:build [rounds]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import clustering
from stock_data_pipeline_spark.llm.clustering import _sq_dist_unrolled
from stock_data_pipeline_spark.queries import REGISTRY

_SHIPPED = clustering._assign_long


def assign_hof(pts: DataFrame, cents: DataFrame, dim: int, m: int) -> DataFrame:
    """The r09 pure-map shape: broadcast per-subspace codebook rows,
    argmin via array_min(transform(cbook, struct(d2, cid))) — zero
    exchanges, but every distance eval is an interpreted HOF walk."""
    cbooks = cents.groupBy("s").agg(
        F.sort_array(F.collect_list(F.struct("cid", "cv"))).alias("cbook")
    )
    joined = pts.join(F.broadcast(cbooks), "s")
    best = F.array_min(
        F.transform(
            F.col("cbook"),
            lambda c: F.struct(
                _sq_dist_unrolled(F.col("qv"), c["cv"], dim).alias("d2"),
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

    def run_hof():
        clustering._assign_long = assign_hof
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            clustering._assign_long = _SHIPPED

    return {"cogroup": run_shipped, "hof": run_hof}
