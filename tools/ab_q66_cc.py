"""Interleaved A/B for the connected-components loop shape (r10 VERDICT
item 6). The shipped loop (dedup.connected_components) now runs ONE job
per round: no initial-labels checkpoint (round 1 re-derives the
distinct in-plan over the checkpointed bidir) and the convergence test
rides the checkpoint action itself via observe() (labels are pointwise
monotone non-increasing, so an exact decimal label-sum stalls exactly
at convergence). This tool keeps the PRE-r10 loop — eager labels
checkpoint + a per-round join-based changed-count job — as the
comparison variant.

Usage: python tools/ab_measure.py tools.ab_q66_cc:build [rounds]
Measured (r10, interleaved under loadavg 13-18): shipped won wall in
4/4 rounds — min 3.59 vs 4.36 s, med 4.32 vs 4.90 s on q66 at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import dedup
from stock_data_pipeline_spark.queries import REGISTRY


def cc_join_check(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """The pre-r10 loop: eager labels checkpoint, join-based
    changed-count action per round (2 jobs/round + 2 upfront)."""
    spark = edges.sparkSession
    sc = spark.sparkContext
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)
    elif sc._jsc.sc().getCheckpointDir().isEmpty():
        import tempfile

        sc.setCheckpointDir(tempfile.mkdtemp(prefix="spark-cc-ckpt-"))
    bidir = dedup._bidir(edges, src, dst).repartition("u").checkpoint(eager=True)
    labels = (
        bidir.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("lbl", F.col("vertex"))
    ).checkpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        new_labels = dedup._cc_round(bidir, labels).checkpoint(eager=True)
        changed = (
            new_labels.withColumnRenamed("lbl", "new_lbl")
            .join(labels, "vertex")
            .filter(F.col("new_lbl") != F.col("lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError("cc_join_check did not converge")
    return labels.select(F.col("vertex"), F.col("lbl").alias("cluster_id"))


def build(spark, sf_dir):
    fn = REGISTRY["q66_dup_clusters"].fn

    def run_shipped():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    orig = dedup.connected_components

    def run_join_check():
        dedup.connected_components = cc_join_check
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        finally:
            dedup.connected_components = orig

    return {"observe_sum": run_shipped, "join_check": run_join_check}
