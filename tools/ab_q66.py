"""A/B for the _bidir shape inside connected_components (q66):
union (old — evaluates the whole edges pipeline twice inside the eager
checkpoint job) vs explode (new — one evaluation, row-local direction
doubling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import dedup
from stock_data_pipeline_spark.catalog import load_table


def _bidir_union(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )


def q66_variants(spark: SparkSession, sf_dir: str):
    doc = load_table(spark, sf_dir, "documents")
    new_bidir = dedup._bidir

    def run_old():
        dedup._bidir = _bidir_union
        try:
            pairs = dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
            dedup.connected_components(pairs.select("id_a", "id_b")).write.format(
                "noop"
            ).mode("overwrite").save()
        finally:
            dedup._bidir = new_bidir

    def run_new():
        pairs = dedup.ngram_jaccard_pairs_prefix(doc, "doc_id", "text", n=3, threshold=0.8)
        dedup.connected_components(pairs.select("id_a", "id_b")).write.format(
            "noop"
        ).mode("overwrite").save()

    return {"old": run_old, "new": run_new}
