"""A/B for the q25 closure decision (r10 VERDICT item 7): the prefix
AllPairs pipeline with the shipped canonical order ("df": rarest-first
prefixes, costs a dfreq aggregation) vs the "hash" order (xxhash64 -
per-row, no global aggregation, but prefixes are random so the
candidate join is larger and the narrow plan re-runs per consumer).
Both orders provably emit the SAME pair set (prefix filtering is
lossless for any global total order).

Usage: python tools/ab_measure.py tools.ab_q25_order:build [rounds]
"""

from __future__ import annotations

from stock_data_pipeline_spark.catalog import load_table
from stock_data_pipeline_spark.llm import dedup


def build(spark, sf_dir):
    def make(order):
        def run():
            doc = load_table(spark, sf_dir, "documents")
            (
                dedup.ngram_jaccard_pairs_prefix(
                    doc, "doc_id", "text", n=3, threshold=0.8, order=order
                )
                .write.format("noop").mode("overwrite").save()
            )
        return run

    return {"df_order": make("df"), "hash_order": make("hash")}
