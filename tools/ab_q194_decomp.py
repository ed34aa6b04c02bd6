"""Decompose q194's dominant stage (r10 VERDICT item 5): the ADC
expansion stage = BNLJ fan-out -> ADC projection (m element_at reads)
-> full per-partition Sort -> partial WindowGroupLimit. Variants build
successively larger prefixes of that pipeline so the interleaved deltas
attribute the stage's CPU:

  expand_only : BNLJ fan-out, project (query_id, vec_id) - no ADC math
  adc_proj    : + the ADC projection (what Project(80) computes)
  full        : + top-k (Sort + WindowGroupLimit + Window) = shipped q194

Usage: python tools/ab_measure.py tools.ab_q194_decomp:build [rounds]
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm.clustering import (
    _adc_from_lut,
    _codes_wide,
    _lloyd_rounds_long,
    _query_lut,
    _subspace_long,
    _train_long,
    _adc_topk,
)
from stock_data_pipeline_spark.llm.fanout import fanout_partitions
from stock_data_pipeline_spark.queries import REGISTRY
from stock_data_pipeline_spark.catalog import load_table

M, SUB_DIM, K, ROUNDS, QBITS, QMOD, TOPK, TMOD = 16, 4, 256, 2, 10, 97, 10, 16


def _expanded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pts = _subspace_long(emb, "vec_id", "embedding", M, SUB_DIM, QBITS)
    assigned, cents = _lloyd_rounds_long(
        pts, K, ROUNDS, SUB_DIM, train=_train_long(pts, TMOD)
    )
    codes = _codes_wide(assigned, QMOD)
    lut = _query_lut(pts, cents, QMOD, K)
    par = fanout_partitions(emb, None)
    return codes.repartition(par, "vec_id", "codes").crossJoin(F.broadcast(lut))


def build(spark, sf_dir):
    fn = REGISTRY["q194_pq_adc_topk"].fn

    def run_full():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run_expand_only():
        (
            _expanded(spark, sf_dir)
            .select("query_id", "vec_id")
            .write.format("noop").mode("overwrite").save()
        )

    def run_adc_proj():
        (
            _expanded(spark, sf_dir)
            .select("query_id", "vec_id", _adc_from_lut(M, K).alias("adc_dist"))
            .write.format("noop").mode("overwrite").save()
        )

    return {
        "expand_only": run_expand_only,
        "adc_proj": run_adc_proj,
        "full": run_full,
    }
