"""Deeper decomposition of q194's upstream (r10): where do the ~14.5
CPU-s of expand_only actually sit? Variants noop successively deeper
prefixes of the PQ pipeline:

  pts      : _subspace_long only (scan + explode, N*m rows)
  assigned : + Lloyd init/round + final assignment (N*m*k distances)
  codes    : + _codes_wide groupBy(vec_id) collect_list
  lut      : codes + _query_lut (both tables, no crossJoin)

Usage: python tools/ab_measure.py tools.ab_q194_upstream:build [rounds]
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load_table
from stock_data_pipeline_spark.llm.clustering import (
    _codes_wide,
    _lloyd_rounds_long,
    _query_lut,
    _subspace_long,
    _train_long,
)

M, SUB_DIM, K, ROUNDS, QBITS, QMOD, TMOD = 16, 4, 256, 2, 10, 97, 16


def build(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_pts():
        noop(_subspace_long(emb, "vec_id", "embedding", M, SUB_DIM, QBITS))

    def _assigned():
        pts = _subspace_long(emb, "vec_id", "embedding", M, SUB_DIM, QBITS)
        assigned, cents = _lloyd_rounds_long(
            pts, K, ROUNDS, SUB_DIM, train=_train_long(pts, TMOD)
        )
        return pts, assigned, cents

    def run_assigned():
        noop(_assigned()[1])

    def run_codes():
        noop(_codes_wide(_assigned()[1], QMOD))

    def run_lut():
        pts, assigned, cents = _assigned()
        noop(_codes_wide(assigned, QMOD))
        noop(_query_lut(pts, cents, QMOD, K))

    return {
        "pts": run_pts,
        "assigned": run_assigned,
        "codes": run_codes,
        "codes_lut": run_lut,
    }
