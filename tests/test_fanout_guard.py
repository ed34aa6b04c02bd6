"""The ANN fan-out guard must survive plan optimization (r07).

AQE sizes post-shuffle partitions by shuffle BYTES and cannot see that
a broadcast join downstream multiplies every row by the query count —
left alone it coalesces the small corpus-side exchange ahead of the
ADC / probe fan-out to ONE partition and the whole expansion runs
serially (measured r07: one 21 s task held half of q194's wall at the
10x fixture). The guard is an explicit-count repartition, which plans
as a REPARTITION_BY_NUM exchange — the one shuffle origin AQE never
coalesces. Two regressions this test pins:

1. The guard EXISTS in each executed plan. A bare same-key repartition
   (e.g. vec_id alone, when the input is already hashpartitioning on
   vec_id) is silently elided as redundant by the planner — which is
   exactly how the first cut of the fix lost its parallelism without
   failing any correctness test. The call sites therefore repartition
   on a composite key; this test fails if a future edit reverts to a
   key the optimizer can prove redundant.
2. The guard is the explicit-count form. REPARTITION_BY_COL (no count)
   and ENSURE_REQUIREMENTS exchanges are both AQE-coalescible.
"""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

GUARDED = [
    "q194_pq_adc_topk",   # llm/clustering.pq_adc_topk
    "q198_ivf_pq_topk",   # llm/clustering.ivf_pq_topk
    "q53_ann_ivf_topk",   # llm/similarity.ivf_flat_topk
]


@pytest.mark.parametrize("name", GUARDED)
def test_fanout_guard_survives_planning(spark, name):
    plan = (
        REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "REPARTITION_BY_NUM" in plan, (
        f"{name}: the fan-out guard repartition was optimized away — "
        "the corpus-side exchange ahead of the row-multiplying broadcast "
        "join is AQE-coalescible again (see module docstring)"
    )


@pytest.mark.parametrize("name", GUARDED)
def test_results_invariant_to_partition_counts(spark, name):
    """The guard count is ``defaultParallelism`` — a value that DIFFERS
    across clusters — so the operators' RESULTS must not depend on how
    many partitions the fan-out runs in (nor on the session's shuffle
    partition count). Top-k ties break on (distance, vec_id), which
    makes the output a pure function of the data; this pins that a
    future edit doesn't sneak partition-dependent state (e.g. a
    first-row-per-partition seed) into the ANN stack."""
    fn = REGISTRY[name].fn
    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = sorted(map(tuple, fn(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        high = sorted(map(tuple, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert low == high, f"{name}: results depend on the partition count"
