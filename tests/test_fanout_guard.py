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

import re

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# query -> (expected composite guard key, expected number of
# REPARTITION_BY_NUM exchanges hashing exactly that key). Pinning the
# KEY, not just the marker (r07 ADVICE): a future unrelated
# explicit-count repartition elsewhere in a plan would keep a bare
# "marker present" assertion green while the actual guard ahead of the
# fan-out join disappears.
GUARDED = {
    # r09: the guard key is (vec_id, codes) — the code table is one row
    # per vector with the m code words as an array (llm/clustering.
    # _codes_wide); bare vec_id would be elided against the aggregate's
    # own vec_id partitioning.
    "q194_pq_adc_topk": (("vec_id", "codes"), 1),    # llm/clustering.pq_adc_topk
    "q198_ivf_pq_topk": (("vec_id", "list_id"), 1),  # llm/clustering.ivf_pq_topk
    "q53_ann_ivf_topk": (("match_id", "list_id"), 1),  # llm/similarity.ivf_flat_topk
    # bucketed variants (r08 IVF-flat, r09 IVF-PQ): BOTH probe-join
    # inputs carry the guard on the salted composite key — corpus side
    # and exploded query side.
    "q395_ann_ivf_bucketed": (("list_id", "__salt"), 2),
    "q396_ivfpq_bucketed": (("list_id", "__salt"), 2),
}


def _guard_exchanges(plan: str, key: tuple[str, ...]) -> int:
    cols = r",\s*".join(rf"{re.escape(c)}#\d+L?" for c in key)
    pat = rf"Exchange hashpartitioning\({cols},\s*\d+\), REPARTITION_BY_NUM"
    return len(re.findall(pat, plan))


@pytest.mark.parametrize("name", sorted(GUARDED))
def test_fanout_guard_survives_planning(spark, name):
    key, want = GUARDED[name]
    plan = (
        REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    got = _guard_exchanges(plan, key)
    assert got >= want, (
        f"{name}: expected >= {want} REPARTITION_BY_NUM exchange(s) hashing "
        f"{key}, found {got} — the fan-out guard repartition was optimized "
        "away or its key changed; the exchange ahead of the row-multiplying "
        "join is AQE-coalescible again (see module docstring)"
    )


def test_bucketed_probe_join_broadcasts_nothing(spark):
    """q395's contract is the ABSENCE of a mandatory broadcast: the
    STATIC plan (pre-AQE — AQE legitimately converts small sides to
    broadcast at test scale) must join the salted probe inputs with a
    shuffle join on (list_id, __salt), and the only static broadcasts
    are the nlist-row centroid attaches. A corpus shuffle keyed on bare
    list_id (nlist distinct values) must not exist either."""
    static = (
        REGISTRY["q395_ann_ivf_bucketed"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert re.search(
        r"SortMergeJoin \[list_id#\d+L?, __salt#\d+", static
    ) or re.search(
        r"ShuffledHashJoin \[list_id#\d+L?, __salt#\d+", static
    ), "probe join is no longer a shuffle join on the salted composite key"
    # the two centroid attaches are BroadcastNestedLoopJoin (crossJoin of
    # a broadcast nlist-row side); no BroadcastHashJoin may appear — that
    # would mean a side of the probe path got a mandatory broadcast back
    assert "BroadcastHashJoin" not in static, (
        "static plan re-acquired a mandatory broadcast on the probe path"
    )
    assert not re.search(
        r"Exchange hashpartitioning\(list_id#\d+L?,\s*\d+\)", static
    ), "corpus shuffles on bare nlist-valued list_id — straggler by construction"


def test_bucketed_ivfpq_broadcasts_nothing_corpus_proportional(spark):
    """q396's contract (r08 VERDICT item 3): the static plan moves BOTH
    corpus-proportional query-side tables without a broadcast — the
    per-query ADC LUTs attach to the probe rows via a query_id shuffle
    join of two |Q|-sized tables, and the combined probe side goes
    through the salted (list_id, __salt) shuffle join BEFORE any
    fan-out (the r09 probe caught the first cut shuffling the
    quadratic candidate set to meet the LUT afterwards — beta 1.5).
    Unlike q395 the plan legitimately contains BroadcastHashJoins (the
    m·k codebook / init-id attaches — parameter-sized at any corpus
    scale), so the pin is the ABSENCE of broadcasts keyed on the
    corpus-proportional join keys, plus the non-coalescible guard
    exchanges on both sides of the salted join."""
    static = (
        REGISTRY["q396_ivfpq_bucketed"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin) \[list_id#\d+L?, __salt#\d+", static
    ), "probe join is no longer a shuffle join on the salted composite key"
    assert re.search(
        r"(SortMergeJoin|ShuffledHashJoin) \[query_id#\d+", static
    ), "LUT attach is no longer a query_id shuffle join"
    for key in ("query_id", "list_id"):
        assert not re.search(
            rf"BroadcastHashJoin \[{key}#\d+", static
        ), f"static plan re-acquired a broadcast keyed on corpus-proportional {key}"
    assert not re.search(
        r"Exchange hashpartitioning\(list_id#\d+L?,\s*\d+\)", static
    ), "corpus shuffles on bare nlist-valued list_id — straggler by construction"
    # the window's partial group-limit must reduce the candidate set
    # BEFORE its query_id exchange — without it the |Q|-proportional-
    # times-corpus scored set would cross the fabric after all
    assert "WindowGroupLimit" in static, "top-k lost its partial group limit"


def test_broadcast_size_gate_switches_and_raises(spark, monkeypatch):
    """r08 VERDICT item 7 + item 3's 'size-gate' half: the broadcast-
    shape ANN operators consult Catalyst's static size estimate of the
    query side (no Spark action). Past the budget: ivf_flat_topk and
    ivf_pq_topk AUTO-SWITCH to their row-identical bucketed twins (the
    static plan acquires the salted shuffle join); pq_adc_topk RAISES
    naming the scale path (a full ADC scan has no bucketed twin);
    force_broadcast=True keeps the pinned broadcast plan everywhere."""
    from stock_data_pipeline_spark.llm import fanout, similarity
    from stock_data_pipeline_spark.llm.clustering import ivf_pq_topk, pq_adc_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(emb.vec_id % 7 == 0)
    monkeypatch.setattr(fanout, "QUERY_BROADCAST_LIMIT_BYTES", 1)

    def static_plan(df):
        return df._jdf.queryExecution().sparkPlan().toString()

    salted = r"(SortMergeJoin|ShuffledHashJoin) \[list_id#\d+L?, __salt#\d+"
    assert re.search(
        salted, static_plan(similarity.ivf_flat_topk(emb, queries, k=8, nlist=16, nprobe=4))
    ), "ivf_flat_topk did not switch to the bucketed shape past the budget"
    assert not re.search(
        salted,
        static_plan(
            similarity.ivf_flat_topk(
                emb, queries, k=8, nlist=16, nprobe=4, force_broadcast=True
            )
        ),
    ), "force_broadcast did not keep the broadcast shape"
    pq = dict(
        query_mod=97, m=4, sub_dim=16, k=16, rounds=2, quant_bits=10,
        topk=10, train_mod=16,
    )
    assert re.search(
        salted, static_plan(ivf_pq_topk(emb, n_lists=8, nprobe=2, **pq))
    ), "ivf_pq_topk did not switch to the bucketed shape past the budget"
    with pytest.raises(ValueError, match="ivf_pq_topk_bucketed"):
        pq_adc_topk(emb, **pq)
    pq_adc_topk(emb, force_broadcast=True, **pq)  # override builds the plan


@pytest.mark.parametrize("name", sorted(GUARDED))
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
