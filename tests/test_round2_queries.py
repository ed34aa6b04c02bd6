"""Round-2 batch (q86-q92): invariants + the plan shapes the scale
story claims (broadcast dims, TakeOrderedAndProject top-k, shared
window exchanges). Value correctness is the DuckDB oracle's job
(test_oracle_parity + the driver gate); these tests pin the *physical*
properties that matter at 100 TB.
"""

from __future__ import annotations

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dup_ngram_spans_ratio_bounds(spark):
    rows = REGISTRY["q86_dup_ngram_spans"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_ratio <= 1.0


def test_group_quantiles_monotone(spark):
    rows = REGISTRY["q87_group_quantiles"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99


def test_scd2_intervals_chain(spark):
    rows = REGISTRY["q88_scd2_priority"].fn(spark, SF).collect()
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for versions in by_cust.values():
        versions.sort(key=lambda r: r.version_n)
        # exactly one open (current) version, and it is the last one
        open_versions = [r for r in versions if r.valid_to is None]
        assert open_versions == [versions[-1]]
        for prev, nxt in zip(versions, versions[1:]):
            # half-open chain: each version ends where the next begins
            assert prev.valid_to == nxt.valid_from
            # consecutive versions genuinely differ (the SCD2 point)
            assert prev.priority != nxt.priority


def test_scd2_single_exchange(spark):
    # lag-dedup, version numbering, and lead(valid_to) all share one
    # (o_custkey) partitioning: exactly one shuffle in the whole plan
    plan = _plan(REGISTRY["q88_scd2_priority"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_embedding_quantize_int8_range(spark):
    import math

    rows = REGISTRY["q89_embedding_quantize"].fn(spark, SF).collect()
    assert rows
    dim = 64
    for r in rows:
        assert r.scale > 0 and math.isfinite(r.scale)
        # each |q_i| <= 127  =>  qnorm <= dim * 127^2, |qsum| <= dim * 127
        assert abs(r.qsum) <= dim * 127
        assert 0 <= r.qnorm <= dim * 127 * 127
        assert r.recon_err >= 0.0
        # quantization error per component is < 0.5/scale
        assert r.recon_err <= dim * (0.5 / r.scale) ** 2 + 1e-12


def test_shipping_priority_broadcasts_dim_and_heaps_topk(spark):
    plan = _plan(REGISTRY["q90_shipping_priority"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    assert "TakeOrderedAndProject" in plan, plan[:3000]


def test_promo_share_broadcasts_part(spark):
    plan = _plan(REGISTRY["q92_promo_share"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan[:3000]
    # fact side reaches the rollup through the broadcast join with no
    # intermediate exchange: the only shuffle is the month aggregate
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_returned_revenue_aggregates_before_dim_join(spark):
    # the customer join must consume the aggregated per-custkey frame
    # (rows ~ n_customers), not raw lineitems: in the plan the dim join
    # sits ABOVE the aggregate
    plan = _plan(REGISTRY["q91_returned_revenue"].fn(spark, SF))
    agg_pos = plan.find("HashAggregate")
    assert agg_pos != -1
    scan_c = plan.find("customer")
    assert scan_c > agg_pos, plan[:3000]
