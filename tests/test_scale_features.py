"""Scale-path evidence tests: the Spark features a 100 TB deployment
leans on — partition-pruned data-lake layout and runtime Bloom-filter
join pruning — demonstrated and asserted on the fixture data.

These are plan/layout assertions, not value checks (values are covered
by the oracle gate): they pin that the *mechanisms* stay wired — a
regression here means full-table scans at cluster scale even though
every small-scale value still matches."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_partitioned_write_prunes_files(spark, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column
    must prune at the FILE level (PartitionFilters in the scan), not
    row-filter the full table — at 100 TB this is the difference
    between reading one partition and reading everything."""
    from stock_data_pipeline_spark.io import write_parquet_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    out = str(tmp_path / "li_part")
    write_parquet_table(li, out, mode="overwrite", partition_by=["l_returnflag"])

    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "A")
    plan = back._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("PartitionFilters: [", 1)
    assert len(parts) == 2 and "l_returnflag" in parts[1].split("]")[0], plan[:1500]
    # values survive the layout round-trip (collect also populates the
    # scan metrics of THIS DataFrame's query execution)
    assert len(back.collect()) == li.filter(F.col("l_returnflag") == "A").count()
    # the scan must have touched exactly ONE of the three partition
    # directories — file-level pruning, not row filtering
    def _leaves(node):
        n = node.children().size()
        if n == 0:
            return [node]
        acc = []
        for i in range(n):
            acc += _leaves(node.children().apply(i))
        return acc

    metrics = {}
    for leaf in _leaves(back._jdf.queryExecution().executedPlan()):
        it = leaf.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
    assert metrics.get("numPartitions") == 1, metrics
    assert metrics.get("numFiles", 0) >= 1


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime Bloom-filter injection: a selective dimension-side filter
    must reach the fact-side scan as a bloom_filter_might_contain guard
    when the join can't broadcast — Spark's big-big-join answer to
    'don't shuffle fact rows that can never match'. Thresholds are
    lowered to fire at fixture scale; on a real cluster the defaults
    (10 MB creation side) do the same against TB fact tables."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        # the guarded join still returns exactly the join's rows
        expected = li.join(
            spark.read.parquet(f"{SF}/orders.parquet").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        ).count()
        assert j.count() == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# AQE skew-join splitting (r08): the probe (tools/skew_probe.py,
# SKEW_r08.json) measured WHEN Spark's skew splitter can and cannot
# save a hot-key shuffle join; these tests pin both behaviors so a
# session-conf or Spark-version change that silently disables the
# mitigation fails loudly. Synthetic data instead of the .scale
# fixtures: the shapes (join→agg-on-other-key vs join→agg-on-join-key)
# are what decide splitting, not the table.
# ---------------------------------------------------------------------------

_SKEW_CONFS = {
    # fixture-ratio thresholds: same skew-to-median RATIO production
    # defaults (256m/64m/5.0) encode, scaled to a ~10 MB test shuffle
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    # production shape: neither side of a 100 TB fact join broadcasts
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _skewed_fact_dim(spark):
    # 1.9M rows on ONE key + md5 pad so the hot partition's SHUFFLED
    # bytes stay above threshold after column pruning + lz4 (a constant
    # key column alone compresses to nothing and can never trip a
    # byte-based splitter)
    fact = (
        spark.range(0, 2_000_000)
        .withColumn(
            "k",
            F.when(F.col("id") < 1_900_000, F.lit(0)).otherwise(F.col("id") % 100),
        )
        .withColumn("pad", F.md5(F.col("id").cast("string")))
    )
    dim = (
        spark.range(0, 100)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
    )
    return fact, dim


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _final_plan(df) -> str:
    # collect() executes THIS DataFrame's QueryExecution, so its
    # AdaptiveSparkPlan is finalized — a noop write would plan its own
    # QE and leave this one an unexecuted template (the skew-probe bug)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_skew_split_fires_on_agg_off_join_key(spark):
    """q01 shape — join on k, aggregate on a DIFFERENT key: nothing
    downstream reuses the join's hash distribution, so at fixture-ratio
    thresholds the splitter must fire."""
    fact, dim = _skewed_fact_dim(spark)
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        j = (
            fact.join(dim, "k")
            .groupBy((F.col("id") % 13).alias("g"))
            .agg(F.sum(F.length("pad") + F.col("v")).alias("s"))
        )
        plan = _final_plan(j)
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore(spark, saved)


def test_aqe_skew_split_blocked_by_distribution_reuse(spark):
    """q90 shape — aggregate ON the join key: hashpartitioning(k)
    satisfies the final agg's ClusteredDistribution, the exchange is
    elided, and OptimizeSkewedJoin REVERTS rather than break that
    reuse. The splitter never fires at ANY threshold without force
    (first assert — the trap, demonstrated with force explicitly off),
    and forceOptimizeSkewedJoin=true — the ENGINE DEFAULT since r08,
    see session.py — is the mitigation: split anyway, pay one extra
    exchange (second assert)."""
    fact, dim = _skewed_fact_dim(spark)
    saved = _with_confs(spark, _SKEW_CONFS)
    try:
        def agg_on_join_key():
            return (
                fact.join(dim, "k")
                .groupBy("k")
                .agg(F.sum(F.length("pad") + F.col("v")).alias("s"))
            )

        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
        try:
            assert "skew=true" not in _final_plan(agg_on_join_key())
        finally:
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        plan = _final_plan(agg_on_join_key())
        assert "skew=true" in plan, plan[:2000]
    finally:
        _restore(spark, saved)


def test_engine_default_forces_skew_split_through_distribution_reuse(spark):
    """The session factory must ship forceOptimizeSkewedJoin=true (the
    SKEW_r08 mitigation) — a conf or factory regression re-opens the
    q90-shape trap at 100 TB while every fixture-scale run stays green."""
    from stock_data_pipeline_spark.session import get_session

    assert (
        get_session().conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin")
        == "true"
    )


def test_ensure_engine_confs_forces_skew_split_on_foreign_sessions(spark):
    """ensure_engine_confs is the hook for sessions the engine did NOT
    build (the driver hands one to __spark_entry__); the skew-force
    mitigation must apply on that path too (r08 ADVICE: it was
    factory-only, so driver sessions silently lost it)."""
    from stock_data_pipeline_spark.session import ensure_engine_confs

    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    try:
        ensure_engine_confs(spark)
        assert (
            spark.conf.get("spark.sql.adaptive.forceOptimizeSkewedJoin") == "true"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")


# ---------------------------------------------------------------------------
# ANN recall floors (r08, re-recorded r09): pinned on the committed
# RECALL_r09.json artifact (tools/ann_recall.py) — recall that
# collapses with corpus growth is a silent quality regression no
# value-hash oracle can catch. Artifact-based so the pins are
# deterministic; they fire when the artifact is regenerated after an
# operator change. See SCALE.md §15.
# ---------------------------------------------------------------------------


def _recall_artifact():
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parent.parent / "RECALL_r09.json"
    if not p.exists():
        import pytest

        pytest.skip("RECALL_r09.json not committed at this checkout")
    return json.loads(p.read_text())


def test_ann_recall_floors_hold_at_every_scale():
    rec = _recall_artifact()
    scales = [k for k in rec if not k.startswith("pq_budget")]
    assert len(scales) >= 2, "need at least two scales to speak about growth"
    for sf in scales:
        row = rec[sf]
        assert row["lsh_q29"] >= 0.80, (sf, row)
        assert row["ivf_q53"] >= 0.85, (sf, row)
        # tighter budget (nprobe 4/16) — the floor is lower but must
        # not erode as cells densify
        assert row["ivf_bucketed_q395"] >= 0.45, (sf, row)
        # r09: q194 re-registered at the 128-bit budget (m=16/k=256) —
        # the r08 16-bit config's 0.02-at-sf1 collapse was the round's
        # one red number; the floor pins the fix (measured 0.43-0.46
        # at every scale)
        assert row["pq_adc_q194"] >= 0.40, (sf, row)


def test_ann_recall_does_not_collapse_with_corpus_growth():
    """The largest corpus must not lose more than 10 recall points vs
    the smallest for ANY budgeted operator — since r09 that includes
    PQ-ADC (the 128-bit registered config holds flat where the old
    16-bit one fell 0.12→0.02; the 16-bit point now lives only in the
    budget curve)."""
    rec = _recall_artifact()
    scales = sorted(
        (k for k in rec if not k.startswith("pq_budget")), key=float
    )
    lo, hi = rec[scales[0]], rec[scales[-1]]
    for op in ("lsh_q29", "ivf_q53", "ivf_bucketed_q395", "pq_adc_q194"):
        assert hi[op] >= lo[op] - 0.10, (op, lo[op], hi[op])


def test_pq_code_budget_curve_is_monotone():
    """Recall must RISE steeply with code bits at fixed N — if it
    doesn't, the ADC ranking plan itself is broken (this is the pin
    that catches a scorer bug; the 16-bit config's absolute recall is
    a property of the uniform-random fixture, not of the plan)."""
    rec = _recall_artifact()
    curve = rec["pq_budget_curve_sf0.1"]
    by_bits = [curve[k] for k in sorted(curve, key=lambda s: int(s.rsplit("bits", 1)[1]))]
    assert by_bits == sorted(by_bits), curve
    assert by_bits[-1] >= 0.35, curve
    assert by_bits[-1] > by_bits[0] + 0.25, curve
