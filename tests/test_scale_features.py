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
