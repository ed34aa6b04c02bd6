"""Bucketed co-located join: the 100 TB strategy for the flagship
lineitem⋈orders shuffle. Writing both sides bucketed by the join key
lets the sort-merge join read buckets directly — zero Exchange in the
plan, which is the property that survives a 1000× scale-up."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    li_name, o_name = f"li_b_{suffix}", f"o_b_{suffix}"
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "li"))
        .saveAsTable(li_name)
    )
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "o"))
        .saveAsTable(o_name)
    )
    yield li_name, o_name
    spark.sql(f"DROP TABLE IF EXISTS {li_name}")
    spark.sql(f"DROP TABLE IF EXISTS {o_name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_name, o_name = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        li, o = spark.table(li_name), spark.table(o_name)
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not re-shuffle either bucketed side; the
        # only allowed exchange is the one feeding the final groupBy
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part[:800]
        # and it still computes the right answer
        total = joined.agg(F.sum("n")).first()[0]
        assert total == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
