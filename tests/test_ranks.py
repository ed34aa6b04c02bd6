"""operators/ranks.py: the two-phase bucketed prefix family must be
bit-identical to the single-task global window it replaces — under
hostile repartitioning, with ties on the sort key, across bucket
grains (including every-row-one-bucket and all-rows-one-bucket
degenerations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_data_pipeline_spark.operators.ranks import (
    bucketed_lag,
    bucketed_row_number,
    bucketed_running_sum,
    ntile_from_rn,
)


@pytest.fixture(scope="module")
def data(spark):
    # keys with heavy ties on v (v = k % 7), deterministic shuffle-in
    df = (
        spark.range(0, 997)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.col("id") * 131, F.lit(7)).alias("v"),
            (F.pmod(F.col("id") * 57, F.lit(100)) - 50).alias("x"),
        )
        .repartition(13)  # hostile: order destroyed before the op
    )
    df.cache().count()
    return df


BUCKETS = [
    lambda: F.lit(0),                                       # degenerate: single bucket
    lambda: F.col("v"),                                     # one bucket per v
    lambda: F.col("v") - F.pmod(F.col("v"), F.lit(3)),      # coarse grain
]


@pytest.mark.parametrize("bi", range(len(BUCKETS)))
def test_row_number_matches_global(spark, data, bi):
    order = [F.col("v"), F.col("k")]
    got = bucketed_row_number(data, BUCKETS[bi](), order, out="rn")
    exp = data.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert (
        got.join(exp.withColumnRenamed("rn", "ern"), ["k", "v", "x"])
        .filter(F.col("rn") != F.col("ern"))
        .count()
        == 0
    )
    assert got.count() == 997


@pytest.mark.parametrize("bi", range(len(BUCKETS)))
def test_running_sum_matches_global(spark, data, bi):
    order = [F.col("v"), F.col("k")]
    got = bucketed_running_sum(data, BUCKETS[bi](), order, F.col("x"), out="cum")
    exp = data.withColumn(
        "cum",
        F.sum("x").over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert (
        got.join(exp.withColumnRenamed("cum", "ecum"), ["k", "v", "x"])
        .filter(F.col("cum") != F.col("ecum"))
        .count()
        == 0
    )


@pytest.mark.parametrize("bi", range(len(BUCKETS)))
def test_lag_matches_global(spark, data, bi):
    order = [F.col("v"), F.col("k")]
    got = bucketed_lag(data, BUCKETS[bi](), order, F.col("x"), out="prev")
    exp = data.withColumn("prev", F.lag("x").over(Window.orderBy(*order)))
    assert (
        got.join(exp.withColumnRenamed("prev", "eprev"), ["k", "v", "x"])
        .filter(
            ~(
                F.col("prev").eqNullSafe(F.col("eprev"))
            )
        )
        .count()
        == 0
    )


@pytest.mark.parametrize("n", [1, 7, 9, 10, 11, 100, 997])
def test_ntile_formula_matches_spark(spark, n):
    df = spark.range(1, n + 1).select(F.col("id").alias("k"))
    exp = df.withColumn("t", F.ntile(10).over(Window.orderBy("k")))
    got = (
        df.withColumn("rn", F.col("k"))
        .withColumn("t2", ntile_from_rn(F.col("rn"), F.lit(n), 10))
    )
    bad = (
        exp.join(got, "k")
        .filter(F.col("t") != F.col("t2"))
        .count()
    )
    assert bad == 0, f"ntile mismatch at n={n}"


def test_plan_has_no_unpartitioned_data_window(spark, data):
    """The whole point: the physical plan's only unpartitioned Window
    runs over the aggregated bucket table."""
    got = bucketed_row_number(data, BUCKETS[2](), [F.col("v"), F.col("k")], out="rn")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the local pass must be a partitioned window
    assert "Window" in plan
