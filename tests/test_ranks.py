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


@pytest.fixture(scope="module")
def null_data(spark):
    """Hostile NULL shapes (r06 ADVICE): NULL leading sort key (→ NULL
    bucket), NULL values (incl. a NULL at a bucket's last row and an
    all-NULL leading run), ties, destroyed input order."""
    df = (
        spark.range(0, 499)
        .select(
            F.col("id").alias("k"),
            F.when(F.pmod(F.col("id"), F.lit(11)) == 0, F.lit(None))
            .otherwise(F.pmod(F.col("id") * 131, F.lit(7)))
            .alias("v"),
            F.when(F.pmod(F.col("id"), F.lit(5)) == 0, F.lit(None))
            .otherwise(F.pmod(F.col("id") * 57, F.lit(100)) - 50)
            .alias("x"),
        )
        .repartition(13)
    )
    df.cache().count()
    return df


NULL_BUCKETS = [
    lambda: F.col("v"),                                   # NULL bucket for NULL keys
    lambda: F.col("v") - F.pmod(F.col("v"), F.lit(3)),    # coarse, still NULL-mapping
]


@pytest.mark.parametrize("bi", range(len(NULL_BUCKETS)))
def test_row_number_null_bucket_keys(spark, null_data, bi):
    """NULL leading sort keys must neither drop rows nor misnumber:
    Spark windows order ASC NULLS FIRST, and the null-safe stitch keeps
    the NULL bucket."""
    order = [F.col("v"), F.col("k")]
    got = bucketed_row_number(null_data, NULL_BUCKETS[bi](), order, out="rn")
    exp = null_data.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.count() == 499  # no rows dropped at the stitch join
    assert (
        got.join(exp.withColumnRenamed("rn", "ern"), "k")
        .filter(F.col("rn") != F.col("ern"))
        .count()
        == 0
    )


@pytest.mark.parametrize("bi", range(len(NULL_BUCKETS)))
def test_running_sum_null_values_and_buckets(spark, null_data, bi):
    """A leading all-NULL run must stay NULL (not 0), later NULLs must
    not reset the sum, and NULL buckets must survive the stitch."""
    order = [F.col("v"), F.col("k")]
    got = bucketed_running_sum(null_data, NULL_BUCKETS[bi](), order, F.col("x"), out="cum")
    exp = null_data.withColumn(
        "cum",
        F.sum("x").over(
            Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert got.count() == 499
    assert (
        got.join(exp.withColumnRenamed("cum", "ecum"), "k")
        .filter(~F.col("cum").eqNullSafe(F.col("ecum")))
        .count()
        == 0
    )


def test_running_sum_all_null_prefix_stays_null(spark):
    """Pinpoint regression for the r06 ADVICE defect: first bucket all
    NULL → second bucket's rows must NOT read the offset as 0-started
    vs NULL-started differently from the global window."""
    df = spark.createDataFrame(
        [(0, None), (1, None), (2, None), (3, 5), (4, None), (5, 7)],
        "k int, x int",
    )
    got = bucketed_running_sum(
        df, F.col("k") - F.pmod(F.col("k"), F.lit(3)), [F.col("k")], F.col("x"), out="cum"
    )
    exp = {0: None, 1: None, 2: None, 3: 5, 4: 5, 5: 12}
    assert {r["k"]: r["cum"] for r in got.collect()} == exp


@pytest.mark.parametrize("bi", range(len(NULL_BUCKETS)))
def test_lag_null_values_and_buckets(spark, null_data, bi):
    """LAG is offset-1, not last-non-NULL: a mid-bucket NULL
    predecessor stays NULL (the stitch keys on row_number()==1, never
    on value nullness), and a bucket whose LAST value is NULL hands
    NULL to the next bucket's first row."""
    order = [F.col("v"), F.col("k")]
    got = bucketed_lag(null_data, NULL_BUCKETS[bi](), order, F.col("x"), out="prev")
    exp = null_data.withColumn("prev", F.lag("x").over(Window.orderBy(*order)))
    assert got.count() == 499
    assert (
        got.join(exp.withColumnRenamed("prev", "eprev"), "k")
        .filter(~F.col("prev").eqNullSafe(F.col("eprev")))
        .count()
        == 0
    )


def test_lag_bucket_boundary_null_handoff(spark):
    """Bucket ends in NULL → next bucket's first row lags NULL, and a
    NULL directly before a non-NULL inside a bucket stays NULL."""
    df = spark.createDataFrame(
        [(0, 1), (1, None), (2, None), (3, 4), (4, None), (5, 6)],
        "k int, x int",
    )
    got = bucketed_lag(
        df, F.col("k") - F.pmod(F.col("k"), F.lit(3)), [F.col("k")], F.col("x"), out="prev"
    )
    exp = {0: None, 1: 1, 2: None, 3: None, 4: 4, 5: None}
    assert {r["k"]: r["prev"] for r in got.collect()} == exp


def test_plan_has_no_unpartitioned_data_window(spark, data):
    """The whole point: the physical plan's only unpartitioned Window
    runs over the aggregated bucket table."""
    got = bucketed_row_number(data, BUCKETS[2](), [F.col("v"), F.col("k")], out="rn")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the local pass must be a partitioned window
    assert "Window" in plan
