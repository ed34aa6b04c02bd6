"""Stratified-sample invariants (q72) and approximate-sketch accuracy:
HLL distinct counts and approx percentiles vs their exact twins —
the sketches a 100 TB corpus profile actually runs (exact
countDistinct on billions of doc ids is a full shuffle; the sketch is
map-side mergeable and constant memory)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load_table
from stock_data_pipeline_spark.queries import q72_stratified_sample

SF = "/root/testdata/sf0.01"


def test_stratified_sample_rates_and_stability(spark):
    total = load_table(spark, SF, "documents").groupBy("lang").count()
    tot = {r["lang"]: r["count"] for r in total.collect()}
    samp = q72_stratified_sample(spark, SF).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in samp.collect()}
    # en downsampled to ~10%, minorities kept at ~50% (binomial-ish slack)
    assert got["en"] / tot["en"] < 0.25
    for lang, n in tot.items():
        if lang != "en" and n >= 40:
            assert 0.25 < got.get(lang, 0) / n < 0.75
    # determinism: identical result under a different partitioning
    again = (
        q72_stratified_sample(spark, SF).repartition(13).groupBy("lang").count()
    )
    assert {r["lang"]: r["count"] for r in again.collect()} == got


def test_hll_distinct_within_rsd(spark):
    d = load_table(spark, SF, "documents")
    exact, approx = d.select(
        F.countDistinct("doc_id").alias("e"),
        F.approx_count_distinct("doc_id", rsd=0.01).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.05  # 1% target rsd, 5σ slack


def test_approx_percentile_vs_exact(spark):
    li = load_table(spark, SF, "lineitem")
    exact, approx = li.select(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.01


def test_kmv_estimate_accuracy_and_exhaustive_mode(spark):
    """KMV invariants: with fewer distinct values than k the sketch is
    exhaustive (estimate == exact count); above k the estimate lands
    within the ~1/sqrt(k) theoretical band. Duplicates must not move
    the estimate (MIN over distinct hashes)."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.operators.sketches import kmv_distinct_estimate

    small = spark.range(100).select((F.col("id") * 7).alias("v"))
    r = kmv_distinct_estimate(small, "v", k=256).first()
    assert r["n_kept"] == 100 and r["estimate"] == 100.0

    big = spark.range(50_000).select((F.col("id") % 20_000).alias("v"))
    r = kmv_distinct_estimate(big, "v", k=256).first()
    assert r["n_kept"] == 256
    assert abs(r["estimate"] - 20_000) / 20_000 < 0.20  # 3x the 1/sqrt(256) sigma

    # duplicate-insensitivity: same distinct set, 5x the rows
    dup = big.unionAll(big).unionAll(big).unionAll(big).unionAll(big)
    r2 = kmv_distinct_estimate(dup, "v", k=256).first()
    assert r2["estimate"] == r["estimate"]
