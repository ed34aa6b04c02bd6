"""Document/embedding clustering — fixed-round Lloyd k-means.

Reference scope: the reference pipeline has no clustering; this is part
of the training-data extension set (corpus organization / diversity
sampling before mixture construction), built the way iterative ML fits
Spark: each Lloyd round is a broadcast-join assignment plus one
posexplode aggregation, all declarative, no driver-side data movement.

Determinism & verifiability: embeddings are quantized to integers
(``floor(x · 2^quant_bits)`` — exact: float32→double is exact and the
multiplier is a power of two), so per-cluster per-dimension sums are
exact int64 arithmetic (order-independent), centroid means are ONE
double division of identical operands, and distance² folds run
left-to-right from a 0.0 seed — every round reproduces bit-identically
in any ANSI-SQL engine (see q80's generated oracle).

Scale design: centroids are k rows — always broadcast; the assignment
is a broadcast nested-loop over k (no shuffle of the corpus); the
recompute shuffles (cluster, dim, int64) triples with map-side partial
aggregation. Rounds are unrolled lazily (no actions, no checkpoints —
``rounds`` is small by design; for to-convergence clustering reuse the
``connected_components`` checkpoint pattern)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_data_pipeline_spark.llm.similarity import _fold_sum


def _quantize(vec, bits: int):
    scale = float(1 << bits)
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def _sq_dist(qv, cv):
    """Σ (q_i − c_i)² as a left fold (0.0 seed, ascending index) —
    bit-reproducible given identical operands."""
    return _fold_sum(
        F.zip_with(
            qv,
            cv,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        )
    )


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per point; ties broken by centroid id. The
    centroid table is k rows — broadcast, so the corpus never shuffles
    during assignment."""
    scored = pts.crossJoin(F.broadcast(cents)).withColumn(
        "dist2", _sq_dist(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "qv", "cid", "dist2")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """New centroids: exact int64 per-dimension sums (posexplode →
    map-side-combined hash aggregate), then one double division per
    dimension. Empty clusters drop out (same as the SQL oracle)."""
    ex = assigned.select("cid", F.posexplode("qv").alias("dim", "x"))
    sums = ex.groupBy("cid", "dim").agg(F.sum("x").alias("s"))
    cnt = assigned.groupBy("cid").agg(F.count("*").alias("n"))
    return (
        sums.groupBy("cid")
        .agg(F.sort_array(F.collect_list(F.struct("dim", "s"))).alias("ds"))
        .join(cnt, "cid")
        .select(
            "cid",
            F.transform("ds", lambda t: t["s"].cast("double") / F.col("n")).alias("cv"),
        )
    )


def kmeans_fixed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    quant_bits: int = 10,
) -> DataFrame:
    """``rounds`` unrolled Lloyd iterations over quantized embeddings;
    init = the ``k`` lowest-id vectors (deterministic, no RNG state).
    Returns (vec_id, cluster_id, dist2) — the final assignment and its
    squared distance to the pre-update centroid."""
    pts = df.select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col), quant_bits).alias("qv")
    )
    # init: k lowest-id vectors via orderBy().limit() (per-partition
    # heaps — NOT a global single-partition window over the corpus);
    # the ranking window then runs over only k rows
    w = Window.orderBy("vec_id")
    cents = (
        pts.orderBy("vec_id")
        .limit(k)
        .withColumn("__rn", F.row_number().over(w))
        .select(
            (F.col("__rn") - 1).cast("int").alias("cid"),
            F.transform("qv", lambda x: x.cast("double")).alias("cv"),
        )
    )
    assigned = None
    for _ in range(rounds):
        assigned = _assign(pts, cents)
        cents = _recompute(assigned)
    return assigned.select(
        "vec_id", F.col("cid").cast("int").alias("cluster_id"), "dist2"
    )
