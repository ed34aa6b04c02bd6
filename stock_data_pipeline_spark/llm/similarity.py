"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline; the scale path is
random-hyperplane LSH bucketing (candidates from an equi-join on bucket
signature, exact rerank inside buckets).

Numeric discipline: dot products fold left-to-right in DOUBLE with a
0.0 seed, so the result is bit-identical to any engine folding the same
way (IEEE addition with an exact-zero seed) — this is what lets the
DuckDB oracle hash-match float math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus — one scan of the corpus, no corpus-side shuffle for scoring;
    the only exchange is the per-query top-k (tiny: k × #queries).

    Deterministic ranking: (score DESC, corpus id ASC).
    Returns (query_id, match_id, score, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cvec"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "score", cosine(F.col("__qvec"), F.col("__cvec"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("match_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def _plane_weight(table: Column | int, plane: Column | int, dim_idx: Column | int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1):
    derived from xxhash64(table, plane, i) — reproducible across
    runs/executors with no driver-side RNG state to broadcast."""
    h = F.pmod(F.xxhash64(F.lit("plane"), table, plane, dim_idx), F.lit(1 << 20))
    return h.cast("double") / F.lit(float(1 << 19)) - F.lit(1.0)


def _table_signature(vec: Column, table: Column, num_planes: int, dim: int) -> Column:
    """LSH bucket for one table: ``num_planes`` sign bits of
    ⟨random plane, vec⟩ packed into a long."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            _fold_sum(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: _plane_weight(table, p, i) * F.element_at(vec, i + 1).cast("double"),
                )
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b.cast("long"))


def _with_buckets(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str, vec_alias: str,
    num_tables: int, num_planes: int, dim: int,
) -> DataFrame:
    sigs = F.transform(
        F.sequence(F.lit(0), F.lit(num_tables - 1)),
        lambda t: F.struct(
            t.alias("table_idx"),
            _table_signature(F.col(vec_alias), t, num_planes, dim).alias("bucket"),
        ),
    )
    return (
        df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
        .withColumn("__sig", F.explode(sigs))
        .select(id_alias, vec_alias, "__sig.table_idx", "__sig.bucket")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent hyperplane-LSH
    tables of ``num_planes`` sign bits; candidates share a bucket in ≥1
    table; exact cosine rerank on candidates only.

    Scale shape: signatures are computed in one scan per side;
    candidate generation is an equi-join on (table_idx, bucket) —
    shuffle ∝ rows × tables, never |corpus| × |queries|. Recall rises
    with ``num_tables``; bucket size falls with ``num_planes``.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    cand_c = _with_buckets(corpus, id_col, vec_col, "match_id", "__cvec", num_tables, num_planes, dim)
    cand_q = _with_buckets(queries, id_col, vec_col, "query_id", "__qvec", num_tables, num_planes, dim)
    cands = (
        cand_c.join(cand_q, ["table_idx", "bucket"])
        .select("query_id", "__qvec", "match_id", "__cvec")
        .distinct()
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("match_id"))
    scored = cands.withColumn("score", cosine(F.col("__qvec"), F.col("__cvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def ivf_flat_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-flat ANN: partition the corpus into ``nlist`` inverted lists
    by nearest centroid; each query probes only its ``nprobe`` closest
    lists and reranks exactly inside them. The other classic scale path
    next to LSH (:func:`ann_lsh_topk`): cost drops from |corpus| to
    ~|corpus|·nprobe/nlist per query, recall rises with ``nprobe``.

    Centroids here are the first ``nlist`` corpus vectors (deterministic,
    no RNG/iteration state — production would run k-means|| and
    broadcast the result; the plan shape is identical). Assignment is
    one scan with broadcast centroids; the probe join is an equi-join on
    list id — never |corpus|×|queries|.
    """
    cents = (
        corpus.orderBy(id_col).limit(nlist)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("__cvec"))
    )

    def assign(df: DataFrame, id_alias: str, vec_alias: str, n_assign: int) -> DataFrame:
        scored = (
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
            .crossJoin(F.broadcast(cents))
            .withColumn("__cscore", cosine(F.col(vec_alias), F.col("__cvec")))
        )
        w = Window.partitionBy(id_alias).orderBy(F.col("__cscore").desc(), F.col("cent_id"))
        return (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n_assign)
            .select(id_alias, vec_alias, F.col("cent_id").alias("list_id"))
        )

    corpus_lists = assign(corpus, "match_id", "__mvec", 1)       # each vector in 1 list
    query_probes = assign(queries, "query_id", "__qvec", nprobe)  # each query probes nprobe
    cands = corpus_lists.join(query_probes, "list_id").select(
        "query_id", "__qvec", "match_id", "__mvec"
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("match_id"))
    scored = cands.withColumn("score", cosine(F.col("__qvec"), F.col("__mvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidates + exact
    threshold filter. Returns (id_a, id_b, score), id_a < id_b."""
    if df.isStreaming:
        raise ValueError("near-dup pairing is a batch operator")
    dim = len(df.select(vec_col).first()[0])
    cand = _with_buckets(df, id_col, vec_col, "id_a", "__avec", num_tables, num_planes, dim)
    other = _with_buckets(df, id_col, vec_col, "id_b", "__bvec", num_tables, num_planes, dim)
    pairs = (
        cand.join(other, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "__avec", "id_b", "__bvec")
        .distinct()
        .withColumn("score", cosine(F.col("__avec"), F.col("__bvec")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
    return pairs
