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

from stock_data_pipeline_spark.llm.fanout import fanout_partitions


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


def portable_plane_weights(
    num_tables: int, num_planes: int, dim: int
) -> list[list[list[float]]]:
    """Driver-side hyperplane weights in [-1, 1) — dyadic rationals
    (20-bit hash / 2¹⁹) derived from splitmix64 index mixing, so they
    are exactly representable doubles whose repr() round-trips into any
    engine's SQL parser. Embedding the same literals in the Spark plan
    and a DuckDB oracle makes every signature bit value-verifiable:
    identical weights × identical fold order → bit-identical dots →
    identical buckets. No RNG state; pure function of the indices."""
    mask64 = (1 << 64) - 1
    out = []
    for t in range(num_tables):
        planes = []
        for p in range(num_planes):
            row = []
            for i in range(dim):
                z = (((t * 1_000_003 + p) * 1_000_003 + i + 1) * 0x9E3779B97F4A7C15) & mask64
                z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask64
                z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask64
                z ^= z >> 31
                h = (z >> 33) & ((1 << 20) - 1)
                row.append(h / float(1 << 19) - 1.0)
            planes.append(row)
        out.append(planes)
    return out


def xxhash_plane_weights(
    num_tables: int, num_planes: int, dim: int
) -> list[list[list[float]]]:
    """The EXACT weights the hashed (:func:`_plane_weight`) path
    computes, pre-evaluated driver-side: ``pmod(xxhash64('plane', t,
    p, i), 2^20) / 2^19 - 1`` via the bit-exact Python port of Spark's
    xxhash64 (functions/xx64.py, pinned against Spark in
    tests/test_xx64.py). The weights are a pure function of the
    indices — data-independent — so embedding them as literals in a
    DuckDB oracle gives the xxhash64 ANN twin (q29) a full value
    oracle with zero Spark-side change (r06 VERDICT item 4). Dyadic
    rationals: ``repr`` round-trips exactly through any SQL parser."""
    from stock_data_pipeline_spark.functions.xx64 import spark_xxhash64

    return [
        [
            [
                (spark_xxhash64("plane", t, p, i) % (1 << 20)) / float(1 << 19) - 1.0
                for i in range(dim)
            ]
            for p in range(num_planes)
        ]
        for t in range(num_tables)
    ]


def _table_signature(vec: Column, table: Column, num_planes: int) -> Column:
    """LSH bucket for one table: ``num_planes`` sign bits of
    ⟨random plane, vec⟩ packed into a long. The per-dimension weight is
    derived from the element index (PySpark 4 two-arg transform lambda),
    so no dimensionality probe is needed — the plan is built with zero
    Spark actions."""
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            _fold_sum(
                F.transform(vec, lambda x, i: _plane_weight(table, p, i) * x.cast("double"))
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b.cast("long"))


def _weights_tensor_sql(portable_weights: list[list[list[float]]]) -> str:
    """The [table][plane][dim] weight tensor as ONE SQL array literal.

    Expression shape matters here and was MEASURED twice: (a) a fully
    unrolled 64-term sum per plane (1920 expression nodes per side)
    blows past codegen method limits — 7× slower to execute than an
    array fold; (b) building the fold's literal arrays with per-value
    ``F.lit`` costs one py4j round-trip each (3,840 driver calls ≈
    4.6 s of *plan construction* per query build). Emitting the whole
    tensor as a single ``F.expr`` string keeps construction at one
    parse (~ms) and execution identical. ``repr`` of the dyadic
    weights round-trips exactly through the SQL parser — same literals
    the DuckDB oracle embeds."""
    return (
        "array("
        + ",".join(
            "array("
            + ",".join("array(" + ",".join(repr(w) for w in ws) + ")" for ws in planes)
            + ")"
            for planes in portable_weights
        )
        + ")"
    )


def _with_buckets(
    df: DataFrame, id_col: str, vec_col: str, id_alias: str,
    num_tables: int, num_planes: int,
    portable_weights: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(id, table_idx, bucket) — one row per (vector, table). The vector
    itself is NOT carried through: the bucket explode multiplies rows by
    ``num_tables``, so shipping embeddings here would multiply the
    candidate-join shuffle payload by the table count. Candidates travel
    as bare ids; consumers rejoin vectors for the exact rerank.

    Signature computation is the heavy map stage (rows × tables ×
    planes × dims interpreted multiply-adds), so the input is
    ``_spread`` first — an under-split local scan (one parquet file)
    would otherwise serialize it on one core; at cluster scale the scan
    has ≥parallelism splits and the spread is a no-op."""
    from stock_data_pipeline_spark.llm.dedup import _spread

    df = _spread(df, id_col)
    vec = F.col("__v")
    if portable_weights is not None:
        # one literal tensor, folded per table: acc*2 + sign-bit in
        # ascending plane order — the exact integer the hashed path and
        # the ANSI-SQL oracle compute
        wlit = F.expr(_weights_tensor_sql(portable_weights))
        sigs = F.transform(
            F.sequence(F.lit(0), F.lit(num_tables - 1)),
            lambda t: F.struct(
                t.alias("table_idx"),
                F.aggregate(
                    F.element_at(wlit, t + 1),
                    F.lit(0).cast("long"),
                    lambda acc, plane: acc * 2
                    + F.when(
                        _fold_sum(F.zip_with(vec, plane, lambda x, w: w * x.cast("double"))) >= 0,
                        F.lit(1),
                    )
                    .otherwise(F.lit(0))
                    .cast("long"),
                ).alias("bucket"),
            ),
        )
    else:
        sigs = F.transform(
            F.sequence(F.lit(0), F.lit(num_tables - 1)),
            lambda t: F.struct(
                t.alias("table_idx"),
                _table_signature(vec, t, num_planes).alias("bucket"),
            ),
        )
    return (
        df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias("__v"))
        .withColumn("__sig", F.explode(sigs))
        .select(id_alias, "__sig.table_idx", "__sig.bucket")
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    exclude_self: bool = True,
    portable_weights: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k: ``num_tables`` independent hyperplane-LSH
    tables of ``num_planes`` sign bits; candidates share a bucket in ≥1
    table; exact cosine rerank on candidates only.

    Scale shape: signatures are computed in one scan per side;
    candidate generation is an equi-join on (table_idx, bucket) —
    shuffle ∝ rows × tables, never |corpus| × |queries|. Recall rises
    with ``num_tables``; bucket size falls with ``num_planes``.

    ``portable_weights`` (from :func:`portable_plane_weights`) swaps the
    hashed plane weights for embedded literals, making the full
    candidate set + scores value-verifiable against an ANSI-SQL oracle.
    Plan construction triggers no Spark action on either path.

    Candidates are generated as bare (query_id, match_id) ids — the
    dedup shuffle carries 16 bytes/row, not two embeddings — and the
    vectors are joined back only for the exact rerank (query side
    broadcast: the query set is small by construction).
    """
    cand_c = _with_buckets(corpus, id_col, vec_col, "match_id", num_tables, num_planes, portable_weights)
    cand_q = _with_buckets(queries, id_col, vec_col, "query_id", num_tables, num_planes, portable_weights)
    cands = (
        cand_c.join(cand_q, ["table_idx", "bucket"])
        .select("query_id", "match_id")
        .distinct()
    )
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("match_id"))
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec"))
    cv = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("__cvec"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "match_id")
        .withColumn("score", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def _ivf_assignments(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    nprobe: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared IVF stage: deterministic first-``nlist`` centroids, each
    corpus vector assigned to its 1 nearest list, each query to its
    ``nprobe`` nearest. One scan per side against the BROADCAST
    centroids (nlist rows — broadcastable at any corpus scale; a
    production k-means|| result has the same shape). Factored out so
    :func:`ivf_flat_topk` (broadcast probe) and
    :func:`ivf_flat_topk_bucketed` (salted shuffle probe) provably
    share assignment semantics — they differ ONLY in the join shape."""
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
    return corpus_lists, query_probes


def _ivf_rerank_topk(cands: DataFrame, k: int, exclude_self: bool) -> DataFrame:
    """Shared IVF tail: exact cosine over candidate pairs, (score desc,
    match_id asc) tie-broken top-k per query."""
    if exclude_self:
        cands = cands.filter(F.col("query_id") != F.col("match_id"))
    scored = cands.withColumn("score", cosine(F.col("__qvec"), F.col("__mvec")))
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
    num_partitions: int | None = None,
    force_broadcast: bool = False,
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

    Contract: the QUERY side must be broadcastable (|Q|·nprobe rows ×
    one vector each). The probe join pins ``F.broadcast`` deliberately —
    the alternative the static planner picks for two unknown-size sides
    is a sort-merge join shuffling the whole corpus on the nlist-valued
    list id (maximal skew). A corpus-scale query batch needs a different
    shape entirely: salt the list id and bucket-join both sides —
    implemented as :func:`ivf_flat_topk_bucketed` (r08), which returns
    the SAME rows with no broadcast on the probe path.

    Size gate (r09): the contract is ENFORCED, not just documented —
    unless ``force_broadcast`` is set, the operator consults Catalyst's
    static size estimate of the query-side plan
    (:func:`..fanout.broadcastable_query_side`; no Spark action) and
    AUTO-SWITCHES to the row-identical bucketed twin when the side is
    not provably under the broadcast budget. Without CBO the estimate
    cannot see filter selectivity (a filtered scan estimates at the
    full scan's size), so the gate errs toward the always-safe shuffle
    shape; a caller who KNOWS the side is small (e.g. a handful of
    probe vectors filtered from a huge table) passes
    ``force_broadcast=True`` to keep the broadcast plan.

    ``num_partitions`` overrides the fan-out guard's partition count
    (default 2×defaultParallelism via :func:`.fanout.fanout_partitions`;
    results are partition-count-invariant).
    """
    from stock_data_pipeline_spark.llm.fanout import broadcastable_query_side

    if not force_broadcast and not broadcastable_query_side(queries, nprobe):
        return ivf_flat_topk_bucketed(
            corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
            nlist=nlist, nprobe=nprobe, exclude_self=exclude_self,
            num_partitions=num_partitions,
        )
    corpus_lists, query_probes = _ivf_assignments(
        corpus, queries, id_col, vec_col, nlist, nprobe
    )
    # Fan-out guard (r07, same as pq_adc_topk): the probe join multiplies
    # every corpus row by ~|Q|·nprobe/nlist, but AQE sizes the corpus
    # exchange by its own bytes and would coalesce it to a handful of
    # tasks that then run the whole exact-cosine rerank. The partition
    # count is explicit (REPARTITION_BY_NUM — the one shuffle origin AQE
    # never coalesces) and the key is COMPOSITE: a bare match_id
    # repartition would be elided as redundant against the assignment
    # window's match_id partitioning, leaving only a coalescible
    # ENSURE_REQUIREMENTS exchange.
    par = fanout_partitions(corpus, num_partitions)
    cands = corpus_lists.repartition(par, "match_id", "list_id").join(
        F.broadcast(query_probes), "list_id"
    ).select(
        "query_id", "__qvec", "match_id", "__mvec"
    )
    return _ivf_rerank_topk(cands, k, exclude_self)


def ivf_flat_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    exclude_self: bool = True,
    n_salt: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """IVF-flat ANN for CORPUS-SCALE query batches (r07 VERDICT item 3):
    row-identical to :func:`ivf_flat_topk` (shared assignment + rerank
    helpers, same tie-breaks), but the probe join broadcasts NOTHING —
    the shape that survives when |Q| is data-sized and
    ``ivf_flat_topk``'s mandatory ``F.broadcast(query_probes)`` would
    OOM the driver.

    The naive alternative — a plain shuffle join on ``list_id`` — is
    the worst join in the engine: the key has only ``nlist`` distinct
    values, so at most ``nlist`` reducers do all the rerank work and a
    hot list is a straggler by construction. Instead the list id is
    SALTED (same discipline as ``operators/skew.salted_join``):

    - corpus rows get ``__salt = pmod(xxhash64(match_id), n_salt)`` —
      one deterministic sub-key each, NO replication of the big side;
    - query probes explode ×``n_salt`` (the probe table is the smaller
      side even when |Q| ≈ |corpus|, since replication is per probe
      row, i.e. |Q|·nprobe·n_salt ids+vectors);
    - both sides repartition to an explicit count on the composite
      ``(list_id, __salt)`` key — REPARTITION_BY_NUM on BOTH inputs, so
      the sort-merge join reuses the exchanges (no extra
      ENSURE_REQUIREMENTS shuffle) and AQE can neither coalesce the
      exchanges ahead of the rerank fan-out (the r07 trap) nor needs
      its skew-join splitter: key cardinality is ``nlist × n_salt``
      with each hot list spread uniformly by the corpus-id hash.

    Every (query, corpus) pair sharing a probed list meets exactly
    once — at the corpus row's salt, which the exploded query side
    always carries — so the candidate set is exactly
    ``ivf_flat_topk``'s. ``n_salt`` defaults to ceil(guard partitions /
    nlist), the smallest spread that can occupy every core; results
    are invariant to ``n_salt`` and to partition counts (pinned by
    tests/test_fanout_guard.py-style plan + equality tests).
    """
    corpus_lists, query_probes = _ivf_assignments(
        corpus, queries, id_col, vec_col, nlist, nprobe
    )
    par = fanout_partitions(corpus, num_partitions)
    if n_salt is None:
        n_salt = max(1, -(-par // nlist))
    salted_c = corpus_lists.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("match_id")), F.lit(n_salt)).cast("int")
    )
    salted_q = query_probes.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(s).cast("int") for s in range(n_salt)])),
    )
    cands = (
        salted_c.repartition(par, "list_id", "__salt")
        .join(salted_q.repartition(par, "list_id", "__salt"), ["list_id", "__salt"])
        .select("query_id", "__qvec", "match_id", "__mvec")
    )
    return _ivf_rerank_topk(cands, k, exclude_self)


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
    cand = _with_buckets(df, id_col, vec_col, "id_a", num_tables, num_planes)
    other = _with_buckets(df, id_col, vec_col, "id_b", num_tables, num_planes)
    ids = (
        cand.join(other, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__avec"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__bvec"))
    return (
        ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("score", cosine(F.col("__avec"), F.col("__bvec")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def quantized_prefix_topk(
    emb: DataFrame,
    n_dims: int,
    k: int,
    rank_name: str = "rn",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 97,
    quant_bits: int = 10,
) -> DataFrame:
    """Exact top-k corpus neighbors per query over the first ``n_dims``
    embedding dims: queries are ``id % query_mod == 0``, the corpus is
    the rest, distances are integer-quantized squared L2 (deterministic
    ties on id). Returns (query_id, vec_id, <rank_name>).

    The SHARED ranker behind the truncated-dimension evaluation family
    (q219 recall, q227 RRF fusion, q231 RBO, q303 nDCG): the distance
    fold, tie-break, and quantization discipline are correctness-
    critical and live here exactly once. Plan shape: one
    crossJoin(broadcast-eligible query side) scan + per-query window
    top-k — the exact baseline whose candidate generator swaps for LSH/
    IVF at scale."""
    from stock_data_pipeline_spark.llm.clustering import _quantize

    q = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col), quant_bits).alias("qv")
    )
    c = emb.filter(F.col(id_col) % query_mod != 0).select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col), quant_bits).alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.slice("qv", 1, n_dims),
            F.slice("cv", 1, n_dims),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_d").asc(), F.col("vec_id").asc())
    return (
        q.crossJoin(c)
        .withColumn("_d", d2)
        .withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
        .select("query_id", "vec_id", rank_name)
    )
