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

from stock_data_pipeline_spark.llm.fanout import fanout_partitions
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
        .join(F.broadcast(cnt), "cid")  # k rows — never sort-merge this
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


def _lloyd_rounds(
    pts: DataFrame, k: int, rounds: int, train: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """``rounds`` unrolled Lloyd iterations over (vec_id, qv) points;
    init = the k lowest-id vectors. Returns ``(assigned, cents_used)``
    where ``cents_used`` is the centroid table the FINAL assignment
    scored against (what ADC distance tables must use). Same lazy
    unrolled-plan shape as :func:`kmeans_fixed`.

    ``train``: optional training subset (e.g. a cached deterministic
    sample). When given, the init and the ``rounds - 1`` centroid
    updates iterate over it ONLY — the full ``pts`` is touched exactly
    once, by the final assignment. This is how codebooks are trained at
    scale: Lloyd never needs the whole corpus, and re-reading 100 TB
    per round to refine k·m centroids is pure waste. With
    ``train=None`` the plan is identical to the historical full-data
    unroll."""
    t = train if train is not None else pts
    w = Window.orderBy("vec_id")
    cents = (
        t.orderBy("vec_id")
        .limit(k)
        .withColumn("__rn", F.row_number().over(w))
        .select(
            (F.col("__rn") - 1).cast("int").alias("cid"),
            F.transform("qv", lambda x: x.cast("double")).alias("cv"),
        )
    )
    for _ in range(rounds - 1):
        cents = _recompute(_assign(t, cents))
    return _assign(pts, cents), cents


def _train_sample(pts: DataFrame, train_mod: int | None) -> DataFrame | None:
    """Deterministic 1-in-``train_mod`` systematic training sample
    (``vec_id % train_mod == 0`` — portable to the SQL oracle, unlike an
    engine-specific hash), CACHED: the unrolled Lloyd rounds reference
    their input once per round, and caching the small sample turns those
    re-reads into in-memory scans instead of repeated source scans. At
    corpus scale this is the difference between one 100 TB pass (the
    final assignment) and ``rounds + 1`` of them. The cache entry is
    keyed by canonicalized plan, so repeated invocations reuse it
    rather than stacking duplicates; entries live until the session
    ends (the returned plan stays lazy, so there is no safe unpersist
    point inside the operator) — bounded at |table|/train_mod ×
    (sub_dim + 1) int64s per distinct (table, subspace) — ~40 KB per
    entry at sf0.1."""
    if train_mod is None:
        return None
    return pts.filter(F.col("vec_id") % train_mod == 0).cache()


def _subspace_pts(
    df: DataFrame, id_col: str, vec_col: str, s: int, sub_dim: int, quant_bits: int
) -> DataFrame:
    """Quantized slice of dims [s·sub_dim, (s+1)·sub_dim) as the point
    set for subspace ``s`` (1-based F.slice)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        _quantize(F.slice(F.col(vec_col), s * sub_dim + 1, sub_dim), quant_bits).alias(
            "qv"
        ),
    )


def pq_codes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    rounds: int = 2,
    quant_bits: int = 10,
    train_mod: int | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` contiguous subvectors, Lloyd-cluster each subspace
    independently (k codewords, ``rounds`` unrolled iterations,
    quantized exact-integer arithmetic — the q80 discipline), and emit
    each vector's code word per subspace plus the total quantization
    error Σ_s ‖x_s − c_{s,code_s}‖².

    Scale design: every subspace's codebook is k rows (broadcast); the
    corpus is scanned once per subspace with NO shuffle during
    assignment, and the only exchanges are the k·m-row centroid
    recomputes. The join of the m per-subspace assignments is on vec_id
    — co-partitioned after the first exchange. The m·k·sub_dim-float
    codebook replaces the full vector for downstream search: 64 dims of
    float32 compress to m=4 bytes per vector, the standard memory
    layout for billion-scale ANN.

    Determinism: identical to q80 — per-subspace init is the k
    lowest-id vectors, quantized int sums, one double division, fixed
    fold order for distances; the total error adds the m subspace terms
    in explicit subspace order."""
    joined = None
    err = None
    for s in range(m):
        pts = _subspace_pts(df, id_col, vec_col, s, sub_dim, quant_bits)
        assigned, _ = _lloyd_rounds(
            pts, k, rounds, train=_train_sample(pts, train_mod)
        )
        part = assigned.select(
            "vec_id",
            F.col("cid").cast("int").alias(f"code_{s}"),
            F.col("dist2").alias(f"_err_{s}"),
        )
        joined = part if joined is None else joined.join(part, "vec_id")
        term = F.col(f"_err_{s}")
        err = term if err is None else err + term
    return joined.select(
        "vec_id",
        *[f"code_{s}" for s in range(m)],
        err.alias("total_err"),
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 97,
    m: int = 4,
    sub_dim: int = 16,
    k: int = 4,
    rounds: int = 2,
    quant_bits: int = 10,
    topk: int = 10,
    train_mod: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Asymmetric-distance-computation top-k over PQ codes: queries
    (``id % query_mod == 0``) keep their raw (quantized) subvectors;
    the corpus is represented ONLY by its per-subspace code words.
    ADC(q, x) = Σ_s ‖q_s − c_{s,code_s(x)}‖² — each query computes an
    m×k distance table against the broadcast codebooks once, and
    scoring a corpus vector is m table lookups instead of a
    full-dimension dot product.

    Plan shape (r07 restructure): the per-query distance tables are
    |Q|·k rows per subspace (a crossJoin against the BROADCAST k-row
    codebook — queries never shuffle for table construction); the m
    per-subspace code assignments equi-join on vec_id into ONE N-row
    code table (co-partitioned — each assignment window already hashed
    on vec_id), which fans out to |Q|·N scored rows through a single
    broadcast join on code_0, then picks up the remaining m−1 subspace
    distances via 1:1 broadcast joins on (query_id, code_s). The ADC
    sum is plain left-to-right column addition from a 0.0 seed in
    subspace order — bit-identical to the historical sorted-struct
    fold, without materializing m·|Q|·N union rows or aggregating
    |Q|·N groups. Top-k is a (dist, vec_id) window per query.

    Fan-out guard: the code table is explicitly repartitioned to
    ``defaultParallelism`` partitions before the multiplying join.
    AQE sizes post-shuffle partitions by SHUFFLE BYTES and cannot see
    that the next join multiplies every row |Q|-fold — left alone it
    coalesces the small code exchange to one partition and the entire
    |Q|·N expansion plus the top-k window's map side runs in a single
    task (measured r07 at the 10× fixture: one 21 s task holding >half
    the query's wall). An explicit partition count is exempt from AQE
    coalescing, and cores-proportional (not bytes-proportional) is the
    right size for a CPU-bound fan-out stage at any corpus scale.

    This is the memory-bound scale path that pairs with q28's exact
    scan and q53's IVF: IVF prunes the candidate set, PQ-ADC makes
    scoring each candidate O(m) lookups on 4-byte codes.

    Contract (same as :func:`~stock_data_pipeline_spark.llm.similarity.
    ivf_flat_topk`): the QUERY side must be broadcastable — the per-
    subspace distance tables are |Q|·k rows each and the scoring joins
    pin ``F.broadcast`` on them deliberately. ``query_mod`` makes |Q|
    corpus-PROPORTIONAL (≈N/query_mod), so at billion-vector scale the
    tables outgrow the broadcast limit; a corpus-scale query batch
    needs the bucketed shape instead (see
    :func:`~stock_data_pipeline_spark.llm.similarity.
    ivf_flat_topk_bucketed` for the pattern: salt the join key, shuffle
    both sides, broadcast nothing).

    ``num_partitions`` overrides the fan-out guard's partition count
    (default 2×defaultParallelism via :func:`..fanout.fanout_partitions`;
    results are partition-count-invariant)."""
    codes = None
    dtabs: list[DataFrame] = []
    for s in range(m):
        pts = _subspace_pts(df, id_col, vec_col, s, sub_dim, quant_bits)
        assigned, cents = _lloyd_rounds(
            pts, k, rounds, train=_train_sample(pts, train_mod)
        )
        part = assigned.filter(F.col("vec_id") % query_mod != 0).select(
            "vec_id", F.col("cid").alias(f"code_{s}")
        )
        codes = part if codes is None else codes.join(part, "vec_id")
        queries = pts.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"), "qv"
        )
        # |Q|·k rows — BROADCAST at the scoring joins; letting those
        # compile to sort-merge would shuffle the whole corpus on a
        # k-valued key (16 distinct values: maximal skew, zero benefit)
        dtabs.append(
            queries.crossJoin(F.broadcast(cents)).select(
                "query_id",
                F.col("cid").alias(f"code_{s}"),
                _sq_dist(F.col("qv"), F.col("cv")).alias(f"d2_{s}"),
            )
        )
    # The guard key is COMPOSITE (vec_id, code_0) on purpose: the code
    # table's join output is already hashpartitioning(vec_id, N), so a
    # same-key same-count repartition is elided as redundant by the
    # planner — and the surviving ENSURE_REQUIREMENTS exchanges ARE
    # AQE-coalescible, which silently re-serializes the fan-out. A
    # different partitioning expression survives as REPARTITION_BY_NUM,
    # the one shuffle origin AQE never coalesces (verified in the
    # executed-plan string; pinned by tests/test_fanout_guard.py).
    par = fanout_partitions(df, num_partitions)
    expanded = codes.repartition(par, "vec_id", f"code_{0}").join(
        F.broadcast(dtabs[0]), f"code_{0}"
    )
    for s in range(1, m):
        expanded = expanded.join(F.broadcast(dtabs[s]), ["query_id", f"code_{s}"])
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.col(f"d2_{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        expanded.withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", "adc_dist", F.col("rank").cast("long").alias("rank"))
    )


def ivf_pq_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 97,
    n_lists: int = 8,
    nprobe: int = 2,
    m: int = 4,
    sub_dim: int = 16,
    k: int = 16,
    rounds: int = 2,
    quant_bits: int = 10,
    topk: int = 10,
    train_mod: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """The billion-scale ANN production composition: IVF coarse pruning
    + PQ asymmetric-distance scoring (IVF-PQ, Jégou et al. 2011 §V).

    1. A coarse quantizer (Lloyd over the FULL vector, ``n_lists``
       centroids) partitions the corpus into inverted lists — the same
       broadcast-assignment shape as q53's IVF.
    2. Each query probes its ``nprobe`` nearest coarse lists only; the
       candidate set is an equi-join on list id, so scoring work drops
       by ~n_lists/nprobe before any distance math happens.
    3. Candidates are scored by PQ-ADC (q194): per-query m×k distance
       tables against broadcast sub-codebooks, corpus side represented
       only by its byte codes.

    Scale shape: the corpus is scanned once for coarse assignment and
    once per subspace for codes (all broadcast joins, no shuffle of the
    corpus); the only |candidates|-proportional work is the final
    list-id equi-join + code lookups. At 10⁹ vectors with n_lists=2¹⁶
    and nprobe=32, ADC touches ~0.05% of the corpus per query.

    Determinism: both quantizers use the exact-integer Lloyd rounds
    (q80 discipline); the ADC fold adds subspace terms in sorted order;
    coarse-probe and final top-k ties break on (distance, id).

    Contract (r07 ADVICE): the QUERY side must be broadcastable — the
    probe table (|Q|·nprobe rows) and the m distance tables (|Q|·k rows
    each) all pin ``F.broadcast``, and ``query_mod`` makes |Q| grow
    linearly with the corpus (≈N/query_mod). At the docstring's
    billion-vector scale those broadcasts exceed the driver/broadcast
    limit; a corpus-scale query batch needs the bucketed shape
    (:func:`~stock_data_pipeline_spark.llm.similarity.
    ivf_flat_topk_bucketed`): salt the list id, shuffle-join both
    sides, broadcast nothing. ``num_partitions`` overrides the fan-out
    guard count (default 2×defaultParallelism; results are
    partition-count-invariant).
    """
    pts_full = df.select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col), quant_bits).alias("qv")
    )
    coarse_assigned, coarse_cents = _lloyd_rounds(
        pts_full, n_lists, rounds, train=_train_sample(pts_full, train_mod)
    )
    corpus_lists = coarse_assigned.filter(F.col("vec_id") % query_mod != 0).select(
        "vec_id", F.col("cid").alias("list_id")
    )
    queries_full = pts_full.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "qv"
    )
    wp = Window.partitionBy("query_id").orderBy(F.col("cd2").asc(), F.col("cid").asc())
    probed = (
        queries_full.crossJoin(F.broadcast(coarse_cents))
        .withColumn("cd2", _sq_dist(F.col("qv"), F.col("cv")))
        .withColumn("__pn", F.row_number().over(wp))
        .filter(F.col("__pn") <= nprobe)
        .select("query_id", F.col("cid").alias("list_id"))
    )
    # r07 restructure (same shape as pq_adc_topk): build ONE N-row
    # corpus table carrying list_id + all m code columns (every join on
    # vec_id — co-partitioned after the coarse assignment's exchange),
    # fan out ONCE through the broadcast probe table, then pick up the
    # m per-subspace distances via 1:1 broadcast joins. No m-way union,
    # no |cand|-group collect_list aggregation; the ADC sum is plain
    # left-to-right addition from a 0.0 seed in subspace order —
    # bit-identical to the historical sorted-struct fold. The explicit
    # ``defaultParallelism`` repartition before the probe join is the
    # fan-out guard: AQE sizes the corpus exchange by bytes and cannot
    # see the ~|Q|·nprobe/n_lists row multiplication behind the join.
    corpus_side = corpus_lists
    dtabs: list[DataFrame] = []
    for s in range(m):
        pts = _subspace_pts(df, id_col, vec_col, s, sub_dim, quant_bits)
        assigned, cents = _lloyd_rounds(
            pts, k, rounds, train=_train_sample(pts, train_mod)
        )
        corpus_side = corpus_side.join(
            assigned.select("vec_id", F.col("cid").alias(f"code_{s}")), "vec_id"
        )
        sub_queries = pts.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("query_id"), "qv"
        )
        dtabs.append(
            sub_queries.crossJoin(F.broadcast(cents)).select(
                "query_id",
                F.col("cid").alias(f"code_{s}"),
                _sq_dist(F.col("qv"), F.col("cv")).alias(f"d2_{s}"),
            )
        )
    # Composite guard key (see pq_adc_topk): a bare vec_id repartition
    # is elided against the upstream vec_id partitioning and the
    # remaining ENSURE_REQUIREMENTS exchange gets AQE-coalesced;
    # (vec_id, list_id) survives as non-coalescible REPARTITION_BY_NUM.
    par = fanout_partitions(df, num_partitions)
    expanded = corpus_side.repartition(par, "vec_id", "list_id").join(
        F.broadcast(probed), "list_id"
    )
    for s in range(m):
        expanded = expanded.join(F.broadcast(dtabs[s]), ["query_id", f"code_{s}"])
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.col(f"d2_{s}")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        expanded.withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "vec_id", "adc_dist", F.col("rank").cast("long").alias("rank"))
    )
