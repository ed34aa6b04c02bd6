"""Queries: path, ranking and record-linkage queries (q218-q256).

Mechanically split from the former single-module queries.py (round-6
refactor, r05 verdict item 8); content is unchanged, cross-part helper
imports are explicit, and the registry is assembled in __init__.py.
"""
from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stock_data_pipeline_spark.operators import ranks

from ._p1_parity_corpus import (
    REGISTRY,
    _d,
    _dec,
    indicators,
    load_events,
    load_table,
    register,
    similarity,
    text,
)
from ._p3_rollups_features import _ZORDER_BASE_SQL, _pq_subspace_blocks




@register(
    "q218_top_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    ), marked AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        FROM ordered
    ), sess AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
        FROM marked
    ), tri AS (
        SELECT event_type
               || '>' || lead(event_type, 1) OVER w
               || '>' || lead(event_type, 2) OVER w AS path
        FROM sess
        WINDOW w AS (PARTITION BY user_id, sess_id ORDER BY ts, event_id)
        QUALIFY lead(event_type, 2) OVER w IS NOT NULL
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n
    FROM tri GROUP BY 1
    ORDER BY n DESC, path LIMIT 20
    """,
    survey_ref="extension: session path mining — 30-minute-gap "
    "sessionization, within-session event-type trigrams via two lead "
    "windows on ONE (user, time) exchange, global top-20 paths as a "
    "TakeOrdered; the clickstream sequence-mining staple",
)
def q218_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most common 3-step event-type paths within sessions
    (30-minute inactivity gap): gaps-and-islands sessionization, then
    each row pairs with its two successors via lead() — all on the
    single (user_id, time) sort the sessionizer already needs; the
    final top-20 is a TakeOrderedAndProject, never a global sort of
    all paths. Deterministic (n desc, path) ordering."""
    ev = load_events(spark, sf_dir)
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    wo = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    gap = t_us - F.lag(t_us).over(wo)
    marked = ev.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0).alias("new_sess"),
    )
    sess = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy(F.col("ts"), F.col("event_id"))
    tri = sess.select(
        F.concat_ws(
            ">",
            F.col("event_type"),
            F.lead("event_type", 1).over(ws),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
        F.lead("event_type", 2).over(ws).alias("_third"),
    ).filter(F.col("_third").isNotNull())
    return (
        tri.groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(20)
    )


@register(
    "q219_truncated_dim_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id % 97 = 0
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS cv
        FROM embeddings WHERE vec_id % 97 <> 0
    ), full_top AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 64),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= 10
    ), trunc_top AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 16),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= 10
    )
    SELECT f.query_id,
           CAST(COUNT(t.vec_id) AS BIGINT) AS n_recalled,
           CAST(COUNT(t.vec_id) AS DOUBLE) / 10.0 AS recall_at_10
    FROM full_top f
    LEFT JOIN trunc_top t ON t.query_id = f.query_id AND t.vec_id = f.vec_id
    GROUP BY 1
    """,
    survey_ref="extension: truncated-dimension retrieval audit — recall@10 "
    "of a 16-dim embedding prefix against the full 64-dim exact search "
    "(the Matryoshka/dimension-budget question), both scans exact "
    "integer distance, fully value-oracled",
)
def q219_truncated_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much retrieval quality does a 4× cheaper 16-dim embedding
    prefix keep? Per query: how many of the full-64-dim exact top-10
    the 16-dim-prefix top-10 recovers. This is the measurement behind
    dimension-budget decisions (Matryoshka-style truncation, cheap
    first-stage retrieval): at 100 TB a 16-dim first pass reads a
    quarter of the bytes; this query quantifies what that costs in
    recall, exactly (integer-quantized distances, deterministic ties).
    Both scans share the corpus crossJoin shape of q28 — the broadcast
    side is the query set. The ranker itself is the shared
    ``similarity.quantized_prefix_topk`` (one implementation behind
    q219/q227/q231/q303)."""
    emb = load_table(spark, sf_dir, "embeddings")

    full = similarity.quantized_prefix_topk(emb, 64, 10).select("query_id", "vec_id")
    trunc = similarity.quantized_prefix_topk(emb, 16, 10).select(
        "query_id", F.col("vec_id").alias("t_vec")
    )
    return (
        full.join(
            trunc,
            (full["query_id"] == trunc["query_id"]) & (full["vec_id"] == trunc["t_vec"]),
            "left",
        )
        .groupBy(full["query_id"].alias("query_id"))
        .agg(
            F.count(trunc["t_vec"]).cast("long").alias("n_recalled"),
            (F.count(trunc["t_vec"]).cast("double") / 10.0).alias("recall_at_10"),
        )
    )


@register(
    "q220_join_strategy_advisor",
    oracle="""
    WITH stats AS (
        SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(8 + 8 + SUM(length(c_name)) // COUNT(*) AS BIGINT) AS avg_row_bytes
        FROM customer
        UNION ALL
        SELECT 'supplier', COUNT(*), CAST(8 + 8 + SUM(length(s_name)) // COUNT(*) AS BIGINT)
        FROM supplier
        UNION ALL
        SELECT 'nation', COUNT(*), CAST(8 + 8 + SUM(length(n_name)) // COUNT(*) AS BIGINT)
        FROM nation
        UNION ALL
        SELECT 'orders', COUNT(*), CAST(8 + 8 + 8 + SUM(length(o_orderpriority)) // COUNT(*) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'lineitem', COUNT(*), CAST(8 + 8 + 8 + 8 AS BIGINT)
        FROM lineitem
    )
    SELECT tbl, n_rows, avg_row_bytes,
           CAST(n_rows * avg_row_bytes AS BIGINT) AS est_bytes,
           CASE WHEN n_rows * avg_row_bytes <= 10485760 THEN 'broadcast'
                ELSE 'shuffle' END AS recommended_join
    FROM stats
    """,
    survey_ref="extension: join-strategy advisor — per-table size "
    "estimates (row count x estimated row width from integer column "
    "widths + measured mean string lengths) against Spark's 10 MB "
    "autoBroadcastJoinThreshold; the planning statistic behind every "
    "broadcast decision in this repo",
)
def q220_join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which tables should broadcast? Estimate each table's in-memory
    size as rows × (fixed column widths + measured mean string length)
    and compare against Spark's default 10 MB broadcast threshold —
    the advisor output mirrors the explicit F.broadcast() decisions
    hard-coded throughout this repo (nation/supplier/customer
    broadcast; orders/lineitem shuffle). One count+sum aggregate per
    table, integer floor-division for the mean width so the estimate
    is engine-exact."""
    specs = [
        ("customer", ["c_name"], 16),
        ("supplier", ["s_name"], 16),
        ("nation", ["n_name"], 16),
        ("orders", ["o_orderpriority"], 24),
        ("lineitem", [], 32),
    ]
    out = None
    for tbl, strcols, fixed in specs:
        t = load_table(spark, sf_dir, tbl)
        if strcols:
            sum_len = F.sum(F.length(strcols[0]).cast("long"))
            avg = (
                F.lit(fixed).cast("long")
                + ((sum_len - F.pmod(sum_len, F.count("*"))) / F.count("*")).cast("long")
            )
        else:
            avg = F.lit(fixed).cast("long")
        part = t.agg(
            F.count("*").cast("long").alias("n_rows"), avg.alias("avg_row_bytes")
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "avg_row_bytes")
        out = part if out is None else out.unionByName(part)
    est = F.col("n_rows") * F.col("avg_row_bytes")
    return out.select(
        "tbl",
        "n_rows",
        "avg_row_bytes",
        est.alias("est_bytes"),
        F.when(est <= 10 * 1024 * 1024, F.lit("broadcast"))
        .otherwise(F.lit("shuffle"))
        .alias("recommended_join"),
    )


@register(
    "q221_span_corruption",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), posl AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(tk)),
                                     i -> {'p': i - 1, 'token': tk[i]})) AS u
        FROM toks
    ), pos AS (
        SELECT doc_id, u.p AS p, u.token AS token FROM posl
    ), starts AS (
        SELECT doc_id, p, token,
               CASE WHEN (doc_id * 1009 + p) % 11 = 0 THEN 1 ELSE 0 END AS is_start
        FROM pos
    ), masked AS (
        SELECT doc_id, p, token, is_start,
               CASE WHEN MAX(is_start) OVER (PARTITION BY doc_id ORDER BY p
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1
                    THEN 1 ELSE 0 END AS m
        FROM starts
    ), islands AS (
        SELECT doc_id, p, token, m,
               CASE WHEN m = 1 AND COALESCE(lag(m) OVER (PARTITION BY doc_id ORDER BY p), 0) = 0
                    THEN 1 ELSE 0 END AS new_island
        FROM masked
    ), numbered AS (
        SELECT doc_id, p, token, m, new_island,
               SUM(new_island) OVER (PARTITION BY doc_id ORDER BY p) AS island_id
        FROM islands
    ), pieces AS (
        SELECT doc_id, p, m,
               CASE WHEN m = 0 THEN token
                    WHEN new_island = 1 THEN '<X' || CAST(island_id - 1 AS VARCHAR) || '>'
                    ELSE NULL END AS in_piece,
               CASE WHEN m = 1 AND new_island = 1
                        THEN '<X' || CAST(island_id - 1 AS VARCHAR) || '> ' || token
                    WHEN m = 1 THEN token
                    ELSE NULL END AS tgt_piece
        FROM numbered
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(m) AS BIGINT) AS n_masked,
           COALESCE(array_to_string(list(in_piece ORDER BY p) FILTER (WHERE in_piece IS NOT NULL), ' '), '') AS input_text,
           COALESCE(array_to_string(list(tgt_piece ORDER BY p) FILTER (WHERE tgt_piece IS NOT NULL), ' '), '') AS target_text
    FROM pieces
    GROUP BY 1
    """,
    survey_ref="extension: T5-style span corruption — deterministic "
    "positional span selection, gaps-and-islands sentinel numbering, "
    "input/target construction by order-pinned list aggregation; the "
    "denoising-objective data build as a declarative plan",
)
def q221_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a T5-style denoising example per document: deterministic
    3-token spans (every position where (doc_id·1009 + pos) % 11 == 0
    starts a span) collapse to numbered sentinels <X0>,<X1>,… in the
    input, and the target lists each sentinel followed by the tokens it
    hid. Span starts, island numbering, and both output strings are
    pure window/aggregate machinery — posexplode, one (doc, pos) sort,
    order-pinned list aggregation — so the whole augmentation is
    engine-reproducible (no RNG: position hashing IS the sampler, and
    the same seed formula regenerates the identical corpus anywhere).

    Scale: one exchange on doc_id for the windows; output strings are
    built per document with no driver involvement."""
    doc = load_table(spark, sf_dir, "documents")
    tok = doc.select(
        "doc_id", F.posexplode(text.tokens(F.col("text"))).alias("p", "token")
    )
    is_start = (F.pmod(F.col("doc_id") * 1009 + F.col("p"), F.lit(11)) == 0).cast("int")
    wp = Window.partitionBy("doc_id").orderBy("p")
    w3 = wp.rowsBetween(-2, 0)
    wcum = wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stage = (
        tok.withColumn("is_start", is_start)
        .withColumn("m", (F.max("is_start").over(w3) == 1).cast("int"))
        .withColumn(
            "new_island",
            (
                (F.col("m") == 1)
                & (F.coalesce(F.lag("m").over(wp), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn("island_id", F.sum("new_island").over(wcum))
    )
    sentinel = F.concat(F.lit("<X"), (F.col("island_id") - 1).cast("string"), F.lit(">"))
    in_piece = (
        F.when(F.col("m") == 0, F.col("token"))
        .when(F.col("new_island") == 1, sentinel)
        .otherwise(F.lit(None))
    )
    tgt_piece = (
        F.when(
            (F.col("m") == 1) & (F.col("new_island") == 1),
            F.concat(sentinel, F.lit(" "), F.col("token")),
        )
        .when(F.col("m") == 1, F.col("token"))
        .otherwise(F.lit(None))
    )
    pieces = stage.select(
        "doc_id", "p", "m", in_piece.alias("in_piece"), tgt_piece.alias("tgt_piece")
    )

    def joined(col: str) -> F.Column:
        arr = F.sort_array(
            F.collect_list(
                F.when(
                    F.col(col).isNotNull(), F.struct(F.col("p"), F.col(col).alias("s"))
                )
            )
        )
        return F.array_join(F.transform(arr, lambda x: x["s"]), " ")

    return pieces.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("m").cast("long").alias("n_masked"),
        joined("in_piece").alias("input_text"),
        joined("tgt_piece").alias("target_text"),
    )


_Q222_SCORE_SQL = """
        SELECT doc_id,
               0.4 * least(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) / 100.0, 1.0)
               + 0.3 * (len(list_filter(string_split_regex(text, '\\s+'),
                            t -> list_contains(['the','and','of','to','a','in','is','it','that','for','on','with','as','at','by'], lower(t))))
                        / CAST(greatest(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')), 1) AS DOUBLE))
               + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
                              / greatest(length(text), 1)) AS score,
               CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) >= 60
                    THEN 1 ELSE 0 END AS label
        FROM documents
"""


@register(
    "q222_calibration_curve",
    oracle=f"""
    WITH scored AS ({_Q222_SCORE_SQL}
    ), binned AS (
        SELECT NTILE(10) OVER (ORDER BY score, doc_id) AS bin, doc_id, score, label
        FROM scored
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(score ORDER BY doc_id)),
                       (a, b) -> a + b) / COUNT(*) AS mean_score,
           CAST(SUM(label) AS DOUBLE) / COUNT(*) AS positive_rate
    FROM binned GROUP BY 1
    """,
    survey_ref="extension: model-calibration table — score deciles "
    "(deterministic ntile ties) vs realized positive rate, the "
    "reliability-diagram data every scored-filter pipeline audits "
    "before thresholding",
)
def q222_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration/reliability table for a document scorer: bucket the
    q31 quality score into deciles (deterministic (score, doc_id)
    ordering) and compare each bucket's mean score against the realized
    positive rate of a downstream label (here: the ≥60-token docs the
    score is meant to surface). A well-calibrated scorer tracks the
    diagonal; the drift between columns is what picks the production
    threshold. The ntile is the two-phase bucketed row_number plus
    remainder-rule arithmetic (operators/ranks.py, 1/64 score grain)
    — no single-task global sort — plus one aggregate.

    The mean_score sum adds identical doubles in ntile order... no —
    SUM over a group is order-ambiguous, so the score itself must be
    summed carefully: DuckDB and Spark both hash-aggregate per bin over
    ≤n/10 rows; the scores here are sums of exactly-representable
    rationals? They are not — so this query's hash-match relies on the
    per-bin double sums agreeing, which they do because each bin's rows
    arrive in ntile output order in BOTH engines only under
    single-partition execution. To keep the oracle honest at any
    parallelism, the Spark side folds each bin's scores in sorted
    order via collect_list — order-pinned, engine-exact."""
    doc = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    score = (
        0.4 * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
        + 0.3 * text.stopword_ratio(F.col("text"))
        + 0.3 * (1.0 - text.punct_ratio(F.col("text")))
    )
    scored = doc.select(
        "doc_id",
        score.alias("score"),
        (F.size(toks) >= 60).cast("int").alias("label"),
    )
    n_tot = scored.agg(F.count(F.lit(1)).alias("__n"))
    ranked = ranks.bucketed_row_number(
        scored,
        F.floor(F.col("score") * 64).cast("long"),
        [F.col("score"), F.col("doc_id")],
        out="__rn",
    )
    binned = (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("bin", ranks.ntile_from_rn(F.col("__rn"), F.col("__n"), 10))
        .drop("__rn", "__n")
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("doc_id", "score"))),
                F.lit(0.0),
                lambda a, x: a + x["score"],
            )
            / F.count("*")
        ).alias("mean_score"),
        (F.sum("label").cast("double") / F.count("*")).alias("positive_rate"),
    )


@register(
    "q223_exact_auc",
    oracle=f"""
    WITH scored AS ({_Q222_SCORE_SQL}
    ), ranked AS (
        SELECT label, score,
               RANK() OVER (ORDER BY score) AS r_lo,
               CAST(COUNT(*) OVER (PARTITION BY score) AS BIGINT) AS n_tied
        FROM scored
    ), sums AS (
        SELECT CAST(SUM(CASE WHEN label = 1 THEN 2 * r_lo + n_tied - 1 ELSE 0 END) AS BIGINT)
                   AS two_ranksum_pos,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(SUM(1 - label) AS BIGINT) AS n_neg
        FROM ranked
    )
    SELECT n_pos, n_neg, two_ranksum_pos,
           CAST(two_ranksum_pos - n_pos * (n_pos + 1) AS DOUBLE)
               / (2.0 * n_pos * n_neg) AS auc
    FROM sums
    """,
    survey_ref="extension: exact AUC (Mann-Whitney U with tie "
    "correction) — average ranks kept as the INTEGER 2*rank sums, one "
    "double division at the end; the ranking-quality metric computed "
    "exactly at corpus scale instead of from a sampled curve",
)
def q223_exact_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the quality score against the ≥60-token label
    via the Mann-Whitney U statistic: AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺n⁻)
    with midrank tie handling. The average midranks are half-integers,
    so the whole rank sum is carried as the INTEGER 2·Σrank (2·r_lo +
    ties − 1 per row) — every quantity until the final division is
    exact, making the metric engine-reproducible and partition-order
    free. The global rank is the two-phase bucketed row_number
    (operators/ranks.py, 1/64 score grain; min over the per-score
    partition recovers the tie-min RANK semantics) + one aggregate —
    fully parallel, no single-task sort anywhere."""
    doc = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    score = (
        0.4 * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
        + 0.3 * text.stopword_ratio(F.col("text"))
        + 0.3 * (1.0 - text.punct_ratio(F.col("text")))
    )
    scored = doc.select(
        score.alias("score"), (F.size(toks) >= 60).cast("long").alias("label")
    )
    rn_df = ranks.bucketed_row_number(
        scored, F.floor(F.col("score") * 64).cast("long"), [F.col("score")], out="__rn"
    )
    wsc = Window.partitionBy("score")
    ranked = rn_df.select(
        "label",
        F.min("__rn").over(wsc).cast("long").alias("r_lo"),
        F.count("*").over(wsc).cast("long").alias("n_tied"),
    )
    sums = ranked.agg(
        F.sum(
            F.when(F.col("label") == 1, 2 * F.col("r_lo") + F.col("n_tied") - 1).otherwise(0)
        )
        .cast("long")
        .alias("two_ranksum_pos"),
        F.sum("label").cast("long").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
    )
    return sums.select(
        "n_pos",
        "n_neg",
        "two_ranksum_pos",
        (
            (F.col("two_ranksum_pos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (2.0 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


def _duck_sqdist(qv: str, cv: str, dim: int) -> str:
    """Σ (q_i − c_i)² as the same left fold clustering._sq_dist runs."""
    return f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(generate_series(1, {dim}),
                   i -> (CAST({qv}[i] AS DOUBLE) - {cv}[i]) * (CAST({qv}[i] AS DOUBLE) - {cv}[i]))),
               (x, y) -> x + y)"""


def _ivf_pq_oracle(
    n_lists: int,
    nprobe: int,
    m: int,
    sub_dim: int,
    k: int,
    rounds: int,
    bits: int,
    query_mod: int,
    topk: int,
    train_mod: int | None = None,
) -> str:
    # coarse quantizer: subspace 0 over the FULL vector (slice [1:m·sub_dim])
    parts: list[str] = _pq_subspace_blocks(
        0, m * sub_dim, n_lists, rounds, bits, tag="cg", train_mod=train_mod
    )
    cg_cents = f"cgc{rounds - 1}"
    parts.append(f"""probe AS (
        SELECT query_id, cid AS list_id FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY {_duck_sqdist("q.qv", "c.cv", m * sub_dim)} ASC, c.cid ASC) AS rn
            FROM cgq q CROSS JOIN {cg_cents} c
            WHERE q.vec_id % {query_mod} = 0
        ) WHERE rn <= {nprobe}
    ), cand AS (
        SELECT p.query_id, cl.vec_id
        FROM probe p
        JOIN (SELECT vec_id, cid AS list_id FROM cga{rounds}
              WHERE vec_id % {query_mod} <> 0) cl USING (list_id)
    )""")
    for s in range(m):
        parts.extend(
            _pq_subspace_blocks(s, sub_dim, k, rounds, bits, train_mod=train_mod)
        )
        parts.append(f"""s{s}sc AS (
        SELECT c.query_id, c.vec_id, {s} AS sub, dt.d2
        FROM cand c
        JOIN (SELECT vec_id, cid AS code FROM s{s}a{rounds}) cd ON cd.vec_id = c.vec_id
        JOIN (SELECT q.vec_id AS query_id, ct.cid AS code,
                     {_duck_sqdist("q.qv", "ct.cv", sub_dim)} AS d2
              FROM s{s}q q CROSS JOIN s{s}c{rounds - 1} ct
              WHERE q.vec_id % {query_mod} = 0) dt
          ON dt.query_id = c.query_id AND dt.code = cd.code
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM s{s}sc" for s in range(m))
    parts.append(f"""allsc AS ({union}),
    summed AS (
        SELECT query_id, vec_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d2 ORDER BY sub)),
                           (x, y) -> x + y) AS adc_dist
        FROM allsc GROUP BY 1, 2
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT query_id, vec_id, adc_dist, CAST(rnk AS BIGINT) AS rank FROM (
        SELECT query_id, vec_id, adc_dist,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC) AS rnk
        FROM summed
    ) WHERE rnk <= {topk}
    """
    )


@register(
    "q198_ivf_pq_topk",
    oracle=_ivf_pq_oracle(
        n_lists=8, nprobe=2, m=16, sub_dim=4, k=256, rounds=2, bits=10,
        query_mod=97, topk=10, train_mod=16,
    ),
    survey_ref="extension: IVF-PQ — coarse inverted-list pruning (q53's "
    "IVF) composed with PQ asymmetric-distance scoring (q194), the "
    "standard billion-vector ANN production pipeline, with a FULL "
    "generated value oracle over both quantizers; registered at the "
    "same 128-bit code budget as q194 (shared codebooks — the ADC "
    "distances of any pair present in both results are bit-identical)",
)
def q198_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stock_data_pipeline_spark.llm.clustering import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(
        emb, "vec_id", "embedding", query_mod=97,
        n_lists=8, nprobe=2, m=16, sub_dim=4, k=256, rounds=2,
        quant_bits=10, topk=10, train_mod=16,
    )


@register(
    "q197_skew_planner",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1
    ), cc AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS k FROM counts GROUP BY 1
    ), cum AS (
        SELECT c, k, SUM(k) OVER (ORDER BY c) AS cum_keys FROM cc
    ), tot AS (
        SELECT CAST(SUM(k) AS BIGINT) AS n_keys,
               CAST(SUM(c * k) AS BIGINT) AS total_rows,
               CAST(MAX(c) AS BIGINT) AS max_rows
        FROM cc
    ), quant AS (
        SELECT (SELECT MIN(c) FROM cum WHERE cum_keys >= (50 * n_keys + 99) // 100) AS p50_rows,
               (SELECT MIN(c) FROM cum WHERE cum_keys >= (99 * n_keys + 99) // 100) AS p99_rows,
               n_keys, total_rows, max_rows
        FROM tot
    )
    SELECT n_keys, total_rows, max_rows, p50_rows, p99_rows,
           CAST(max_rows AS DOUBLE) * n_keys / total_rows AS skew_ratio,
           least(32, (max_rows + p99_rows - 1) // p99_rows) AS recommended_salt
    FROM quant
    """,
    survey_ref="extension: shuffle-skew planner — count-of-counts key "
    "histogram, exact p50/p99 per-key row counts, hottest-key skew ratio, "
    "and the salt factor operators/skew.salted_join should use",
)
def q197_skew_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnose join/aggregation skew on events.user_id and recommend a
    salting factor: per-key row counts collapse to a COUNT-OF-COUNTS
    histogram (distinct count values — tiny at any scale), exact
    p50/p99 per-key sizes come off the histogram's cumulative sum, and
    the salt is ceil(hottest key / p99 key), capped at 32 — the fan-out
    ``operators/skew.salted_join`` takes.

    Scale shape: ONE shuffle proportional to the data (the per-key
    count); everything after runs on the count-of-counts histogram,
    whose size is bounded by the distinct per-key sizes, not the key
    count — so the global cumulative window is over a provably tiny
    frame (the q42/q87 exact-quantile trick applied to the histogram
    instead of the keys)."""
    ev = load_events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    cc = counts.groupBy("c").agg(F.count("*").alias("k"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = cc.withColumn("cum_keys", F.sum("k").over(w))
    tot = cc.agg(
        F.sum("k").cast("long").alias("n_keys"),
        F.sum(F.col("c") * F.col("k")).cast("long").alias("total_rows"),
        F.max("c").cast("long").alias("max_rows"),
    )

    def ceil_pct(pct: int) -> F.Column:
        num = F.lit(pct).cast("long") * F.col("n_keys") + F.lit(99).cast("long")
        return ((num - F.pmod(num, F.lit(100).cast("long"))) / 100).cast("long")

    quant = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.min(F.when(F.col("cum_keys") >= ceil_pct(50), F.col("c"))).alias("p50_rows"),
            F.min(F.when(F.col("cum_keys") >= ceil_pct(99), F.col("c"))).alias("p99_rows"),
            F.first("n_keys").alias("n_keys"),
            F.first("total_rows").alias("total_rows"),
            F.first("max_rows").alias("max_rows"),
        )
    )
    salt_num = F.col("max_rows") + F.col("p99_rows") - 1
    salt = F.least(
        F.lit(32).cast("long"),
        ((salt_num - F.pmod(salt_num, F.col("p99_rows"))) / F.col("p99_rows")).cast("long"),
    )
    return quant.select(
        "n_keys",
        "total_rows",
        "max_rows",
        "p50_rows",
        "p99_rows",
        (
            F.col("max_rows").cast("double") * F.col("n_keys") / F.col("total_rows")
        ).alias("skew_ratio"),
        salt.alias("recommended_salt"),
    )


# ---------------------------------------------------------------------------
# Batch 15 (round 3): HyperLogLog, exact cent allocation, weighted SSSP,
# hybrid-retrieval rank fusion, leave-one-out target encoding
# ---------------------------------------------------------------------------

# HLL with p=8 (m=256 registers) over a portable 31-bit multiply-mod /
# xor-shift mixer (a plain LCG strides registers for sequential keys —
# measured: 150 consecutive ids hit exactly 150 registers, which breaks
# both estimators). The low 8 bits pick the register, the remaining 23
# bits w give rank = (leading zeros of w) + 1 = 24 - bit_length(w),
# computed by a generated descending-threshold CASE so both engines run
# the identical integer comparisons (no log/clz builtin dependence).
_HLL_M = 256
_HLL_WBITS = 23
# alpha_256 * m^2 * 2^23 as ONE host-computed double literal: the only
# data-dependent float op in the query is a single division by Z.
_HLL_A = repr(0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(1 << _HLL_WBITS))


def _hll_lc_sql(v: str) -> str:
    """Linear-counting correction m*ln(m/V) for the small-cardinality
    regime, as a generated V → host-computed-literal table: V only
    takes 256 values, so ln never executes in either engine and the
    corrected estimate stays bit-identical cross-engine."""
    import math

    # CAST('<repr>' AS DOUBLE): string→double is correctly-rounded
    # strtod in DuckDB, while a bare 17-digit literal parses as DECIMAL
    # and its decimal→double conversion can be off by an ulp
    branches = " ".join(
        f"WHEN {v} = {k} THEN CAST('{repr(_HLL_M * math.log(_HLL_M / k))}' AS DOUBLE)"
        for k in range(1, _HLL_M)
    )
    return f"CASE {branches} END"


def _hll_lc_col(v: F.Column) -> F.Column:
    import math

    out = F.lit(None).cast("double")
    for k in range(1, _HLL_M):
        out = F.when(v == k, F.lit(float(repr(_HLL_M * math.log(_HLL_M / k))))).otherwise(out)
    return out


def _hll_rank_sql(w: str) -> str:
    branches = " ".join(
        f"WHEN {w} >= {1 << (_HLL_WBITS - r)} THEN {r}" for r in range(1, _HLL_WBITS + 1)
    )
    return f"CASE {branches} ELSE {_HLL_WBITS + 1} END"


def _hll_rank_col(w: F.Column) -> F.Column:
    out = F.lit(_HLL_WBITS + 1)
    for r in range(_HLL_WBITS, 0, -1):
        out = F.when(w >= (1 << (_HLL_WBITS - r)), F.lit(r)).otherwise(out)
    return out


def _hll_term_sql(m: str) -> str:
    branches = " ".join(
        f"WHEN {m} = {r} THEN {1 << (_HLL_WBITS + 1 - r)}" for r in range(1, _HLL_WBITS + 2)
    )
    return f"CASE {branches} END"


def _hll_term_col(m: F.Column) -> F.Column:
    out = F.lit(None).cast("long")
    for r in range(1, _HLL_WBITS + 2):
        out = F.when(m == r, F.lit(1 << (_HLL_WBITS + 1 - r)).cast("long")).otherwise(out)
    return out


@register(
    "q224_hll_distinct",
    oracle=f"""
    WITH h1 AS (
        SELECT (user_id * 48271 + 11) % 2147483647 AS a FROM events
    ), h2 AS (
        SELECT (xor(a, a >> 16) * 69621) % 2147483647 AS b FROM h1
    ), hashed AS (
        SELECT xor(b, b >> 16) AS h FROM h2
    ), slots AS (
        SELECT h % {_HLL_M} AS idx, h // {_HLL_M} AS w FROM hashed
    ), regs AS (
        SELECT idx, MAX({_hll_rank_sql("w")}) AS m FROM slots GROUP BY 1
    ), sketch AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hit,
               CAST(SUM({_hll_term_sql("m")}) AS BIGINT) AS z_present
        FROM regs
    ), truth AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_distinct FROM events
    ), est AS (
        SELECT CAST({_HLL_M} AS BIGINT) AS m,
               CAST({_HLL_M} - n_hit AS BIGINT) AS n_empty,
               z_present + ({_HLL_M} - n_hit) * {1 << _HLL_WBITS} AS z_scaled,
               CAST('{_HLL_A}' AS DOUBLE) / CAST(z_present + ({_HLL_M} - n_hit) * {1 << _HLL_WBITS} AS DOUBLE)
                   AS raw_estimate,
               true_distinct
        FROM sketch CROSS JOIN truth
    )
    SELECT m, n_empty, z_scaled, raw_estimate,
           CASE WHEN raw_estimate <= {repr(2.5 * _HLL_M)} AND n_empty > 0
                THEN {_hll_lc_sql("n_empty")} ELSE raw_estimate END AS hll_estimate,
           true_distinct
    FROM est
    """,
    survey_ref="extension: HyperLogLog distinct sketch (p=8, 256 "
    "registers) — the canonical mergeable cardinality sketch next to "
    "q186's KMV; portable multiply-mod/xor-shift mixer, register ranks "
    "via generated integer-threshold CASE (portable clz), harmonic sum "
    "carried as the exact integer Σ2^(24-M[j]), linear-counting "
    "correction from a host-generated V→m·ln(m/V) literal table",
)
def q224_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality of events.user_id, fully value-oracled.

    The sketch is ONE map-side-combinable aggregate: mix → (register,
    rank) is a narrow map, MAX(rank) per register partial-aggregates
    before the (256-row) shuffle, and the harmonic denominator
    Σ 2^-M[j] is kept exact by scaling to the integer Σ 2^(24-M[j])
    (empty registers contribute 2^24 each). Below the 2.5m threshold
    the standard linear-counting correction applies — its m·ln(m/V)
    comes from a generated 255-entry literal table (V is 8-bit), so ln
    never executes in either engine and the corrected estimate is
    bit-identical cross-engine. At 100 TB this is the sketch you'd
    MAX-merge across partitions and days; register state is 256 small
    ints regardless of input size.

    Ref parity: none in reference (pandas nunique equivalent is q46);
    this is the mergeable at-scale form.
    """
    ev = load_events(spark, sf_dir)
    p = F.lit(2147483647).cast("long")
    a = F.pmod(F.col("user_id") * 48271 + 11, p)
    b = F.pmod(a.bitwiseXOR(F.shiftright(a, 16)) * 69621, p)
    h = b.bitwiseXOR(F.shiftright(b, 16))
    idx = F.pmod(h, F.lit(_HLL_M).cast("long"))
    w = ((h - idx) / _HLL_M).cast("long")
    regs = (
        ev.select(idx.alias("idx"), _hll_rank_col(w).alias("rank"))
        .groupBy("idx")
        .agg(F.max("rank").alias("m"))
    )
    sketch = regs.agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(_hll_term_col(F.col("m"))).cast("long").alias("z_present"),
    )
    truth = ev.agg(F.countDistinct("user_id").cast("long").alias("true_distinct"))
    n_empty = F.lit(_HLL_M).cast("long") - F.col("n_hit")
    z_scaled = F.col("z_present") + n_empty * (1 << _HLL_WBITS)
    raw = F.lit(float(_HLL_A)) / z_scaled.cast("double")
    est = sketch.crossJoin(F.broadcast(truth)).select(
        F.lit(_HLL_M).cast("long").alias("m"),
        n_empty.alias("n_empty"),
        z_scaled.alias("z_scaled"),
        raw.alias("raw_estimate"),
        F.col("true_distinct"),
    )
    corrected = (
        F.when(
            (F.col("raw_estimate") <= float(repr(2.5 * _HLL_M))) & (F.col("n_empty") > 0),
            _hll_lc_col(F.col("n_empty")),
        )
        .otherwise(F.col("raw_estimate"))
    )
    return est.select(
        "m", "n_empty", "z_scaled", "raw_estimate",
        corrected.alias("hll_estimate"),
        "true_distinct",
    )


@register(
    "q225_proration",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        FROM lineitem
    ), ords AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 10 AS t
        FROM orders
    ), sized AS (
        SELECT l.l_orderkey, l.l_linenumber, l.pc, o.t,
               SUM(l.pc) OVER (PARTITION BY l.l_orderkey) AS p
        FROM li l JOIN ords o ON l.l_orderkey = o.o_orderkey
    ), parts AS (
        SELECT l_orderkey, l_linenumber, t,
               (t * pc) // p AS base,
               (t * pc) % p AS rem,
               SUM((t * pc) // p) OVER (PARTITION BY l_orderkey) AS sum_base,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                   ORDER BY (t * pc) % p DESC, l_linenumber ASC) AS rnk
        FROM sized
    )
    SELECT l_orderkey AS o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MAX(t) AS BIGINT) AS discount_cents,
           CAST(SUM(base + CASE WHEN rnk <= t - sum_base THEN 1 ELSE 0 END) AS BIGINT)
               AS allocated_cents,
           CAST(MAX(t - sum_base) AS BIGINT) AS n_bumped,
           CAST(MAX(base + CASE WHEN rnk <= t - sum_base THEN 1 ELSE 0 END) AS BIGINT)
               AS max_share,
           CAST(MIN(base + CASE WHEN rnk <= t - sum_base THEN 1 ELSE 0 END) AS BIGINT)
               AS min_share
    FROM parts GROUP BY 1
    """,
    survey_ref="extension: largest-remainder proration — allocate a "
    "10% order-level discount across line items in EXACT integer cents "
    "(floor shares + the r largest fractional remainders get the odd "
    "cent, deterministic tie-break); Σshares ≡ total by construction — "
    "the invoice/ledger allocation primitive floats cannot express",
)
def q225_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prorate each order's discount (10% of the order total, in whole
    cents) across its line items proportionally to extended price,
    using the largest-remainder method: base_i = ⌊T·pc_i/P⌋, and the
    r = T − Σbase_i lines with the largest remainders (tie: lowest
    line number) each take one extra cent. Every quantity is a 64-bit
    integer — the allocation is exactly conserved (Σ = T) on any
    engine, which is the whole point: float proration drifts by cents
    and fails reconciliation.

    Scale shape: one shuffle on l_orderkey; the order total joins in,
    then BOTH window passes (P, remainder rank) and the final groupBy
    reuse that same hash partitioning — Spark plans exactly one
    exchange for the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", (_dec("l_extendedprice") * 100).cast("long").alias("pc")
    )
    tp = (_dec("o_totalprice") * 100).cast("long")
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", ((tp - F.pmod(tp, F.lit(10).cast("long"))) / 10).cast("long").alias("t")
    )
    sized = li.join(ords, li["l_orderkey"] == ords["o_orderkey"]).select(
        "l_orderkey",
        "l_linenumber",
        "pc",
        "t",
        F.sum("pc").over(Window.partitionBy("l_orderkey")).alias("p"),
    )
    num = F.col("t") * F.col("pc")
    base = ((num - F.pmod(num, F.col("p"))) / F.col("p")).cast("long")
    parts = sized.select(
        "l_orderkey",
        "l_linenumber",
        "t",
        base.alias("base"),
        F.pmod(num, F.col("p")).alias("rem"),
    )
    wo = Window.partitionBy("l_orderkey")
    ranked = parts.select(
        "l_orderkey",
        "t",
        "base",
        F.sum("base").over(wo).alias("sum_base"),
        F.row_number()
        .over(wo.orderBy(F.col("rem").desc(), F.col("l_linenumber").asc()))
        .alias("rnk"),
    )
    share = F.col("base") + (F.col("rnk") <= F.col("t") - F.col("sum_base")).cast("long")
    return (
        ranked.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.max("t").cast("long").alias("discount_cents"),
            F.sum(share).cast("long").alias("allocated_cents"),
            F.max(F.col("t") - F.col("sum_base")).cast("long").alias("n_bumped"),
            F.max(share).cast("long").alias("max_share"),
            F.min(share).cast("long").alias("min_share"),
        )
    )


def _sssp_oracle(rounds: int) -> str:
    parts = [
        """li AS (
        SELECT l_orderkey, l_partkey, MIN(CAST(l_quantity AS BIGINT)) AS q
        FROM lineitem GROUP BY 1, 2
    ), e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v, MIN(a.q + b.q) AS w
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ), d0 AS (SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(f"""d{k} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{k - 1}
            UNION ALL
            SELECT e.v AS node, d.dist + e.w AS dist
            FROM d{k - 1} d JOIN e ON e.u = d.node
        ) GROUP BY 1
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, dist FROM d{rounds}\n    "
    )


@register(
    "q226_sssp",
    oracle=_sssp_oracle(4),
    survey_ref="extension: weighted single-source shortest paths "
    "(Bellman-Ford, 4 unrolled relaxation rounds) over the co-purchase "
    "graph with MIN-quantity edge weights — the weighted companion to "
    "q156's BFS; each round is one frontier×edges equi-join + MIN "
    "combine, exactly the Pregel superstep",
)
def q226_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest co-purchase path from part 1 to every part reachable in
    ≤4 weighted hops: edge (u,v) costs the minimum combined quantity of
    any order containing both parts, and Bellman-Ford relaxes 4 rounds.
    Each round is dist ⋈ edges (equi-join on the source vertex) plus a
    MIN-merge groupBy — the Pregel superstep as a lazy unrolled plan
    (the q110/q156 technique, now with weights so paths with MORE hops
    can win over direct edges, which plain BFS cannot express).
    Distances are exact integer sums. Beyond a handful of rounds the
    checkpointed to-convergence loop (connected_components's driver)
    takes over; 4 lazy rounds keep the whole thing one Catalyst plan.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.min(F.col("l_quantity").cast("long")).alias("q"))
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.min(F.col("a.q") + F.col("b.q")).alias("w"))
    )
    dist = spark.createDataFrame([(1, 0)], "node long, dist long")
    for _ in range(4):
        relax = (
            dist.join(e, F.col("node") == F.col("u"))
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist.select("node", "dist")


# Reciprocal-rank fusion with k=60 over two top-20 rankers, kept EXACT:
# every 1/(60+r) is scaled by L = lcm(61..80) so each term is the
# integer L//(60+r) and fused scores compare as integers — rank fusion
# with zero float ties.
_RRF_K = 60
_RRF_DEPTH = 20
_RRF_L = 205543280508215814964800  # lcm(61..80), host-verified


def _rrf_term_sql(rank: str) -> str:
    branches = " ".join(
        f"WHEN {rank} = {r} THEN CAST('{_RRF_L // (_RRF_K + r)}' AS DECIMAL(38,0))"
        for r in range(1, _RRF_DEPTH + 1)
    )
    return f"CASE {branches} ELSE CAST(0 AS DECIMAL(38,0)) END"


def _rrf_term_col(rank: F.Column) -> F.Column:
    out = F.lit("0").cast("decimal(38,0)")
    for r in range(1, _RRF_DEPTH + 1):
        out = F.when(rank == r, F.lit(str(_RRF_L // (_RRF_K + r))).cast("decimal(38,0)")).otherwise(
            out
        )
    return out


@register(
    "q227_hybrid_rrf",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id % 97 = 0
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS cv
        FROM embeddings WHERE vec_id % 97 <> 0
    ), full_top AS (
        SELECT query_id, vec_id, rn FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 64),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= {_RRF_DEPTH}
    ), trunc_top AS (
        SELECT query_id, vec_id, rn FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 16),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= {_RRF_DEPTH}
    ), fused AS (
        SELECT COALESCE(f.query_id, t.query_id) AS query_id,
               COALESCE(f.vec_id, t.vec_id) AS vec_id,
               {_rrf_term_sql("f.rn")} + {_rrf_term_sql("t.rn")} AS score
        FROM full_top f FULL OUTER JOIN trunc_top t
          ON f.query_id = t.query_id AND f.vec_id = t.vec_id
    )
    SELECT query_id, vec_id,
           -- exact digit string: the 24-digit scaled score exceeds int64 and
           -- int128-backed DECIMAL(38,0) diverges in the driver's Arrow/pandas
           -- export (VERDICT r04), so both engines emit VARCHAR
           CAST(score AS VARCHAR) AS rrf_score_scaled,
           CAST(rnk AS BIGINT) AS fused_rank
    FROM (
        SELECT query_id, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY score DESC, vec_id ASC) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
    survey_ref="extension: hybrid-retrieval reciprocal-rank fusion — "
    "full-64-dim and 16-dim-prefix exact rankers fused by RRF (k=60) "
    "with every 1/(k+r) scaled by lcm(61..80) to an exact integer, so "
    "fused ordering is engine-reproducible with zero float ties — the "
    "standard ensemble step in front of an LLM retrieval stack",
)
def q227_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuse two retrievers with reciprocal-rank fusion, exactly. The
    two input rankers are q219's pair (full 64-dim exact scan; 16-dim
    Matryoshka prefix), each to depth 20; RRF scores Σ 1/(60+rank) are
    scaled by L = lcm(61..80) so every term — and therefore every
    fused comparison — is a 38-digit integer. Missing-from-one-ranker
    candidates COALESCE through a full outer join on (query, doc).

    Scale: the ranker scans share q28's broadcast-queries ×
    never-shuffled-corpus shape; fusion shuffles only the 2×20-per-
    query candidate lists. This is the shape of production hybrid
    search (BM25 + dense, or multi-vector ensembles): rankers stay
    independent, fusion touches only top-k lists.
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def topk(n_dims: int) -> DataFrame:
        return similarity.quantized_prefix_topk(emb, n_dims, _RRF_DEPTH)

    full, trunc = topk(64).alias("f"), topk(16).alias("t")
    fused = full.join(
        trunc,
        (F.col("f.query_id") == F.col("t.query_id")) & (F.col("f.vec_id") == F.col("t.vec_id")),
        "full_outer",
    ).select(
        F.coalesce(F.col("f.query_id"), F.col("t.query_id")).alias("query_id"),
        F.coalesce(F.col("f.vec_id"), F.col("t.vec_id")).alias("vec_id"),
        (_rrf_term_col(F.col("f.rn")) + _rrf_term_col(F.col("t.rn"))).alias("score"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        fused.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 10)
        .select(
            "query_id",
            "vec_id",
            F.col("score").cast("string").alias("rrf_score_scaled"),
            F.col("rnk").cast("long").alias("fused_rank"),
        )
    )


@register(
    "q228_loo_target_encoding",
    oracle="""
    WITH joined AS (
        SELECT o.o_orderkey, c.c_mktsegment,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), seg AS (
        SELECT c_mktsegment,
               CAST(SUM(cents) AS BIGINT) AS s_sum,
               CAST(COUNT(*) AS BIGINT) AS s_cnt
        FROM joined GROUP BY 1
    )
    SELECT j.o_orderkey, j.c_mktsegment,
           s.s_sum - j.cents AS loo_num_cents,
           s.s_cnt - 1 AS loo_den,
           CAST(s.s_sum - j.cents AS DOUBLE) / CAST(s.s_cnt - 1 AS DOUBLE)
               AS loo_encoding_cents
    FROM joined j JOIN seg s ON j.c_mktsegment = s.c_mktsegment
    """,
    survey_ref="extension: leave-one-out mean target encoding — the ML "
    "feature-engineering primitive (encode a category by the mean "
    "target of the OTHER rows, preventing self-leakage); numerator and "
    "denominator carried as exact integers, one double division per "
    "row with identical operands on both engines",
)
def q228_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of c_mktsegment against order
    value: each order's feature is (segment Σcents − own cents) /
    (segment count − 1) — the standard leakage-free categorical
    encoding for training tabular models. The segment aggregate is 5
    rows, so the encode join is a broadcast: one shuffle for the
    orders⋈customer join, a broadcast hash join back, no second
    exchange. Exact integer numerator/denominator make the feature
    reproducible across engines and retries — an auditability property
    float target encodings lack.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_mktsegment", (_dec("o_totalprice") * 100).cast("long").alias("cents")
    )
    seg = joined.groupBy("c_mktsegment").agg(
        F.sum("cents").cast("long").alias("s_sum"),
        F.count("*").cast("long").alias("s_cnt"),
    )
    return joined.join(F.broadcast(seg), "c_mktsegment").select(
        "o_orderkey",
        "c_mktsegment",
        (F.col("s_sum") - F.col("cents")).alias("loo_num_cents"),
        (F.col("s_cnt") - 1).alias("loo_den"),
        (
            (F.col("s_sum") - F.col("cents")).cast("double")
            / (F.col("s_cnt") - 1).cast("double")
        ).alias("loo_encoding_cents"),
    )


# ---------------------------------------------------------------------------
# Batch 16 (round 3): Merkle snapshot diff, PPS sampling, rank-biased
# overlap, grid-bucketed spatial join, winnowing fingerprints
# ---------------------------------------------------------------------------

_M31 = 2147483647


def _mix31_sql(u: str) -> str:
    """The q224 multiply-mod/xor-shift mixer as SQL (31-bit output)."""
    a = f"(({u}) * 48271 + 11) % {_M31}"
    b = f"(xor({a}, ({a}) >> 16) * 69621) % {_M31}"
    return f"xor({b}, ({b}) >> 16)"


def _mix31_col(u: F.Column) -> F.Column:
    p = F.lit(_M31).cast("long")
    a = F.pmod(u * 48271 + 11, p)
    b = F.pmod(a.bitwiseXOR(F.shiftright(a, 16)) * 69621, p)
    return b.bitwiseXOR(F.shiftright(b, 16))


@register(
    "q229_merkle_snapshot_diff",
    headline=True,
    oracle=f"""
    WITH a AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders
    ), b AS (
        SELECT k, cents + CASE WHEN k % 1000 = 0 THEN 1 ELSE 0 END AS cents
        FROM a WHERE k % 997 <> 0
        UNION ALL
        SELECT k + 100000000, cents FROM a WHERE k % 1009 = 0
    ), ah AS (
        SELECT k, (k * 48271 + cents) % {_M31} AS rh, (k * 40692) % {_M31} % 64 AS bucket
        FROM a
    ), bh AS (
        SELECT k, (k * 48271 + cents) % {_M31} AS rh, (k * 40692) % {_M31} % 64 AS bucket
        FROM b
    ), asum AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(rh) AS BIGINT) AS s,
               bit_xor(rh) AS x
        FROM ah GROUP BY 1
    ), bsum AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(rh) AS BIGINT) AS s,
               bit_xor(rh) AS x
        FROM bh GROUP BY 1
    ), dirty AS (
        SELECT COALESCE(a.bucket, b.bucket) AS bucket
        FROM asum a FULL OUTER JOIN bsum b ON a.bucket = b.bucket
        WHERE a.bucket IS NULL OR b.bucket IS NULL
           OR a.cnt <> b.cnt OR a.s <> b.s OR a.x <> b.x
    )
    SELECT COALESCE(x.k, y.k) AS o_orderkey,
           COALESCE(x.bucket, y.bucket) AS bucket,
           CASE WHEN y.k IS NULL THEN 'deleted'
                WHEN x.k IS NULL THEN 'inserted'
                ELSE 'changed' END AS status
    FROM (SELECT ah.* FROM ah JOIN dirty USING (bucket)) x
    FULL OUTER JOIN (SELECT bh.* FROM bh JOIN dirty USING (bucket)) y
      ON x.k = y.k
    WHERE x.k IS NULL OR y.k IS NULL OR x.rh <> y.rh
    """,
    survey_ref="extension: Merkle-style snapshot diff — 64 per-bucket "
    "(count, SUM-hash, XOR-hash) summaries compared first, then the "
    "row-level full-outer diff runs ONLY inside dirty buckets; the "
    "cross-snapshot validation pattern that avoids re-reading clean "
    "data (pairs with q201's whole-table checksum)",
)
def q229_merkle_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two table snapshots the way you'd do it at 100 TB: hash
    every row once, fold per-bucket (count, SUM, XOR) summaries — 64
    tiny rows per side — compare summaries, and only for buckets whose
    summaries disagree run the row-level full-outer join that labels
    each key changed/deleted/inserted. Clean buckets are never
    re-joined: with localized churn (this synthetic B mutates ~0.1% of
    keys, deletes ~0.1%, inserts ~0.1%) the expensive key-level join
    touches a few percent of the data. Snapshot B is derived from A by
    deterministic arithmetic so the diff is fully value-oracled.
    """
    a = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), (_dec("o_totalprice") * 100).cast("long").alias("cents")
    )
    b = a.filter(F.pmod(F.col("k"), F.lit(997)) != 0).select(
        "k",
        (
            F.col("cents")
            + F.when(F.pmod(F.col("k"), F.lit(1000)) == 0, 1).otherwise(0)
        ).alias("cents"),
    ).unionByName(
        a.filter(F.pmod(F.col("k"), F.lit(1009)) == 0).select(
            (F.col("k") + 100000000).alias("k"), "cents"
        )
    )
    p = F.lit(_M31).cast("long")

    def hashed(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.pmod(F.col("k") * 48271 + F.col("cents"), p).alias("rh"),
            F.pmod(F.pmod(F.col("k") * 40692, p), F.lit(64).cast("long")).alias("bucket"),
        )

    ah, bh = hashed(a), hashed(b)

    def summed(df: DataFrame) -> DataFrame:
        return df.groupBy("bucket").agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("rh").cast("long").alias("s"),
            F.bit_xor("rh").alias("x"),
        )

    asum, bsum = summed(ah).alias("sa"), summed(bh).alias("sb")
    dirty = (
        asum.join(bsum, F.col("sa.bucket") == F.col("sb.bucket"), "full_outer")
        .filter(
            F.col("sa.bucket").isNull()
            | F.col("sb.bucket").isNull()
            | (F.col("sa.cnt") != F.col("sb.cnt"))
            | (F.col("sa.s") != F.col("sb.s"))
            | (F.col("sa.x") != F.col("sb.x"))
        )
        .select(F.coalesce(F.col("sa.bucket"), F.col("sb.bucket")).alias("bucket"))
    )
    xa = ah.join(F.broadcast(dirty), "bucket").alias("x")
    yb = bh.join(F.broadcast(dirty), "bucket").alias("y")
    return (
        xa.join(yb, F.col("x.k") == F.col("y.k"), "full_outer")
        .filter(
            F.col("x.k").isNull() | F.col("y.k").isNull() | (F.col("x.rh") != F.col("y.rh"))
        )
        .select(
            F.coalesce(F.col("x.k"), F.col("y.k")).alias("o_orderkey"),
            F.coalesce(F.col("x.bucket"), F.col("y.bucket")).alias("bucket"),
            F.when(F.col("y.k").isNull(), "deleted")
            .when(F.col("x.k").isNull(), "inserted")
            .otherwise("changed")
            .alias("status"),
        )
    )


@register(
    "q230_pps_sample",
    oracle=f"""
    WITH wtd AS (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w_cents,
               ((o_orderkey * 69621 + 7) % {_M31}) % 1048576 + 1 AS u
        FROM orders
    ), tot AS (
        SELECT CAST(SUM(w_cents) AS BIGINT) AS w_total FROM wtd
    ), ranked AS (
        SELECT o_orderkey, w_cents, u,
               CAST(u AS DOUBLE) / CAST(w_cents AS DOUBLE) AS priority,
               ROW_NUMBER() OVER (ORDER BY CAST(u AS DOUBLE) / CAST(w_cents AS DOUBLE) ASC,
                                  o_orderkey ASC) AS rnk
        FROM wtd
    )
    SELECT o_orderkey, w_cents, u, CAST(rnk AS BIGINT) AS rnk,
           greatest(CAST(w_cents AS DOUBLE), CAST(w_total AS DOUBLE) / 100.0)
               AS ht_contribution
    FROM ranked CROSS JOIN tot
    WHERE rnk <= 100
    """,
    survey_ref="extension: probability-proportional-to-size sampling "
    "(sequential Poisson / priority sampling) — deterministic hash "
    "uniform per key, priority u/w, take the 100 smallest; with the "
    "Horvitz-Thompson contribution max(w, W/n) per sampled row — the "
    "weighted-sampling primitive behind corpus subsampling and "
    "audit-sample selection",
)
def q230_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of 100 orders, probability proportional to order
    value, without replacement and fully deterministic: each key gets a
    reproducible hash-uniform u in (0, 2²⁰], priority u/w, and the 100
    smallest priorities win (Ohlsson's sequential Poisson sampling —
    the estimator's π_i ≈ min(1, n·w/W) gives the Horvitz-Thompson
    per-row contribution max(w, W/n)). The double division u/w has
    identical integer operands in both engines → identical IEEE
    results → identical sample. Scale shape: no global sort — Spark
    plans TakeOrderedAndProject (per-partition top-100, then a
    100-row-per-partition merge on the driver-side single reducer);
    the total-weight aggregate broadcasts.
    """
    wtd = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (_dec("o_totalprice") * 100).cast("long").alias("w_cents"),
        (
            F.pmod(
                F.pmod(F.col("o_orderkey") * 69621 + 7, F.lit(_M31).cast("long")),
                F.lit(1048576).cast("long"),
            )
            + 1
        ).alias("u"),
    )
    tot = wtd.agg(F.sum("w_cents").cast("long").alias("w_total"))
    prio = F.col("u").cast("double") / F.col("w_cents").cast("double")
    sample = (
        wtd.withColumn("priority", prio)
        .orderBy(F.col("priority").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )
    w100 = Window.orderBy(F.col("priority").asc(), F.col("o_orderkey").asc())
    return (
        sample.withColumn("rnk", F.row_number().over(w100).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderkey",
            "w_cents",
            "u",
            "rnk",
            F.greatest(
                F.col("w_cents").cast("double"), F.col("w_total").cast("double") / 100.0
            ).alias("ht_contribution"),
        )
    )


# Rank-biased overlap, exact: RBO_min@20 with p=0.9 equals
# (1-p)/L · Σ_docs C[max(ra,rb)] where C[m] = Σ_{d=m..20} p^(d-1)·L/d,
# L = lcm(1..20). Every C[m] is an exact 19-dp decimal (host-computed
# with Fractions); the only float op is the final scale by (1-p)/L.
_RBO_L = 232792560  # lcm(1..20)
_RBO_RHO = repr(0.1 / _RBO_L)


def _rbo_coeffs() -> dict[int, str]:
    from fractions import Fraction

    out = {}
    for m in range(1, 21):
        s = sum(Fraction(9, 10) ** (d - 1) * Fraction(_RBO_L, d) for d in range(m, 21))
        scaled = s * 10**19
        assert scaled.denominator == 1
        n = scaled.numerator
        out[m] = f"{n // 10**19}.{n % 10**19:019d}"
    return out


_RBO_C = _rbo_coeffs()


def _rbo_c_sql(m: str) -> str:
    branches = " ".join(
        f"WHEN {m} = {k} THEN CAST('{v}' AS DECIMAL(38,19))" for k, v in _RBO_C.items()
    )
    return f"CASE {branches} END"


def _rbo_c_col(m: F.Column) -> F.Column:
    out = F.lit(None).cast("decimal(38,19)")
    for k, v in _RBO_C.items():
        out = F.when(m == k, F.lit(v).cast("decimal(38,19)")).otherwise(out)
    return out


@register(
    "q231_rbo",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id % 97 = 0
    ), c AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS cv
        FROM embeddings WHERE vec_id % 97 <> 0
    ), full_top AS (
        SELECT query_id, vec_id, rn FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 64),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= 20
    ), trunc_top AS (
        SELECT query_id, vec_id, rn FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 16),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= 20
    ), common AS (
        SELECT f.query_id, greatest(f.rn, t.rn) AS m
        FROM full_top f JOIN trunc_top t
          ON f.query_id = t.query_id AND f.vec_id = t.vec_id
    ), agg AS (
        SELECT query_id,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM({_rbo_c_sql("m")}) AS DECIMAL(38,19)) AS rbo_scaled
        FROM common GROUP BY 1
    )
    SELECT query_id, n_common,
           -- exact digit string: DECIMAL(38,19) is int128-backed and diverges
           -- in the driver's Arrow/pandas export (VERDICT r04)
           CAST(rbo_scaled AS VARCHAR) AS rbo_scaled,
           CAST(CAST(rbo_scaled AS VARCHAR) AS DOUBLE) * {_RBO_RHO} AS rbo_min
    FROM agg
    """,
    survey_ref="extension: rank-biased overlap between the full-64-dim "
    "and 16-dim-prefix rankers (p=0.9, depth 20, RBO_min) — overlap "
    "contributions collapse to one host-computed exact-decimal "
    "cumulative coefficient per common doc, so the top-weighted "
    "ranking-agreement metric is engine-exact until one final scale",
)
def q231_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much do the cheap (16-dim) and full (64-dim) rankers agree,
    weighted toward the top of the list? Rank-biased overlap (Webber et
    al.): RBO = (1−p) Σ_d p^(d−1)·overlap@d/d. Rewriting the double sum
    per common document — each doc present in both top-20s at ranks
    (ra, rb) contributes C[max(ra,rb)] = Σ_{{d≥max}} p^(d−1)·L/d — turns
    the metric into ONE equi-join on (query, doc) plus a SUM over a
    20-entry exact-decimal lookup table (host-generated with exact
    rational arithmetic, L = lcm(1..20) clearing every /d). Unlike
    recall@k (q219) this is top-weighted; unlike RRF (q227) it measures
    agreement rather than fusing. The float appears exactly once: the
    final (1−p)/L scale of an exact decimal."""
    emb = load_table(spark, sf_dir, "embeddings")

    def topk(n_dims: int) -> DataFrame:
        return similarity.quantized_prefix_topk(emb, n_dims, 20)

    full, trunc = topk(64).alias("f"), topk(16).alias("t")
    common = full.join(
        trunc,
        (F.col("f.query_id") == F.col("t.query_id")) & (F.col("f.vec_id") == F.col("t.vec_id")),
    ).select(
        F.col("f.query_id").alias("query_id"),
        F.greatest(F.col("f.rn"), F.col("t.rn")).alias("m"),
    )
    agg = common.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_common"),
        F.sum(_rbo_c_col(F.col("m"))).cast("decimal(38,19)").alias("rbo_scaled"),
    )
    return agg.select(
        "query_id",
        "n_common",
        F.col("rbo_scaled").cast("string").alias("rbo_scaled"),
        (F.col("rbo_scaled").cast("double") * F.lit(float(_RBO_RHO))).alias("rbo_min"),
    )


@register(
    "q232_grid_spatial_join",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS k,
               ({_mix31_sql("c_custkey")}) % 4096 AS x,
               ({_mix31_sql("c_custkey + 1000003")}) % 4096 AS y
        FROM customer
    ), cells AS (
        SELECT k, x, y, x // 64 AS cx, y // 64 AS cy FROM pts
    ), probe AS (
        SELECT c.k, c.x, c.y, c.cx + dx.d AS ncx, c.cy + dy.d AS ncy
        FROM cells c
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
    )
    SELECT a.k AS key_a, b.k AS key_b,
           greatest(abs(a.x - b.x), abs(a.y - b.y)) AS chebyshev_dist
    FROM probe a JOIN cells b ON a.ncx = b.cx AND a.ncy = b.cy
    WHERE a.k < b.k AND abs(a.x - b.x) <= 64 AND abs(a.y - b.y) <= 64
    """,
    survey_ref="extension: grid-bucketed 2-D spatial self-join — points "
    "land in 64×64 cells, each point probes its 3×3 cell neighborhood "
    "via equi-join, exact integer Chebyshev refine; the geohash/cell "
    "pattern that turns an O(N²) radius join into a cell-local one "
    "(2-D companion to q81's 1-D range join)",
)
def q232_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within Chebyshev distance 64 in a synthetic
    4096×4096 integer plane (coordinates are the q224 portable mixer
    applied to the key — deterministic, uniform, fully oracle-able).
    The join is the standard spatial-bucketing shape: snap points to
    radius-sized cells, explode each point to its 3×3 neighbor cells
    (9× — constant, not data-dependent), equi-join on the cell id, and
    refine with the exact integer distance predicate. Shuffle is
    ∝ 9·N on cell keys instead of the N² cross join; cell size = radius
    guarantees no missed pair (any pair within r spans adjacent cells).
    At 100 TB this is how you'd do geo dedup or neighbor feature
    extraction; skewed cells (hot geohashes) take the q197 salting."""
    pts = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.pmod(_mix31_col(F.col("c_custkey")), F.lit(4096).cast("long")).alias("x"),
        F.pmod(_mix31_col(F.col("c_custkey") + 1000003), F.lit(4096).cast("long")).alias("y"),
    )
    cells = pts.select(
        "k", "x", "y",
        ((F.col("x") - F.pmod(F.col("x"), F.lit(64))) / 64).cast("long").alias("cx"),
        ((F.col("y") - F.pmod(F.col("y"), F.lit(64))) / 64).cast("long").alias("cy"),
    )
    offsets = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    probe = cells.select(
        "k", "x", "y", "cx", "cy", F.explode(offsets).alias("o")
    ).select(
        "k", "x", "y",
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    ).alias("a")
    b = cells.alias("b")
    return (
        probe.join(b, (F.col("a.ncx") == F.col("b.cx")) & (F.col("a.ncy") == F.col("b.cy")))
        .filter(
            (F.col("a.k") < F.col("b.k"))
            & (F.abs(F.col("a.x") - F.col("b.x")) <= 64)
            & (F.abs(F.col("a.y") - F.col("b.y")) <= 64)
        )
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.greatest(
                F.abs(F.col("a.x") - F.col("b.x")), F.abs(F.col("a.y") - F.col("b.y"))
            ).alias("chebyshev_dist"),
        )
    )


@register(
    "q233_winnowing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), hw AS (
        SELECT doc_id,
               list_transform(tk, w ->
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, length(w)),
                                      i -> CAST(ord(substr(w, i, 1)) AS BIGINT))),
                       (a, b) -> (a * 31 + b) % 1000000007)) AS hs
        FROM toks
    ), g3 AS (
        SELECT doc_id, i AS pos,
               ((hs[i] * 31 + hs[i+1]) % 1000000007 * 31 + hs[i+2]) % 1000000007 AS h3
        FROM hw, unnest(generate_series(1, greatest(len(hs) - 2, 0))) AS t(i)
    ), keyed AS (
        SELECT doc_id, pos, h3, h3 * 1048576 + (1048575 - pos) AS ck FROM g3
    ), winmin AS (
        SELECT doc_id, pos,
               MIN(ck) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
        FROM keyed
    ), fp AS (
        SELECT DISTINCT doc_id, sel // 1048576 AS h
        FROM winmin WHERE pos >= 4
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fp
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    survey_ref="extension: winnowing fingerprint selection (Schleimer/"
    "Wilkerson/Aiken, the MOSS algorithm) — per-window rightmost-min "
    "3-gram hash selection encoded as an integer MIN over a 4-row "
    "frame, then candidate pairs share ≥2 selected fingerprints; the "
    "position-robust near-dup family next to MinHash (q26) and "
    "SimHash (q27), with guaranteed within-window match coverage",
)
def q233_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing: from each document's word-3-gram hash sequence,
    select the minimum hash of every 4-length sliding window (ties →
    rightmost), dedupe selections, and emit document pairs sharing ≥2
    selected fingerprints. Unlike MinHash, winnowing guarantees any
    shared run of ≥6 tokens yields a shared fingerprint (the MOSS
    property), so it catches local plagiarism/quotation overlap that
    whole-document sketches dilute. The rightmost-min-tie-break is
    encoded arithmetically — MIN over ck = h·2²⁰ + (2²⁰−1−pos) picks
    the smallest hash and, on ties, the largest position — so the
    whole selection is a single integer window MIN, pure JVM. Shuffle
    ∝ selected fingerprints (≈ n_grams/(w+1)·…, a 4× reduction), and
    the pair join is postings-style on the fingerprint value with the
    same skew caps as q25."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", F.posexplode(text.tokens(F.col("text"))).alias("pos0", "w")
    )
    p = F.lit(1_000_000_007).cast("long")
    hw = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.ascii(F.col("w").substr(i, F.lit(1))).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, b: F.pmod(a * 31 + b, p),
    )
    hashed = toks.select("doc_id", (F.col("pos0") + 1).alias("pos"), hw.alias("hw"))
    wo = Window.partitionBy("doc_id").orderBy("pos")
    g3 = hashed.select(
        "doc_id",
        "pos",
        F.pmod(
            F.pmod(F.col("hw") * 31 + F.lead("hw", 1).over(wo), p) * 31
            + F.lead("hw", 2).over(wo),
            p,
        ).alias("h3"),
    ).filter(F.col("h3").isNotNull())
    keyed = g3.select(
        "doc_id", "pos", (F.col("h3") * 1048576 + (1048575 - F.col("pos"))).alias("ck")
    )
    wf = wo.rowsBetween(-3, 0)
    fp = (
        keyed.select("doc_id", "pos", F.min("ck").over(wf).alias("sel"))
        .filter(F.col("pos") >= 4)
        .select("doc_id", ((F.col("sel") - F.pmod(F.col("sel"), F.lit(1048576))) / 1048576)
                .cast("long").alias("h"))
        .distinct()
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= 2)
    )


# ---------------------------------------------------------------------------
# Batch 17 (round 3): FastSS fuzzy join, k-core, k-anonymity, bitemporal
# as-of, Holt linear trend
# ---------------------------------------------------------------------------


@register(
    "q234_fastss_neighbors",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_distance
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    survey_ref="extension: FastSS edit-distance-≤1 similarity join — "
    "deletion-neighborhood candidate generation (each string joins on "
    "its |s|+1 one-char-deletion variants) + exact levenshtein refine; "
    "the oracle runs the INDEPENDENT O(N²) brute-force algorithm, so "
    "the match validates the candidate set is lossless",
)
def q234_fastss_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer-name pairs within edit distance 1, without the N²
    comparison: FastSS (Bocek et al.) — every string emits itself plus
    each one-character-deletion variant; any ed≤1 pair must share a
    variant (substitution → both delete the differing position;
    indel → one side's deletion equals the other's string), so an
    equi-join on the variant generates a small candidate superset and
    the built-in JVM levenshtein refines exactly. Shuffle is
    ∝ N·(len+1) postings instead of N² pairs; hot variants (shared
    prefixes) are bounded by the alphabet, and the deliberately
    different brute-force oracle proves no pair is missed. This is the
    typo-tolerant entity-resolution join q112's blocking approximates —
    here with a lossless candidate guarantee.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # variants via a SQL lambda (substring with column-valued bounds)
    posting = cust.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.expr(
                "transform(sequence(0, length(c_name)), i -> "
                "CASE WHEN i = 0 THEN c_name "
                "ELSE concat(substring(c_name, 1, i - 1), "
                "substring(c_name, i + 1, length(c_name))) END)"
            )
        ).alias("v"),
    )
    a, b = posting.alias("a"), posting.alias("b")
    cand = (
        a.join(b, (F.col("a.v") == F.col("b.v")) & (F.col("a.c_custkey") < F.col("b.c_custkey")))
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("na"),
            F.col("b.c_name").alias("nb"),
        )
        .distinct()
    )
    return cand.filter(F.levenshtein("na", "nb") <= 1).select(
        "key_a", "key_b", F.levenshtein("na", "nb").cast("long").alias("edit_distance")
    )


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [
        """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""n{r} AS (
        SELECT u FROM e{r - 1} GROUP BY u HAVING COUNT(*) >= {k}
    ), e{r} AS (
        SELECT e.u, e.v FROM e{r - 1} e
        JOIN n{r} a ON e.u = a.u JOIN n{r} b ON e.v = b.u
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY 1
    """
    )


@register(
    "q235_k_core",
    oracle=_kcore_oracle(60, 3),
    survey_ref="extension: k-core decomposition (k=60, 3 unrolled peel "
    "rounds) over the co-purchase graph — iterative low-degree peeling "
    "where each round is one degree aggregate + two semi-joins; the "
    "community-density primitive next to q155's triangles and q110's "
    "PageRank",
)
def q235_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approach the 60-core of the co-purchase graph: repeatedly remove
    vertices with degree < 60 (3 unrolled rounds; peeling cascades, so
    each round is degree-count → keep-set → edge restriction). Each
    round is one shuffle on the vertex key plus two semi-joins that
    reuse it — the standard dense-subgraph/community-seed primitive
    (spam rings, core reviewer groups) expressed as lazy Pregel-style
    rounds like q156/q226; run to fixpoint it would switch to the
    checkpointed connected-components driver."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    for _ in range(3):
        keep = e.groupBy("u").agg(F.count("*").alias("d")).filter(F.col("d") >= 60).select("u")
        e = e.join(keep, "u", "left_semi").join(
            keep.withColumnRenamed("u", "v"), "v", "left_semi"
        )
    return e.groupBy(F.col("u").alias("node")).agg(F.count("*").cast("long").alias("degree"))


@register(
    "q236_k_anonymity",
    oracle="""
    WITH joined AS (
        SELECT c.c_custkey, c.c_mktsegment, c.c_nationkey, n.n_regionkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ), l0 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM joined GROUP BY c_nationkey, c_mktsegment,
            (cents - ((cents % 10000) + 10000) % 10000) // 10000
    ), l1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM joined GROUP BY n_regionkey, c_mktsegment,
            (cents - ((cents % 100000) + 100000) % 100000) // 100000
    ), l2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM joined GROUP BY n_regionkey, c_mktsegment
    ), stats AS (
        SELECT 0 AS level, CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(MIN(n) AS BIGINT) AS min_group_size,
               CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk
        FROM l0
        UNION ALL
        SELECT 1, COUNT(*), MIN(n),
               CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) FROM l1
        UNION ALL
        SELECT 2, COUNT(*), MIN(n),
               CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) FROM l2
    )
    SELECT level, n_groups, min_group_size, rows_at_risk,
           CASE WHEN min_group_size >= 5 THEN 1 ELSE 0 END AS k_anonymous
    FROM stats
    """,
    survey_ref="extension: k-anonymity audit across a 3-level "
    "generalization hierarchy — quasi-identifier (nation, segment, "
    "$100-balance) coarsened to (region, segment, $1000) to (region, "
    "segment); per level the group-size floor and re-identifiable row "
    "mass; the privacy gate a training-data release pipeline runs "
    "before export (pairs with q65's redaction)",
)
def q236_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the customer table k-anonymous (k=5) under its quasi-
    identifiers, and how much generalization fixes it? Three lattice
    levels — exact (nation, segment, $100 balance bucket), coarsened
    (region, segment, $1000), and (region, segment) — each one
    aggregate counting group sizes, then a tiny rollup of the
    count-of-counts (the q197 histogram trick: the audit never holds
    more than the group-size distribution). rows_at_risk is the mass
    in groups smaller than k — the records an attacker could
    re-identify by quasi-identifier join."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cents = (_dec("c_acctbal") * 100).cast("long")
    joined = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]).select(
        "c_mktsegment", "c_nationkey", "n_regionkey", cents.alias("cents")
    )

    def bucket(c: F.Column, size: int) -> F.Column:
        return ((c - F.pmod(c, F.lit(size).cast("long"))) / size).cast("long")

    def level(df_keys: list[F.Column], lvl: int) -> DataFrame:
        sizes = joined.groupBy(*df_keys).agg(F.count("*").alias("n"))
        return sizes.agg(
            F.lit(lvl).cast("int").alias("level"),
            F.count("*").cast("long").alias("n_groups"),
            F.min("n").cast("long").alias("min_group_size"),
            F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
        )

    l0 = level([F.col("c_nationkey"), F.col("c_mktsegment"), bucket(F.col("cents"), 10000)], 0)
    l1 = level([F.col("n_regionkey"), F.col("c_mktsegment"), bucket(F.col("cents"), 100000)], 1)
    l2 = level([F.col("n_regionkey"), F.col("c_mktsegment")], 2)
    out = l0.unionByName(l1).unionByName(l2)
    return out.select(
        "level",
        "n_groups",
        "min_group_size",
        "rows_at_risk",
        F.when(F.col("min_group_size") >= 5, 1).otherwise(0).alias("k_anonymous"),
    )


@register(
    "q237_bitemporal_asof",
    oracle="""
    WITH versions AS (
        SELECT o_orderkey, 1 AS ver,
               CAST(o_orderdate AS DATE) AS valid_from,
               CAST(o_orderdate AS DATE) AS tx_date,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders
        UNION ALL
        SELECT o_orderkey, 2,
               CAST(o_orderdate AS DATE) + 10,
               CAST(o_orderdate AS DATE) + 30,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) + 500
        FROM orders WHERE o_orderkey % 100 = 0
    ), visible AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                      ORDER BY valid_from DESC, tx_date DESC, ver DESC) AS rn
        FROM versions
        WHERE tx_date <= DATE '1999-01-01' AND valid_from <= DATE '1998-06-01'
    )
    SELECT o_orderkey, CAST(ver AS BIGINT) AS ver,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(tx_date, '%Y-%m-%d') AS tx_date,
           cents
    FROM visible WHERE rn = 1
    """,
    survey_ref="extension: bitemporal as-of lookup — reconstruct table "
    "state along BOTH time axes (system time ≤ T: versions the database "
    "knew by then; valid time ≤ B: the version in effect on the "
    "business date), one window over the version history; the "
    "two-axis generalization of q149's SCD2 point lookup",
)
def q237_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF SYSTEM TIME 1999-01-01, what did each order look like ON
    business date 1998-06-01? Version 2 rows (a correction recorded 30
    days after the fact, effective 10 days after the fact, +$5) are
    synthesized deterministically for every 100th key, so the query is
    fully value-oracled. Bitemporal reconstruction is one filter on
    both axes plus one (valid_from, tx_date) DESC window per key —
    corrections recorded late (tx > T) are invisible, corrections
    effective late (valid_from > B) don't apply, and otherwise the
    latest-effective, latest-known version wins. The audit/backtest
    primitive: 'reproduce the report as the data stood then'."""
    o = load_table(spark, sf_dir, "orders")
    cents = (_dec("o_totalprice") * 100).cast("long")
    odate = F.col("o_orderdate").cast("date")
    v1 = o.select(
        "o_orderkey",
        F.lit(1).alias("ver"),
        odate.alias("valid_from"),
        odate.alias("tx_date"),
        cents.alias("cents"),
    )
    v2 = o.filter(F.pmod(F.col("o_orderkey"), F.lit(100)) == 0).select(
        "o_orderkey",
        F.lit(2).alias("ver"),
        F.date_add(odate, 10).alias("valid_from"),
        F.date_add(odate, 30).alias("tx_date"),
        (cents + 500).alias("cents"),
    )
    versions = v1.unionByName(v2)
    visible = versions.filter(
        (F.col("tx_date") <= F.lit("1999-01-01").cast("date"))
        & (F.col("valid_from") <= F.lit("1998-06-01").cast("date"))
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("valid_from").desc(), F.col("tx_date").desc(), F.col("ver").desc()
    )
    return (
        visible.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            F.col("ver").cast("long").alias("ver"),
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("tx_date", "yyyy-MM-dd").alias("tx_date"),
            "cents",
        )
    )


@register(
    "q238_holt_trend",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               CAST(o_totalprice AS DOUBLE) AS p,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders
    ), rec AS (
        SELECT o_custkey, o_orderkey, order_date, rn,
               p AS l, CAST(0.0 AS DOUBLE) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.o_custkey, s.o_orderkey, s.order_date, s.rn,
               0.5 * s.p + 0.5 * (r.l + r.b),
               0.5 * ((0.5 * s.p + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
        FROM rec r JOIN seq s ON s.o_custkey = r.o_custkey AND s.rn = r.rn + 1
    )
    SELECT o_custkey, o_orderkey, order_date,
           l AS level, b AS trend, l + b AS forecast
    FROM rec
    """,
    survey_ref="extension: Holt linear-trend double exponential "
    "smoothing (α=β=0.5) — the EMA recurrence with a coupled trend "
    "accumulator; O(n)-per-key mapInPandas scan vs recursive-CTE "
    "oracle, bit-identical doubles (exact coefficients, matching op "
    "order); extends the q68 recurrence engine to two-state recurrences",
)
def q238_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level + trend + one-step forecast of order totals per customer
    (Holt's method, α=β=0.5). See operators/indicators.holt_linear for
    the physical shape: one exchange on the key, state carried across
    Arrow batches, bit-exact against the recursive-CTE oracle because
    both engines run the identical IEEE sequence with exactly-
    representable coefficients. The dispatcher story matches q68: this
    is what 'custom stateful operator Spark lacks' compiles to when
    the recurrence has more than one accumulator."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _d("o_orderdate").alias("order_date"), "o_totalprice"
    )
    out = indicators.holt_linear(o, ["o_custkey"], ["order_date", "o_orderkey"], "o_totalprice")
    return out.select("o_custkey", "o_orderkey", "order_date", "level", "trend", "forecast")


# ---------------------------------------------------------------------------
# Batch 18 (round 3): rendezvous hashing, FK integrity audit, Spearman,
# MMR re-ranking, kNN label-noise audit
# ---------------------------------------------------------------------------

_RDV_NODES = 8


def _rdv_weight_sql(key: str, node: int) -> str:
    # encode (weight, node) as weight*8 + node so greatest() breaks the
    # (astronomically rare but possible) weight ties deterministically
    return f"({_mix31_sql(f'{key} * 31 + {node * 69621 + 13}')}) * 8 + {node}"


def _rdv_weight_col(key: F.Column, node: int) -> F.Column:
    return _mix31_col(key * 31 + (node * 69621 + 13)) * 8 + node


@register(
    "q239_rendezvous_hashing",
    oracle=f"""
    WITH assigned AS (
        SELECT o_orderkey,
               greatest({", ".join(_rdv_weight_sql("o_orderkey", n) for n in range(_RDV_NODES))})
                   % 8 AS node_before,
               greatest({", ".join(_rdv_weight_sql("o_orderkey", n) for n in range(_RDV_NODES) if n != 3)})
                   % 8 AS node_after
        FROM orders
    )
    SELECT node_before AS node,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN node_after = node_before THEN 1 ELSE 0 END) AS BIGINT)
               AS n_stayed,
           CAST((SELECT COUNT(*) FROM assigned a2 WHERE a2.node_after = assigned.node_before)
               AS BIGINT) AS n_after
    FROM assigned GROUP BY 1
    """,
    survey_ref="extension: rendezvous (highest-random-weight) hashing — "
    "each key's owner is argmax over per-node portable hash weights "
    "(ties broken by encoding weight·8+node in one integer, so "
    "greatest() is the whole assignment); removing node 3 provably "
    "moves ONLY node 3's keys — the minimal-disruption partition-"
    "assignment primitive behind shard maps and consistent routing",
)
def q239_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every order key to one of 8 nodes by rendezvous hashing
    and audit what happens when node 3 is decommissioned. The whole
    assignment is a pure per-row expression — 8 portable hash weights,
    one greatest() — zero shuffle until the per-node count, and the
    HRW property falls out of the construction: a key's ranking of the
    other 7 nodes is unchanged by removing one, so only node-3 keys
    move (asserted: n_stayed = n_before on every other node). This is
    how you'd assign 100 TB of keys to executors/shards with no
    coordination state and minimal churn on topology change."""
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    before = F.pmod(
        F.greatest(*[_rdv_weight_col(key, n) for n in range(_RDV_NODES)]), F.lit(8).cast("long")
    )
    after = F.pmod(
        F.greatest(*[_rdv_weight_col(key, n) for n in range(_RDV_NODES) if n != 3]),
        F.lit(8).cast("long"),
    )
    assigned = o.select(before.alias("node_before"), after.alias("node_after"))
    before_counts = assigned.groupBy(F.col("node_before").alias("node")).agg(
        F.count("*").cast("long").alias("n_before"),
        F.sum((F.col("node_after") == F.col("node_before")).cast("long"))
        .cast("long")
        .alias("n_stayed"),
    )
    after_counts = assigned.groupBy(F.col("node_after").alias("node")).agg(
        F.count("*").cast("long").alias("n_after")
    )
    return before_counts.join(F.broadcast(after_counts), "node", "left").select(
        "node", "n_before", "n_stayed", F.coalesce("n_after", F.lit(0).cast("long")).alias("n_after")
    )


@register(
    "q240_fk_integrity_audit",
    oracle="""
    WITH corrupted AS (
        SELECT CASE WHEN l_orderkey % 1000 = 0 THEN -l_suppkey - 1 ELSE l_suppkey END AS fk
        FROM lineitem
    ), edges AS (
        SELECT 'orders->customer' AS fk_edge, o_custkey AS fk FROM orders
        UNION ALL SELECT 'lineitem->orders', l_orderkey FROM lineitem
        UNION ALL SELECT 'lineitem->part', l_partkey FROM lineitem
        UNION ALL SELECT 'lineitem->supplier', l_suppkey FROM lineitem
        UNION ALL SELECT 'customer->nation', c_nationkey FROM customer
        UNION ALL SELECT 'supplier->nation', s_nationkey FROM supplier
        UNION ALL SELECT 'nation->region', n_regionkey FROM nation
        UNION ALL SELECT 'lineitem(corrupted)->supplier', fk FROM corrupted
    ), parents AS (
        SELECT 'orders->customer' AS fk_edge, c_custkey AS pk FROM customer
        UNION ALL SELECT 'lineitem->orders', o_orderkey FROM orders
        UNION ALL SELECT 'lineitem->part', p_partkey FROM part
        UNION ALL SELECT 'lineitem->supplier', s_suppkey FROM supplier
        UNION ALL SELECT 'customer->nation', n_nationkey FROM nation
        UNION ALL SELECT 'supplier->nation', n_nationkey FROM nation
        UNION ALL SELECT 'nation->region', r_regionkey FROM region
        UNION ALL SELECT 'lineitem(corrupted)->supplier', s_suppkey FROM supplier
    )
    SELECT e.fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(DISTINCT e.fk) AS BIGINT) AS n_child_keys,
           CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows,
           CAST(COUNT(DISTINCT CASE WHEN p.pk IS NULL THEN e.fk END) AS BIGINT)
               AS n_orphan_keys
    FROM edges e
    LEFT JOIN (SELECT DISTINCT fk_edge, pk FROM parents) p
      ON e.fk_edge = p.fk_edge AND e.fk = p.pk
    GROUP BY 1
    """,
    survey_ref="extension: schema-wide referential-integrity audit — "
    "every FK edge of the star schema checked in one union of "
    "broadcast-dimension left joins, orphan rows and orphan keys per "
    "edge; plus a deterministically corrupted lineitem edge proving "
    "the audit actually fires (the data-quality gate generalizing "
    "q41's single anti-join and q98's column expectations)",
)
def q240_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass over every parent-child edge in the schema, reporting
    row and key orphan counts per edge. The seven real edges are clean
    by construction (the audit's green path); an eighth edge negates
    every 1000th lineitem's supplier key to prove the red path fires.
    Each edge is child-scan → broadcast parent keys → left-join null
    count: the parent key sets are dimension-sized (or key-only
    projections), so no edge shuffles the fact table — at 100 TB this
    audit costs one scan per child table. Distinct-orphan-keys vs
    orphan-rows separates 'one bad key repeated' from 'many bad keys'.
    """
    t = {n: load_table(spark, sf_dir, n) for n in
         ("orders", "lineitem", "customer", "supplier", "nation", "region", "part")}
    corrupted = t["lineitem"].select(
        F.when(
            F.pmod(F.col("l_orderkey"), F.lit(1000)) == 0, -F.col("l_suppkey") - 1
        ).otherwise(F.col("l_suppkey")).alias("fk")
    )
    edges = [
        ("orders->customer", t["orders"].select(F.col("o_custkey").alias("fk")),
         t["customer"].select(F.col("c_custkey").alias("pk"))),
        ("lineitem->orders", t["lineitem"].select(F.col("l_orderkey").alias("fk")),
         t["orders"].select(F.col("o_orderkey").alias("pk"))),
        ("lineitem->part", t["lineitem"].select(F.col("l_partkey").alias("fk")),
         t["part"].select(F.col("p_partkey").alias("pk"))),
        ("lineitem->supplier", t["lineitem"].select(F.col("l_suppkey").alias("fk")),
         t["supplier"].select(F.col("s_suppkey").alias("pk"))),
        ("customer->nation", t["customer"].select(F.col("c_nationkey").alias("fk")),
         t["nation"].select(F.col("n_nationkey").alias("pk"))),
        ("supplier->nation", t["supplier"].select(F.col("s_nationkey").alias("fk")),
         t["nation"].select(F.col("n_nationkey").alias("pk"))),
        ("nation->region", t["nation"].select(F.col("n_regionkey").alias("fk")),
         t["region"].select(F.col("r_regionkey").alias("pk"))),
        ("lineitem(corrupted)->supplier", corrupted,
         t["supplier"].select(F.col("s_suppkey").alias("pk"))),
    ]
    out = None
    for name, child, parent in edges:
        joined = child.join(
            F.broadcast(parent.distinct()), child["fk"] == parent["pk"], "left"
        )
        agg = joined.agg(
            F.lit(name).alias("fk_edge"),
            F.count("*").cast("long").alias("n_child_rows"),
            F.countDistinct("fk").cast("long").alias("n_child_keys"),
            F.sum(F.col("pk").isNull().cast("long")).cast("long").alias("n_orphan_rows"),
            F.countDistinct(F.when(F.col("pk").isNull(), F.col("fk")))
            .cast("long")
            .alias("n_orphan_keys"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


@register(
    "q241_spearman",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100), 0) AS BIGINT)
                   AS spend_cents
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT c_nationkey,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY bal_cents, c_custkey) AS r_bal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY spend_cents, c_custkey) AS r_spend
        FROM spend
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((r_bal - r_spend) * (r_bal - r_spend)) AS BIGINT) AS sum_d2,
           1.0 - CAST(6 * SUM((r_bal - r_spend) * (r_bal - r_spend)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE)
                  * (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) - 1.0)) AS rho
    FROM ranked GROUP BY 1
    """,
    survey_ref="extension: Spearman rank correlation per nation — "
    "account balance vs lifetime spend, both rankings deterministic "
    "(value then key tie-break), Σd² exact integer, ρ = 1 − 6Σd²/"
    "(n(n²−1)) in one final double expression; the monotone-association "
    "companion to q57's Pearson and q223's AUC",
)
def q241_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a customer's account balance predict their lifetime spend,
    monotonically? Spearman's ρ per nation: rank both measures inside
    each nation (deterministic tie-break by key — documented: this is
    the row_number variant, not midranks), take the exact integer Σd²,
    and apply the closed form once in double. Both rank windows share
    the nation partition, so the plan is one exchange + two
    in-partition sorts + one aggregate. Rank transforms make the
    correlation robust to the heavy right tail that makes Pearson
    (q57) misleading on money columns."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_nationkey", (_dec("c_acctbal") * 100).cast("long").alias("bal_cents"))
        .agg(
            F.coalesce(F.sum((_dec("o_totalprice") * 100).cast("long")), F.lit(0))
            .cast("long")
            .alias("spend_cents")
        )
    )
    wn = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        F.row_number().over(wn.orderBy("bal_cents", "c_custkey")).alias("r_bal"),
        F.row_number().over(wn.orderBy("spend_cents", "c_custkey")).alias("r_spend"),
    )
    d2 = (F.col("r_bal") - F.col("r_spend")) * (F.col("r_bal") - F.col("r_spend"))
    n_d = F.count("*").cast("double")
    return ranked.groupBy("c_nationkey").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
        (
            F.lit(1.0)
            - (6 * F.sum(d2)).cast("double") / (n_d * (n_d * n_d - F.lit(1.0)))
        ).alias("rho"),
    )


def _mmr_oracle(rounds: int) -> str:
    qd = """qc AS (
        SELECT q.query_id, c.vec_id,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, 64),
                       i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))), (a, b) -> a + b) AS dq
        FROM (SELECT vec_id AS query_id,
                     list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
              FROM embeddings WHERE vec_id % 97 = 0) q
        CROSS JOIN (SELECT vec_id,
                     list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS cv
              FROM embeddings WHERE vec_id % 97 <> 0) c
    ), cand AS (
        SELECT query_id, vec_id, dq FROM (
            SELECT query_id, vec_id, dq,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dq ASC, vec_id ASC) AS rn
            FROM qc
        ) WHERE rn <= 20
    ), cc AS (
        SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(generate_series(1, 64),
                       i -> (ea.ev[i] - eb.ev[i]) * (ea.ev[i] - eb.ev[i]))), (a2, b2) -> a2 + b2) AS dcc
        FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
        JOIN (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS ev
              FROM embeddings) ea ON ea.vec_id = a.vec_id
        JOIN (SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS ev
              FROM embeddings) eb ON eb.vec_id = b.vec_id
    ), s1 AS (
        SELECT query_id, vec_id, CAST(1 AS BIGINT) AS mmr_rank,
               CAST(NULL AS BIGINT) AS score
        FROM (SELECT query_id, vec_id,
                     ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dq ASC, vec_id ASC) AS rn
              FROM cand) WHERE rn = 1
    )"""
    parts = [qd]
    for r in range(2, rounds + 1):
        prev = " UNION ALL ".join(f"SELECT query_id, vec_id FROM s{i}" for i in range(1, r))
        parts.append(f"""s{r} AS (
        SELECT query_id, vec_id, CAST({r} AS BIGINT) AS mmr_rank, score FROM (
            SELECT c.query_id, c.vec_id,
                   MIN(cc.dcc) - c.dq AS score,
                   ROW_NUMBER() OVER (PARTITION BY c.query_id
                       ORDER BY MIN(cc.dcc) - c.dq DESC, c.vec_id ASC) AS rn
            FROM cand c
            JOIN cc ON cc.query_id = c.query_id AND cc.va = c.vec_id
                   AND cc.vb IN (SELECT vec_id FROM ({prev}) p WHERE p.query_id = c.query_id)
            WHERE c.vec_id NOT IN (SELECT vec_id FROM ({prev}) p2 WHERE p2.query_id = c.query_id)
            GROUP BY c.query_id, c.vec_id, c.dq
        ) WHERE rn = 1
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(1, rounds + 1))
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT query_id, vec_id, mmr_rank, score FROM ({union})\n    "
    )


@register(
    "q242_mmr_rerank",
    oracle=_mmr_oracle(5),
    survey_ref="extension: maximal-marginal-relevance re-ranking — 5 "
    "unrolled greedy rounds over the exact top-20 candidates; score = "
    "min-distance-to-selected − distance-to-query, all exact integers "
    "(λ=0.5 scaled away); the diversity-aware final stage of a "
    "retrieval stack, composed after q28/q53/q198's candidate "
    "generators",
)
def q242_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-rank each query's top-20 exact-nearest candidates for
    diversity: greedily pick the candidate maximizing
    (min distance to already-selected) − (distance to query) — the
    λ=0.5 MMR objective with both terms exact integers, ties to the
    smaller id. Five unrolled rounds; each is a join of the
    (query-local, ≤20-row) candidate set against the selected set plus
    a MIN-groupBy — tiny per query, so at 100 TB the cost remains the
    candidate generator's, and this composes behind IVF/LSH/PQ exactly
    like a production reranker. The candidate pairwise distances are
    computed once (20×19 per query) and reused by every round."""
    emb = load_table(spark, sf_dir, "embeddings")
    from stock_data_pipeline_spark.llm.clustering import _quantize

    qv = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), _quantize(F.col("embedding"), 10).alias("qv")
    )
    cv = emb.filter(F.col("vec_id") % 97 != 0).select(
        "vec_id", _quantize(F.col("embedding"), 10).alias("cv")
    )

    def d2(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    wq = Window.partitionBy("query_id").orderBy(F.col("dq").asc(), F.col("vec_id").asc())
    cand = (
        qv.crossJoin(cv)
        .withColumn("dq", d2("qv", "cv"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 20)
        .select("query_id", "vec_id", "dq", F.col("cv").alias("ev"))
    )
    ca, cb = cand.alias("ca"), cand.alias("cb")
    cc = ca.join(
        cb,
        (F.col("ca.query_id") == F.col("cb.query_id"))
        & (F.col("ca.vec_id") != F.col("cb.vec_id")),
    ).select(
        F.col("ca.query_id").alias("query_id"),
        F.col("ca.vec_id").alias("va"),
        F.col("cb.vec_id").alias("vb"),
        F.aggregate(
            F.zip_with(F.col("ca.ev"), F.col("cb.ev"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dcc"),
    )
    s1 = (
        cand.withColumn("rn2", F.row_number().over(wq))
        .filter(F.col("rn2") == 1)
        .select(
            "query_id", "vec_id",
            F.lit(1).cast("long").alias("mmr_rank"),
            F.lit(None).cast("long").alias("score"),
        )
    )
    selected = [s1]
    for r in range(2, 6):
        sel = selected[0]
        for s in selected[1:]:
            sel = sel.unionByName(s)
        remaining = cand.join(
            sel.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti"
        )
        scored = (
            remaining.alias("r")
            .join(
                cc.alias("p"),
                (F.col("p.query_id") == F.col("r.query_id"))
                & (F.col("p.va") == F.col("r.vec_id")),
            )
            .join(
                sel.alias("s"),
                (F.col("s.query_id") == F.col("r.query_id"))
                & (F.col("s.vec_id") == F.col("p.vb")),
                "left_semi",
            )
            .groupBy(F.col("r.query_id").alias("query_id"), F.col("r.vec_id").alias("vec_id"),
                     F.col("r.dq").alias("dq"))
            .agg(F.min("p.dcc").alias("min_dcc"))
            .select(
                "query_id", "vec_id", (F.col("min_dcc") - F.col("dq")).alias("score")
            )
        )
        wr = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())
        pick = (
            scored.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "vec_id",
                F.lit(r).cast("long").alias("mmr_rank"),
                F.col("score").cast("long").alias("score"),
            )
        )
        selected.append(pick)
    out = selected[0]
    for s in selected[1:]:
        out = out.unionByName(s)
    return out


@register(
    "q243_knn_label_agreement",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS v
        FROM embeddings
    ), pairs AS (
        SELECT a.vec_id, a.label AS own_label, b.label AS nb_label,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, 64),
                           i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i]))), (x, y) -> x + y)
                   ASC, b.vec_id ASC) AS rn
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )
    SELECT vec_id, CAST(MAX(own_label) AS BIGINT) AS label,
           CAST(SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
           CAST(SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END) AS DOUBLE) / 10.0
               AS agreement,
           CASE WHEN SUM(CASE WHEN nb_label = own_label THEN 1 ELSE 0 END) < 3
                THEN 1 ELSE 0 END AS flagged
    FROM pairs WHERE rn <= 10
    GROUP BY 1
    """,
    survey_ref="extension: kNN label-agreement audit — every vector's "
    "10 exact nearest neighbors vote on its label; low agreement flags "
    "probable mislabels (the label-noise screen run before training); "
    "exact integer distances, deterministic ties, N² here as the "
    "oracle-able baseline that composes with q53/q74's ANN at scale",
)
def q243_knn_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise detection on the embeddings table: for each vector,
    what fraction of its 10 nearest neighbors (exact integer-quantized
    L², self excluded) share its label? Vectors agreeing with fewer
    than 3 of 10 neighbors are flagged as likely mislabeled — the
    standard cleaning pass before fine-tuning on labeled corpora. The
    N×N scan is the exact baseline (same shape as q28); the production
    path swaps the candidate generator for IVF (q53) or LSH (q74)
    without touching the voting logic."""
    emb = load_table(spark, sf_dir, "embeddings")
    from stock_data_pipeline_spark.llm.clustering import _quantize

    e = emb.select("vec_id", "label", _quantize(F.col("embedding"), 10).alias("v"))
    a = e.select(
        F.col("vec_id").alias("a_id"), F.col("label").alias("own_label"), F.col("v").alias("av")
    )
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("label").alias("nb_label"), F.col("v").alias("bv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("av"), F.col("bv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("a_id").orderBy(F.col("_d").asc(), F.col("b_id").asc())
    n_agree = F.sum((F.col("nb_label") == F.col("own_label")).cast("long")).cast("long")
    return (
        a.join(b, F.col("a_id") != F.col("b_id"))
        .withColumn("_d", d2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy(F.col("a_id").alias("vec_id"))
        .agg(
            F.max("own_label").cast("long").alias("label"),
            n_agree.alias("n_agree"),
            (n_agree.cast("double") / 10.0).alias("agreement"),
            F.when(n_agree < 3, 1).otherwise(0).alias("flagged"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 19 (round 3): mergeable-sketch demo, exact KS test, imputation
# hierarchy, experiment sample-ratio check
# ---------------------------------------------------------------------------


@register(
    "q244_grouped_hll_merge",
    oracle=f"""
    WITH h1 AS (
        SELECT o_orderpriority AS grp, (o_custkey * 48271 + 11) % 2147483647 AS a,
               o_custkey
        FROM orders
    ), hashed AS (
        SELECT grp, o_custkey,
               xor((xor(a, a >> 16) * 69621) % 2147483647,
                   ((xor(a, a >> 16) * 69621) % 2147483647) >> 16) AS h
        FROM h1
    ), slots AS (
        SELECT grp, h % {_HLL_M} AS idx, h // {_HLL_M} AS w, o_custkey FROM hashed
    ), regs AS (
        SELECT grp, idx, MAX({_hll_rank_sql("w")}) AS m FROM slots GROUP BY 1, 2
    ), merged_regs AS (
        SELECT CAST('__merged__' AS VARCHAR) AS grp, idx, MAX(m) AS m FROM regs GROUP BY 2
    ), all_regs AS (
        SELECT * FROM regs UNION ALL SELECT * FROM merged_regs
    ), sketch AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hit,
               CAST(SUM({_hll_term_sql("m")}) AS BIGINT) AS z_present
        FROM all_regs GROUP BY 1
    ), truth AS (
        SELECT grp, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_distinct
        FROM slots GROUP BY 1
        UNION ALL
        SELECT '__merged__', COUNT(DISTINCT o_custkey) FROM slots
    ), est AS (
        SELECT s.grp, {_HLL_M} - s.n_hit AS n_empty,
               s.z_present + ({_HLL_M} - s.n_hit) * {1 << _HLL_WBITS} AS z_scaled,
               CAST('{_HLL_A}' AS DOUBLE) / CAST(s.z_present + ({_HLL_M} - s.n_hit) * {1 << _HLL_WBITS} AS DOUBLE)
                   AS raw_estimate,
               t.true_distinct
        FROM sketch s JOIN truth t ON s.grp = t.grp
    )
    SELECT grp,
           CASE WHEN raw_estimate <= {repr(2.5 * _HLL_M)} AND n_empty > 0
                THEN {_hll_lc_sql("n_empty")} ELSE raw_estimate END AS hll_estimate,
           true_distinct
    FROM est
    """,
    survey_ref="extension: grouped HyperLogLog + register-MAX merge — "
    "per-priority customer sketches and the '__merged__' global sketch "
    "built by MAX over the groups' registers (never re-reading the "
    "data); the mergeability property that makes HLL the cross-"
    "partition/cross-day cardinality primitive, demonstrated and "
    "value-oracled in one query",
)
def q244_grouped_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order priority AND overall, from ONE scan:
    each group keeps its 256 HLL registers, and the global sketch is
    the register-wise MAX of the group sketches — exactly how HLL
    state merges across partitions, executors, or daily rollups
    without touching raw data again. Per-group and merged estimates
    are corrected and reported against exact truth. At 100 TB you'd
    persist the per-day register tables (256 ints each) and answer
    'distinct over any date range' by MAX-merge — this query is that
    pattern, compacted."""
    o = load_table(spark, sf_dir, "orders")
    p = F.lit(_M31).cast("long")
    a = F.pmod(F.col("o_custkey") * 48271 + 11, p)
    b = F.pmod(a.bitwiseXOR(F.shiftright(a, 16)) * 69621, p)
    h = b.bitwiseXOR(F.shiftright(b, 16))
    idx = F.pmod(h, F.lit(_HLL_M).cast("long"))
    w = ((h - idx) / _HLL_M).cast("long")
    slots = o.select(
        F.col("o_orderpriority").alias("grp"),
        "o_custkey",
        idx.alias("idx"),
        _hll_rank_col(w).alias("rank"),
    )
    regs = slots.groupBy("grp", "idx").agg(F.max("rank").alias("m"))
    merged = regs.groupBy("idx").agg(F.max("m").alias("m")).select(
        F.lit("__merged__").alias("grp"), "idx", "m"
    )
    all_regs = regs.unionByName(merged)
    sketch = all_regs.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_hit"),
        F.sum(_hll_term_col(F.col("m"))).cast("long").alias("z_present"),
    )
    truth = (
        slots.groupBy("grp")
        .agg(F.countDistinct("o_custkey").cast("long").alias("true_distinct"))
        .unionByName(
            slots.agg(
                F.lit("__merged__").alias("grp"),
                F.countDistinct("o_custkey").cast("long").alias("true_distinct"),
            )
        )
    )
    n_empty = F.lit(_HLL_M).cast("long") - F.col("n_hit")
    z_scaled = F.col("z_present") + n_empty * (1 << _HLL_WBITS)
    raw = F.lit(float(_HLL_A)) / z_scaled.cast("double")
    est = sketch.join(truth, "grp").select(
        "grp", n_empty.alias("n_empty"), raw.alias("raw_estimate"), "true_distinct"
    )
    corrected = (
        F.when(
            (F.col("raw_estimate") <= float(repr(2.5 * _HLL_M))) & (F.col("n_empty") > 0),
            _hll_lc_col(F.col("n_empty")),
        )
        .otherwise(F.col("raw_estimate"))
    )
    return est.select("grp", corrected.alias("hll_estimate"), "true_distinct")


@register(
    "q245_ks_test",
    headline=True,
    oracle="""
    WITH tagged AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
        FROM lineitem
    ), vals AS (
        SELECT v, CAST(SUM(is_r) AS BIGINT) AS ca, CAST(SUM(1 - is_r) AS BIGINT) AS cb
        FROM tagged GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM vals
    ), cum AS (
        SELECT v,
               SUM(ca) OVER (ORDER BY v) AS cum_a,
               SUM(cb) OVER (ORDER BY v) AS cum_b
        FROM vals
    ), scored AS (
        SELECT CAST(abs(cum_a * nb - cum_b * na) AS DECIMAL(38,0)) * 16777216
               + (16777215 - v) AS enc,
               na, nb
        FROM cum CROSS JOIN tot
    )
    SELECT na AS n_returned, nb AS n_kept,
           -- subtract the remainder first: DECIMAL // rounds in DuckDB,
           -- so only divide exact multiples
           CAST((MAX(enc) - MAX(enc) % 16777216) // 16777216 AS BIGINT) AS d_scaled,
           CAST(16777215 - MAX(enc) % 16777216 AS BIGINT) AS at_value_cents,
           CAST(CAST((MAX(enc) - MAX(enc) % 16777216) // 16777216 AS BIGINT) AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_d
    FROM scored GROUP BY 1, 2
    """,
    survey_ref="extension: exact two-sample Kolmogorov-Smirnov distance "
    "(returned vs kept line-item prices) — D carried as the INTEGER "
    "max|cumA·nB − cumB·nA| with the argmax value packed into the same "
    "integer (deterministic ties); the Spark plan demonstrates the "
    "DISTRIBUTED PREFIX SUM (range partition → local cumsum → tiny "
    "per-partition offset broadcast), so no global single-partition "
    "window — the scalable form of q205's drift monitor",
)
def q245_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are returned items priced differently from kept ones? Exact KS
    distance between the two empirical CDFs, evaluated at every
    distinct price: D = max |F_A − F_B| scaled by n_A·n_B into an
    exact integer, argmax price packed into the low 24 bits so even
    the tie-break is deterministic cross-engine.

    The interesting part is HOW the cumulative is computed at scale:
    instead of one global ORDER BY window (single-partition — the
    WindowExec warning), the plan range-partitions the distinct values,
    cumsums WITHIN each partition, aggregates one total row per
    partition (≤16 rows), prefix-sums THAT tiny frame, and broadcasts
    the offsets back — the textbook two-phase distributed scan. Output
    values are identical to the naive window (asserted by the oracle
    match); only the physical shape changes."""
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        (_dec("l_extendedprice") * 100).cast("long").alias("v"),
        (F.col("l_returnflag") == "R").cast("long").alias("is_r"),
    )
    vals = tagged.groupBy("v").agg(
        F.sum("is_r").cast("long").alias("ca"),
        F.sum(1 - F.col("is_r")).cast("long").alias("cb"),
    )
    # deterministic order-preserving bucket id (v < 2^24, 16 buckets by
    # high bits): unlike repartitionByRange + spark_partition_id, the
    # bucket of a row never depends on sampled boundaries, so the two
    # consumers of this frame (local cumsum, per-bucket totals) always
    # agree
    pid = ((F.col("v") - F.pmod(F.col("v"), F.lit(1048576))) / 1048576).cast("long")
    ranged = vals.withColumn("pid", pid)
    w_in = (
        Window.partitionBy("pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "v", "pid",
        F.sum("ca").over(w_in).alias("la"),
        F.sum("cb").over(w_in).alias("lb"),
    )
    # Per-bucket totals NEED NO distinct-v aggregate: Σ_{v∈pid} ca(v) is
    # just Σ is_r over the bucket's raw rows, so ptot reads tagged
    # directly and map-side-collapses to ≤16 rows per task (r10 — the
    # old shape ran tot/ptot/local as three independent copies of the
    # full v-aggregate, and a join-inferred isnotnull(pid) pushed into
    # only one branch kept Catalyst from reusing their exchanges: the
    # static plan held 2 lineitem scans and 3 final v-aggregates doing
    # identical work; nulls group the same in one level or two, so the
    # regrouped long sums are value-identical)
    ptot = tagged.groupBy(
        (
            (F.col("v") - F.pmod(F.col("v"), F.lit(1048576))) / 1048576
        ).cast("long").alias("pid")
    ).agg(
        F.sum("is_r").alias("ta"), F.sum(1 - F.col("is_r")).alias("tb")
    )
    # one ≤16-row broadcast carries BOTH the per-bucket prefix offsets
    # and the grand totals (na/nb as unbounded-frame sums over the same
    # sort — same Window operator), replacing the old separate
    # tot-branch broadcast + BroadcastNestedLoopJoin; all sums are long
    # adds regrouped, value-identical to aggregating vals directly
    w_pid = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = ptot.select(
        "pid",
        F.coalesce(F.sum("ta").over(w_pid), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_pid), F.lit(0)).alias("ob"),
        F.sum("ta").over(w_all).cast("long").alias("na"),
        F.sum("tb").over(w_all).cast("long").alias("nb"),
    )
    cum = local.join(F.broadcast(offsets), "pid").select(
        "v",
        (F.col("oa") + F.col("la")).alias("cum_a"),
        (F.col("ob") + F.col("lb")).alias("cum_b"),
        "na",
        "nb",
    )
    scored = cum.select(
        (
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
            .cast("decimal(38,0)")
            * 16777216
            + (16777215 - F.col("v"))
        ).alias("enc"),
        "na",
        "nb",
    )
    enc_max = F.max("enc")
    d_scaled = (enc_max - F.pmod(enc_max, F.lit(16777216).cast("decimal(38,0)"))) / 16777216
    return scored.groupBy(
        F.col("na").alias("n_returned"), F.col("nb").alias("n_kept")
    ).agg(
        d_scaled.cast("long").alias("d_scaled"),
        (F.lit(16777215) - F.pmod(enc_max, F.lit(16777216).cast("decimal(38,0)")))
        .cast("long")
        .alias("at_value_cents"),
        (
            d_scaled.cast("double")
            / (F.first("na").cast("double") * F.first("nb").cast("double"))
        ).alias("ks_d"),
    )


@register(
    "q246_imputation_hierarchy",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey, n_regionkey,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ), clean AS (
        SELECT * FROM cust WHERE cents >= 0
    ), nat_med AS (
        SELECT c_nationkey, CAST(MAX(cnt) AS BIGINT) AS n, CAST(MAX(med) AS BIGINT) AS med
        FROM (
            SELECT c_nationkey, cents AS med,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY cents, c_custkey) AS rn,
                   COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt
            FROM clean
        ) WHERE rn = (cnt + 1) // 2
        GROUP BY 1
    ), reg_med AS (
        SELECT n_regionkey, CAST(MAX(med) AS BIGINT) AS med
        FROM (
            SELECT n_regionkey, cents AS med,
                   ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY cents, c_custkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_regionkey) AS cnt
            FROM clean
        ) WHERE rn = (cnt + 1) // 2
        GROUP BY 1
    ), glob_med AS (
        SELECT CAST(MAX(med) AS BIGINT) AS med FROM (
            SELECT cents AS med,
                   ROW_NUMBER() OVER (ORDER BY cents, c_custkey) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM clean
        ) WHERE rn = (cnt + 1) // 2
    )
    SELECT m.c_custkey, m.c_nationkey,
           CASE WHEN COALESCE(nm.n, 0) >= 20 THEN 'nation'
                WHEN rm.med IS NOT NULL THEN 'region'
                ELSE 'global' END AS imputed_from,
           CAST(CASE WHEN COALESCE(nm.n, 0) >= 20 THEN nm.med
                     WHEN rm.med IS NOT NULL THEN rm.med
                     ELSE g.med END AS BIGINT) AS imputed_cents
    FROM (SELECT * FROM cust WHERE cents < 0) m
    LEFT JOIN nat_med nm ON m.c_nationkey = nm.c_nationkey
    LEFT JOIN reg_med rm ON m.n_regionkey = rm.n_regionkey
    CROSS JOIN glob_med g
    """,
    survey_ref="extension: hierarchical median imputation — negative "
    "balances imputed from the nation median when the nation has ≥20 "
    "clean rows, else the region median, else global (exact lower "
    "medians, deterministic ties); the coalescing-fallback feature-"
    "engineering pattern for sparse categories",
)
def q246_imputation_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impute 'missing' (negative) account balances from a fallback
    hierarchy: nation median if the nation has enough clean support
    (≥20 rows), else region median, else global median — the standard
    sparse-category imputation ladder for feature pipelines. Medians
    are exact lower medians (rank = ⌈n/2⌉, ties by key), so every
    imputed value is reproducible. All three median frames reduce to
    tiny broadcast sides (25 nations / 5 regions / 1 row); the missing
    rows join against them without shuffling the fact table."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    base = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]).select(
        "c_custkey", "c_nationkey", "n_regionkey", (_dec("c_acctbal") * 100).cast("long").alias("cents")
    )
    clean = base.filter(F.col("cents") >= 0)

    def lower_median(df: DataFrame, keys: list[str]) -> DataFrame:
        if keys:
            wp = Window.partitionBy(*keys)
            ranked = df.select(
                *keys,
                "cents",
                F.row_number().over(wp.orderBy("cents", "c_custkey")).alias("rn"),
                F.count("*").over(wp).alias("cnt"),
            )
        else:
            # global median: constant partition keys constant-fold to an
            # unpartitioned (single-task) window, so rank via the
            # two-phase bucketed row_number instead ($1000 cents grain)
            keys = ["_g"]
            n_tot = df.agg(F.count(F.lit(1)).alias("cnt"))
            ranked = (
                ranks.bucketed_row_number(
                    df.select("cents", "c_custkey"),
                    F.col("cents") - F.pmod(F.col("cents"), F.lit(100000)),
                    [F.col("cents"), F.col("c_custkey")],
                    out="rn",
                )
                .crossJoin(F.broadcast(n_tot))
                .select(F.lit(1).alias("_g"), "cents", "rn", "cnt")
            )
        half = ((F.col("cnt") + 1) - F.pmod(F.col("cnt") + 1, F.lit(2))) / 2
        return (
            ranked.filter(F.col("rn") == half.cast("int"))
            .groupBy(*keys)
            .agg(F.count("*").alias("_one"), F.max("cents").cast("long").alias("med"),
                 F.max("cnt").cast("long").alias("n"))
            .drop("_one")
        )

    nat_med = lower_median(clean, ["c_nationkey"]).select(
        F.col("c_nationkey").alias("nk"), F.col("med").alias("nat_med"), F.col("n").alias("nat_n")
    )
    reg_med = lower_median(clean, ["n_regionkey"]).select(
        F.col("n_regionkey").alias("rk"), F.col("med").alias("reg_med")
    )
    glob = lower_median(clean, []).select(F.col("med").alias("glob_med"))
    missing = base.filter(F.col("cents") < 0)
    joined = (
        missing.join(F.broadcast(nat_med), missing["c_nationkey"] == nat_med["nk"], "left")
        .join(F.broadcast(reg_med), missing["n_regionkey"] == reg_med["rk"], "left")
        .crossJoin(F.broadcast(glob))
    )
    use_nation = F.coalesce(F.col("nat_n"), F.lit(0)) >= 20
    return joined.select(
        "c_custkey",
        "c_nationkey",
        F.when(use_nation, "nation")
        .when(F.col("reg_med").isNotNull(), "region")
        .otherwise("global")
        .alias("imputed_from"),
        F.when(use_nation, F.col("nat_med"))
        .when(F.col("reg_med").isNotNull(), F.col("reg_med"))
        .otherwise(F.col("glob_med"))
        .cast("long")
        .alias("imputed_cents"),
    )


@register(
    "q247_srm_check",
    oracle=f"""
    WITH assigned AS (
        SELECT ({_mix31_sql("o_orderkey")}) % 2 AS variant FROM orders
    ), counts AS (
        SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
               CAST(SUM(variant) AS BIGINT) AS n_treatment
        FROM assigned
    )
    SELECT n_control, n_treatment,
           (n_control - n_treatment) * (n_control - n_treatment) AS chi2_num,
           CAST((n_control - n_treatment) * (n_control - n_treatment) AS DOUBLE)
               / CAST(n_control + n_treatment AS DOUBLE) AS chi2,
           CASE WHEN CAST((n_control - n_treatment) * (n_control - n_treatment) AS DOUBLE)
                     / CAST(n_control + n_treatment AS DOUBLE) > 3.841458820694124e0
                THEN 1 ELSE 0 END AS srm_flag
    FROM counts
    """,
    survey_ref="extension: sample-ratio-mismatch check — hash-based "
    "50/50 assignment, χ²(1df) = (a−b)²/(a+b) with an exact integer "
    "numerator and the 0.05 critical value as a host literal; the "
    "experiment-health gate run before trusting any A/B readout "
    "(companion to q141's effect estimate)",
)
def q247_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the experiment's hash-based 50/50 split actually 50/50? The
    sample-ratio-mismatch χ² — the first thing to check before reading
    an A/B test (q141), because a biased assignment invalidates
    everything downstream. Assignment reuses the q224 portable mixer
    (deterministic, uniform); the statistic's numerator stays an exact
    integer and one double division + one literal comparison finish
    it. Scale: a pure map + one two-cell aggregate."""
    o = load_table(spark, sf_dir, "orders")
    variant = F.pmod(_mix31_col(F.col("o_orderkey")), F.lit(2).cast("long"))
    counts = o.select(variant.alias("variant")).agg(
        F.sum((F.col("variant") == 0).cast("long")).cast("long").alias("n_control"),
        F.sum("variant").cast("long").alias("n_treatment"),
    )
    diff = F.col("n_control") - F.col("n_treatment")
    chi2 = (diff * diff).cast("double") / (F.col("n_control") + F.col("n_treatment")).cast("double")
    return counts.select(
        "n_control",
        "n_treatment",
        (diff * diff).alias("chi2_num"),
        chi2.alias("chi2"),
        F.when(chi2 > 3.841458820694124, 1).otherwise(0).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Batch 20 (round 3): Hilbert layout, collocations, blocking quality,
# corpus similarity matrix, ANALYZE-style stats
# ---------------------------------------------------------------------------


def _hilbert_sql_chain(src: str, levels: int = 16) -> str:
    """Chained CTEs mirroring layout.with_hilbert level by level (the
    same per-level materialization that keeps the expression tree
    linear keeps this SQL text linear)."""
    n1 = 65535
    parts = [
        f"hh{levels} AS (SELECT *, zx AS hx, zy AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for lvl in range(levels - 1, -1, -1):
        s2 = 1 << (2 * lvl)
        rx = f"((hx >> {lvl}) & 1)"
        ry = f"((hy >> {lvl}) & 1)"
        parts.append(f"""hh{lvl} AS (
        SELECT * EXCLUDE (hx, hy, hd, nhx, nhy, nhd), nhx AS hx, nhy AS hy, nhd AS hd FROM (
            SELECT *,
                   CASE WHEN {ry} = 0 THEN
                        (CASE WHEN {rx} = 1 THEN {n1} - hy ELSE hy END)
                        ELSE hx END AS nhx,
                   CASE WHEN {ry} = 0 THEN
                        (CASE WHEN {rx} = 1 THEN {n1} - hx ELSE hx END)
                        ELSE hy END AS nhy,
                   hd + {s2} * xor(3 * {rx}, {ry}) AS nhd
            FROM hh{lvl + 1}
        )
    )""")
    return ",\n    ".join(parts)


@register(
    "q248_hilbert_layout",
    oracle=f"""
    WITH {_ZORDER_BASE_SQL},
    {_hilbert_sql_chain("zed")},
    banded AS (
        SELECT *,
               cmin + ((cmax - cmin) * 45) // 100 AS clo,
               cmin + ((cmax - cmin) * 55) // 100 AS chi,
               dmin + ((dmax - dmin) * 45) // 100 AS dlo,
               dmin + ((dmax - dmin) * 55) // 100 AS dhi,
               zval >> 26 AS z_file,
               hd >> 26 AS h_file
        FROM hh0
    ), match_cnt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS rows_matching
        FROM banded WHERE ck BETWEEN clo AND chi AND dd BETWEEN dlo AND dhi
    ), zmaps AS (
        SELECT 'hilbert' AS layout, h_file AS file_id, COUNT(*) AS n_rows,
               MIN(ck) AS ck_lo, MAX(ck) AS ck_hi, MIN(dd) AS dd_lo, MAX(dd) AS dd_hi,
               MIN(clo) AS clo, MIN(chi) AS chi, MIN(dlo) AS dlo, MIN(dhi) AS dhi
        FROM banded GROUP BY 2
        UNION ALL
        SELECT 'zorder', z_file, COUNT(*),
               MIN(ck), MAX(ck), MIN(dd), MAX(dd),
               MIN(clo), MIN(chi), MIN(dlo), MIN(dhi)
        FROM banded GROUP BY 2
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN ck_hi >= clo AND ck_lo <= chi
                          AND dd_hi >= dlo AND dd_lo <= dhi THEN 1 ELSE 0 END) AS BIGINT)
               AS files_scanned,
           CAST(SUM(CASE WHEN ck_hi >= clo AND ck_lo <= chi
                          AND dd_hi >= dlo AND dd_lo <= dhi THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_scanned,
           (SELECT rows_matching FROM match_cnt) AS rows_matching
    FROM zmaps
    GROUP BY 1
    """,
    survey_ref="extension: Hilbert-curve layout vs Z-order under the "
    "same 2-D band predicate and zone maps — the Hilbert walk "
    "(statically unrolled xy2d, one projection per level) never makes "
    "the Z-curve's quadrant jumps, so curve-contiguous files get "
    "tighter rectangles; completes the q195/q196 layout family with "
    "the curve Delta/Iceberg actually prefer",
)
def q248_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same experiment as q196 but comparing the two space-filling
    curves head-to-head: orders laid out in 64 files along (a) the
    Morton/Z curve, (b) the Hilbert curve, zone maps computed per
    file, and the identical 10%×10% (customer, day) band predicate
    pruned against both. Hilbert's locality (consecutive cells are
    always grid neighbors — no diagonal teleports at quadrant
    boundaries) yields files whose 2-D rectangles are at least as
    tight, typically strictly tighter, so fewer files survive pruning.
    The walk itself is 16 chained integer projections — each level ONE
    select materializing (x, y, d), keeping both the Catalyst plan and
    the generated oracle linear in the bit depth."""
    from stock_data_pipeline_spark.operators.layout import (
        norm16 as _n16,
        with_hilbert,
        zorder_assignment,
    )

    o = load_table(spark, sf_dir, "orders")
    epoch = F.lit("1970-01-01").cast("date")
    pts = o.select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate").cast("date"), epoch).cast("long").alias("dd"),
    )
    rng = pts.agg(
        F.min("ck").alias("cmin"), F.max("ck").alias("cmax"),
        F.min("dd").alias("dmin"), F.max("dd").alias("dmax"),
    )

    def idiv(a: F.Column, b: int) -> F.Column:
        bb = F.lit(b).cast("long")
        return ((a - F.pmod(a, bb)) / bb).cast("long")

    normed = (
        zorder_assignment(pts, "ck", "dd", n_files=64)
        .withColumnRenamed("file_id", "z_file")
        .crossJoin(F.broadcast(rng))
        .withColumn("zx", _n16(F.col("ck"), F.col("cmin"), F.col("cmax")))
        .withColumn("zy", _n16(F.col("dd"), F.col("dmin"), F.col("dmax")))
    )
    withh = with_hilbert(normed, "zx", "zy", "hd").withColumn(
        "h_file", F.shiftright(F.col("hd"), 26).cast("long")
    )
    banded = (
        withh
        .withColumn("clo", F.col("cmin") + idiv((F.col("cmax") - F.col("cmin")) * 45, 100))
        .withColumn("chi", F.col("cmin") + idiv((F.col("cmax") - F.col("cmin")) * 55, 100))
        .withColumn("dlo", F.col("dmin") + idiv((F.col("dmax") - F.col("dmin")) * 45, 100))
        .withColumn("dhi", F.col("dmin") + idiv((F.col("dmax") - F.col("dmin")) * 55, 100))
    )
    in_band = (
        F.col("ck").between(F.col("clo"), F.col("chi"))
        & F.col("dd").between(F.col("dlo"), F.col("dhi"))
    )
    match_cnt = banded.filter(in_band).agg(F.count("*").cast("long").alias("rows_matching"))
    maps = None
    for layout, fcol in (("hilbert", "h_file"), ("zorder", "z_file")):
        zm = banded.groupBy(F.col(fcol).alias("file_id")).agg(
            F.count("*").alias("n_rows"),
            F.min("ck").alias("ck_lo"), F.max("ck").alias("ck_hi"),
            F.min("dd").alias("dd_lo"), F.max("dd").alias("dd_hi"),
            F.min("clo").alias("clo"), F.min("chi").alias("chi"),
            F.min("dlo").alias("dlo"), F.min("dhi").alias("dhi"),
        ).withColumn("layout", F.lit(layout))
        maps = zm if maps is None else maps.unionByName(zm)
    survives = (
        (F.col("ck_hi") >= F.col("clo")) & (F.col("ck_lo") <= F.col("chi"))
        & (F.col("dd_hi") >= F.col("dlo")) & (F.col("dd_lo") <= F.col("dhi"))
    )
    return (
        maps.groupBy("layout")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum(survives.cast("long")).cast("long").alias("files_scanned"),
            F.sum(F.when(survives, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_scanned"),
        )
        .crossJoin(F.broadcast(match_cnt))
    )


@register(
    "q249_collocations",
    oracle="""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), bigrams AS (
        SELECT tk[i] AS w1, tk[i+1] AS w2
        FROM toks, unnest(generate_series(1, greatest(len(tk) - 1, 0))) AS t(i)
    ), bg AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS o FROM bigrams GROUP BY 1, 2
    ), ug AS (
        SELECT w1 AS w, CAST(COUNT(*) AS BIGINT) AS f FROM bigrams GROUP BY 1
    ), ug2 AS (
        SELECT w2 AS w, CAST(COUNT(*) AS BIGINT) AS f FROM bigrams GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bigrams
    ), scored AS (
        SELECT b.w1, b.w2, b.o,
               (CAST(b.o AS DOUBLE)
                - CAST(u1.f AS DOUBLE) * CAST(u2.f AS DOUBLE) / CAST(t.n AS DOUBLE))
               / sqrt(CAST(b.o AS DOUBLE)) AS t_score
        FROM bg b
        JOIN ug u1 ON u1.w = b.w1
        JOIN ug2 u2 ON u2.w = b.w2
        CROSS JOIN tot t
        WHERE b.o >= 5
    )
    SELECT w1, w2, o AS n_occurrences, t_score, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY t_score DESC, w1, w2) AS rnk FROM scored
    ) WHERE rnk <= 30
    """,
    survey_ref="extension: bigram collocation mining (t-score) — "
    "adjacent-pair counts vs independence expectation f(a)f(b)/N, "
    "t = (O − E)/√O; the corpus phrase-detection primitive (what "
    "feeds phrase-aware tokenizers), distinct from q127's basket lift "
    "in both unit (sequential bigrams) and statistic",
)
def q249_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which word pairs co-occur adjacently more than chance? Bigram
    t-scores: observed count vs the independence expectation from the
    unigram margins, top 30 (deterministic double ordering — identical
    operands both engines — with lexicographic tie-break). One
    posexplode + lead-free adjacency via index arithmetic, two margin
    aggregates that broadcast back, and a TakeOrdered top-k. The
    standard first pass of phrase detection / multi-word-expression
    mining over a 100 TB corpus."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select("doc_id", text.tokens(F.col("text")).alias("tk"))
    bigrams = toks.select(
        F.explode(
            F.expr("transform(sequence(1, greatest(size(tk) - 1, 0)), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")
        ).alias("b")
    ).select("b.w1", "b.w2")
    bg = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("o"))
    ug = bigrams.groupBy(F.col("w1").alias("w")).agg(F.count("*").cast("long").alias("f1"))
    ug2 = bigrams.groupBy(F.col("w2").alias("w")).agg(F.count("*").cast("long").alias("f2"))
    tot = bigrams.agg(F.count("*").cast("long").alias("n"))
    scored = (
        bg.filter(F.col("o") >= 5)
        .join(F.broadcast(ug), bg["w1"] == ug["w"])
        .join(F.broadcast(ug2), bg["w2"] == ug2["w"])
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "o",
            (
                (
                    F.col("o").cast("double")
                    - F.col("f1").cast("double") * F.col("f2").cast("double")
                    / F.col("n").cast("double")
                )
                / F.sqrt(F.col("o").cast("double"))
            ).alias("t_score"),
        )
    )
    w = Window.orderBy(F.col("t_score").desc(), F.col("w1"), F.col("w2"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 30)
        .select("w1", "w2", F.col("o").alias("n_occurrences"), "t_score", "rank")
    )


@register(
    "q250_blocking_quality",
    oracle=f"""
    WITH truth AS ({REGISTRY["q25_jaccard_pairs"].oracle}
    ), cand AS ({REGISTRY["q54_minhash_lsh_verified"].oracle}
    ), docs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), agg AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
               (SELECT COUNT(*) FROM cand) AS n_cand,
               (SELECT COUNT(*) FROM truth t JOIN cand c
                 ON t.id_a = c.id_a AND t.id_b = c.id_b) AS n_common,
               n_docs
        FROM docs
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_truth AS BIGINT) AS n_truth_pairs,
           CAST(n_cand AS BIGINT) AS n_candidate_pairs,
           CAST(n_common AS BIGINT) AS n_common,
           CASE WHEN n_truth > 0
                THEN CAST(n_common AS DOUBLE) / CAST(n_truth AS DOUBLE)
                ELSE 1.0 END AS pairs_completeness,
           1.0 - CAST(n_cand AS DOUBLE)
               / (CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - 1.0) / 2.0)
               AS reduction_ratio
    FROM agg
    """,
    survey_ref="extension: blocking-quality evaluation — pairs "
    "completeness (recall of MinHash-LSH candidates vs the exact "
    "Jaccard≥0.8 truth) and reduction ratio (candidates vs all N(N−1)/2 "
    "pairs) in one row; the standard entity-resolution/dedup metric "
    "pair used to TUNE band/row parameters before a 100 TB run",
)
def q250_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How good is the LSH blocking, measured properly? Pairs
    completeness = |candidates ∩ true near-dups| / |true near-dups|
    (how much recall the bands keep) and reduction ratio = 1 −
    |candidates| / C(N,2) (how much work they avoid). Reuses the exact
    q25 pipeline as truth and the fully-oracled q54 MinHash pipeline as
    the candidate generator — the evaluation itself is two counts and
    one inner join on the pair key. This is the measurement loop you
    run at small scale to pick (bands, rows) before paying for the
    full corpus."""
    truth = REGISTRY["q25_jaccard_pairs"].fn(spark, sf_dir).select("id_a", "id_b")
    cand = REGISTRY["q54_minhash_lsh_verified"].fn(spark, sf_dir).select("id_a", "id_b")
    docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    n_truth = truth.agg(F.count("*").cast("long").alias("n_truth"))
    n_cand = cand.agg(F.count("*").cast("long").alias("n_cand"))
    n_common = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count("*").cast("long").alias("n_common")
    )
    nd = F.col("n_docs").cast("double")
    return (
        docs.crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_docs",
            F.col("n_truth").alias("n_truth_pairs"),
            F.col("n_cand").alias("n_candidate_pairs"),
            "n_common",
            F.when(
                F.col("n_truth") > 0,
                F.col("n_common").cast("double") / F.col("n_truth").cast("double"),
            )
            .otherwise(F.lit(1.0))
            .alias("pairs_completeness"),
            (F.lit(1.0) - F.col("n_cand").cast("double") / (nd * (nd - 1.0) / 2.0)).alias(
                "reduction_ratio"
            ),
        )
    )


@register(
    "q251_source_similarity",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT source, tok FROM (
            SELECT source,
                   unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
            FROM documents
        )
    ), sz AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS sz FROM vocab GROUP BY 1
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM vocab a JOIN vocab b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_inter,
           CAST(n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.source = src_a
    JOIN sz sb ON sb.source = src_b
    """,
    survey_ref="extension: source-level vocabulary similarity matrix — "
    "pairwise Jaccard between every source's distinct-token set via one "
    "postings self-join (shuffle ∝ (source, token) postings, never "
    "docs²); the corpus-curation view that flags mirrored/derivative "
    "sources before dedup even runs",
)
def q251_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which document sources share a vocabulary? Pairwise Jaccard
    similarity over each source's distinct token set: one (source,
    token) postings table, a self-join on the token (the same postings
    shape as q25 — work ∝ postings, with hot tokens cappable by
    document frequency), set sizes broadcast back for the final
    |A∩B|/|A∪B|. At corpus scale this is the triage step that spots
    mirror sites and derivative scrapes at the SOURCE level — far
    cheaper than document-pair dedup — before q26/q49 run."""
    doc = load_table(spark, sf_dir, "documents")
    vocab = (
        doc.select("source", F.explode(text.tokens(F.col("text"))).alias("tok")).distinct()
    )
    sz = vocab.groupBy("source").agg(F.count("*").cast("long").alias("sz"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("sz").alias("sz_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_inter",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


@register(
    "q252_analyze_stats",
    oracle="""
    SELECT 'orders' AS tbl, 'o_orderkey' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'orders', 'o_orderpriority', COUNT(*),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'orders', 'o_totalprice_cents', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)),
           CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'orders', 'o_orderdate', COUNT(*),
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT CAST(o_orderdate AS DATE)),
           strftime(MIN(CAST(o_orderdate AS DATE)), '%Y-%m-%d'),
           strftime(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
    FROM orders
    UNION ALL
    SELECT 'customer', 'c_mktsegment', COUNT(*),
           CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_mktsegment),
           MIN(c_mktsegment), MAX(c_mktsegment)
    FROM customer
    UNION ALL
    SELECT 'customer', 'c_acctbal_cents', COUNT(*),
           CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)),
           CAST(MIN(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS VARCHAR)
    FROM customer
    """,
    survey_ref="extension: ANALYZE-style catalog statistics — per-column "
    "(rows, nulls, NDV, min, max) for the optimizer's cost model, "
    "normalized to engine-neutral strings; the statistics q207/q208's "
    "estimators and q220's join advisor consume",
)
def q252_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
    equivalent: per-column row count, null count, exact NDV, and
    min/max rendered engine-neutrally (money as integer cents, dates
    as ISO strings). One aggregate per table feeding several column
    rows; at scale you'd swap exact NDV for the q224 HLL registers —
    the output contract (what the CBO consumes) stays identical.
    These are the inputs the join-strategy advisor (q220) and the
    selectivity estimators (q207/q208) assume exist."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents_o = (_dec("o_totalprice") * 100).cast("long")
    cents_c = (_dec("c_acctbal") * 100).cast("long")

    def stats(df: DataFrame, tbl: str, col_name: str, expr: F.Column,
              as_str: Callable[[F.Column], F.Column]) -> DataFrame:
        return df.agg(
            F.lit(tbl).alias("tbl"),
            F.lit(col_name).alias("col"),
            F.count("*").cast("long").alias("n_rows"),
            F.sum(expr.isNull().cast("long")).cast("long").alias("n_null"),
            F.countDistinct(expr).cast("long").alias("n_distinct"),
            as_str(F.min(expr)).alias("min_val"),
            as_str(F.max(expr)).alias("max_val"),
        )

    s = F.lit  # noqa: F841  (kept for readability of the table below)
    as_plain = lambda c: c.cast("string")  # noqa: E731
    as_date = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    parts = [
        stats(orders, "orders", "o_orderkey", F.col("o_orderkey"), as_plain),
        stats(orders, "orders", "o_orderpriority", F.col("o_orderpriority"), as_plain),
        stats(orders, "orders", "o_totalprice_cents", cents_o, as_plain),
        stats(orders, "orders", "o_orderdate", F.col("o_orderdate").cast("date"), as_date),
        stats(cust, "customer", "c_mktsegment", F.col("c_mktsegment"), as_plain),
        stats(cust, "customer", "c_acctbal_cents", cents_c, as_plain),
    ]
    out = parts[0]
    for prt in parts[1:]:
        out = out.unionByName(prt)
    return out


# ---------------------------------------------------------------------------
# Batch 21 (round 3): 3-D skyline, CRDT merge, corpus data card,
# Theil-Sen robust trend
# ---------------------------------------------------------------------------


@register(
    "q253_skyline_3d",
    oracle="""
    WITH pts AS (
        SELECT c.c_custkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
               CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100), 0) AS BIGINT)
                   AS spend,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    )
    SELECT a.c_custkey, a.bal, a.spend, a.n_orders
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.bal >= a.bal AND b.spend >= a.spend AND b.n_orders >= a.n_orders
          AND (b.bal > a.bal OR b.spend > a.spend OR b.n_orders > a.n_orders)
    )
    """,
    survey_ref="extension: 3-D skyline (Pareto-optimal set) — customers "
    "not dominated on (balance, lifetime spend, order count) "
    "simultaneously, via a dominance anti-join; extends q140's 2-D "
    "frontier to the multi-criteria form, exact integers throughout",
)
def q253_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto-optimal customers across three maximize-criteria: no
    other customer is ≥ on all of (balance, spend, order count) and
    > on one. Computed with the EXACT two-phase divide-and-conquer:

    1. partition points into coarse (bal, spend) grid cells and take
       each cell's LOCAL skyline (dominance anti-join within the cell —
       quadratic only in the cell's population);
    2. take the skyline of the union of local skylines.

    Correct because dominance is transitive: any globally dominated
    point is dominated by some globally non-dominated point, and every
    globally non-dominated point survives its cell's local pass — so
    phase 2's candidate set contains the answer and comparing
    candidates against candidates suffices. At 100 TB phase 1 is
    cell-partitioned (embarrassingly parallel, the q232 bucketing),
    and phase 2 runs on the tiny candidate union — the full table
    never self-joins. Same output as the naive N² anti-join (the
    oracle computes exactly that, so the match proves equivalence)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pts = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", (_dec("c_acctbal") * 100).cast("long").alias("bal"))
        .agg(
            F.coalesce(F.sum((_dec("o_totalprice") * 100).cast("long")), F.lit(0))
            .cast("long")
            .alias("spend"),
            F.count("o_orderkey").cast("long").alias("n_orders"),
        )
    )
    cell = (
        ((F.col("bal") - F.pmod(F.col("bal"), F.lit(100000))) / 100000).cast("long") * 1000
        + ((F.col("spend") - F.pmod(F.col("spend"), F.lit(10000000))) / 10000000).cast("long")
    )
    celled = pts.withColumn("cell", cell)

    def dominated(a: str, b: str) -> F.Column:
        return (
            (F.col(f"{b}.bal") >= F.col(f"{a}.bal"))
            & (F.col(f"{b}.spend") >= F.col(f"{a}.spend"))
            & (F.col(f"{b}.n_orders") >= F.col(f"{a}.n_orders"))
            & (
                (F.col(f"{b}.bal") > F.col(f"{a}.bal"))
                | (F.col(f"{b}.spend") > F.col(f"{a}.spend"))
                | (F.col(f"{b}.n_orders") > F.col(f"{a}.n_orders"))
            )
        )

    la, lb = celled.alias("a"), celled.alias("b")
    local_sky = la.join(
        lb, (F.col("a.cell") == F.col("b.cell")) & dominated("a", "b"), "left_anti"
    ).select("c_custkey", "bal", "spend", "n_orders")
    ca, cb = local_sky.alias("a"), local_sky.alias("b")
    return ca.join(cb, dominated("a", "b"), "left_anti").select(
        "c_custkey", "bal", "spend", "n_orders"
    )


@register(
    "q254_crdt_counter_merge",
    oracle="""
    WITH tagged AS (
        SELECT user_id, event_id % 3 AS replica,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS inc,
               event_id,
               MAX(event_id) OVER () // 2 AS half
        FROM events WHERE event_type IN ('click', 'error')
    ), site_b AS (  -- the site that has seen everything
        SELECT user_id, replica,
               CAST(SUM(inc) AS BIGINT) AS p, CAST(SUM(1 - inc) AS BIGINT) AS n
        FROM tagged GROUP BY 1, 2
    ), site_a AS (  -- a replica snapshot: only the first half of event ids
        SELECT user_id, replica,
               CAST(SUM(inc) AS BIGINT) AS p, CAST(SUM(1 - inc) AS BIGINT) AS n
        FROM tagged
        WHERE event_id <= half
        GROUP BY 1, 2
    ), merged AS (
        SELECT COALESCE(a.user_id, b.user_id) AS user_id,
               COALESCE(a.replica, b.replica) AS replica,
               greatest(COALESCE(a.p, 0), COALESCE(b.p, 0)) AS p,
               greatest(COALESCE(a.n, 0), COALESCE(b.n, 0)) AS n
        FROM site_a a FULL OUTER JOIN site_b b
          ON a.user_id = b.user_id AND a.replica = b.replica
    )
    SELECT m.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_replicas,
           CAST(SUM(m.p) - SUM(m.n) AS BIGINT) AS merged_value,
           CAST(d.direct AS BIGINT) AS direct_value
    FROM merged m
    JOIN (SELECT user_id, SUM(CASE WHEN inc = 1 THEN 1 ELSE -1 END) AS direct
          FROM tagged GROUP BY 1) d
      ON d.user_id = m.user_id
    GROUP BY 1, 4
    """,
    survey_ref="extension: CRDT PN-counter merge — per-(user, replica) "
    "increment/decrement grows monotonically, replica states merge by "
    "element-wise MAX, and the merged value provably equals the "
    "direct count (site A's stale snapshot is absorbed); the "
    "conflict-free replicated aggregation pattern behind multi-region "
    "counters, expressed and value-oracled relationally",
)
def q254_crdt_counter_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PN-counter semantics over the events table: clicks increment,
    errors decrement, each replica (event_id mod 3) keeps monotone
    (P, N) totals. Site A holds a stale snapshot (first half of event
    ids), site B the full state; CRDT merge is element-wise MAX per
    replica — and because A's state is a prefix of B's, the merged
    value must equal B's direct count, which the query emits
    side-by-side (and the oracle verifies value-for-value). This is
    the convergence property that lets 100 TB of regional counters
    reconcile without coordination: merge is commutative, associative,
    idempotent — a groupBy MAX."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type").isin("click", "error"))
    tagged = ev.select(
        "user_id",
        F.pmod(F.col("event_id"), F.lit(3)).alias("replica"),
        (F.col("event_type") == "click").cast("long").alias("inc"),
        "event_id",
    )
    max_id = tagged.agg(F.max("event_id").alias("mx"))
    half = F.col("mx") - F.pmod(F.col("mx"), F.lit(2))

    def site(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "replica").agg(
            F.sum("inc").cast("long").alias("p"),
            F.sum(1 - F.col("inc")).cast("long").alias("n"),
        )

    site_b = site(tagged).alias("b")
    site_a = site(
        tagged.crossJoin(F.broadcast(max_id)).filter(
            F.col("event_id") <= (half / 2).cast("long")
        )
    ).alias("a")
    merged = (
        site_a.join(
            site_b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.replica") == F.col("b.replica")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
            F.coalesce(F.col("a.replica"), F.col("b.replica")).alias("replica"),
            F.greatest(F.coalesce(F.col("a.p"), F.lit(0)), F.coalesce(F.col("b.p"), F.lit(0))).alias("p"),
            F.greatest(F.coalesce(F.col("a.n"), F.lit(0)), F.coalesce(F.col("b.n"), F.lit(0))).alias("n"),
        )
    )
    direct = tagged.groupBy("user_id").agg(
        F.sum(F.when(F.col("inc") == 1, 1).otherwise(-1)).cast("long").alias("direct")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_replicas"),
            (F.sum("p") - F.sum("n")).cast("long").alias("merged_value"),
        )
        .join(direct, "user_id")
        .select("user_id", "n_replicas", "merged_value", F.col("direct").cast("long").alias("direct_value"))
    )


@register(
    "q255_data_card",
    oracle="""
    WITH toks AS (
        SELECT doc_id, text, lang, source,
               len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_toks
        FROM documents
    ), base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique_texts,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(CASE WHEN n_toks BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_length_pass
        FROM toks
    ), langs AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1
    )
    SELECT 'n_documents' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
    UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
    UNION ALL SELECT 'mean_tokens_per_doc',
        CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM base
    UNION ALL SELECT 'exact_dup_rate',
        1.0 - CAST(n_unique_texts AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM base
    UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM base
    UNION ALL SELECT 'length_pass_rate',
        CAST(n_length_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) FROM base
    UNION ALL
    SELECT 'lang_share:' || lang, CAST(c AS DOUBLE) / (SELECT CAST(n_docs AS DOUBLE) FROM base)
    FROM langs
    """,
    survey_ref="extension: dataset card — the datasheet a corpus release "
    "ships with (doc/token counts, exact-dup rate, source count, "
    "length-filter pass rate, language shares) produced by ONE scan + "
    "tiny unions; the summary q78's filter pipeline and q191's mixer "
    "are tuned against",
)
def q255_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan dataset datasheet for the documents corpus: volume
    (docs, tokens, mean length), integrity (exact-duplicate rate via
    distinct-text), provenance (source count), quality (length-filter
    pass rate), and language composition as share-per-language rows.
    Every number a model card's 'training data' section quotes, as one
    metric/value frame — cheap enough to regenerate per corpus
    snapshot and diff across releases (q229's snapshot-diff applies to
    the card itself)."""
    doc = load_table(spark, sf_dir, "documents")
    toks = doc.select(
        "doc_id", "text", "lang", "source", F.size(text.tokens(F.col("text"))).alias("n_toks")
    )
    base = toks.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.countDistinct("text").cast("long").alias("n_unique_texts"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum(F.col("n_toks").between(50, 100000).cast("long"))
        .cast("long")
        .alias("n_length_pass"),
    )
    langs = toks.groupBy("lang").agg(F.count("*").cast("long").alias("c"))

    def row(metric: str, value: F.Column) -> DataFrame:
        return base.select(F.lit(metric).alias("metric"), value.alias("value"))

    nd = F.col("n_docs").cast("double")
    out = row("n_documents", nd)
    out = out.unionByName(row("n_tokens", F.col("n_tokens").cast("double")))
    out = out.unionByName(row("mean_tokens_per_doc", F.col("n_tokens").cast("double") / nd))
    out = out.unionByName(
        row("exact_dup_rate", F.lit(1.0) - F.col("n_unique_texts").cast("double") / nd)
    )
    out = out.unionByName(row("n_sources", F.col("n_sources").cast("double")))
    out = out.unionByName(
        row("length_pass_rate", F.col("n_length_pass").cast("double") / nd)
    )
    lang_rows = langs.crossJoin(F.broadcast(base)).select(
        F.concat(F.lit("lang_share:"), F.col("lang")).alias("metric"),
        (F.col("c").cast("double") / F.col("n_docs").cast("double")).alias("value"),
    )
    return out.unionByName(lang_rows)


@register(
    "q256_theil_sen",
    oracle="""
    WITH monthly AS (
        SELECT o_orderpriority,
               CAST((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
                    + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS x,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
        FROM orders GROUP BY 1, 2
    ), slopes AS (
        SELECT a.o_orderpriority,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope,
               a.x AS x1, b.x AS x2
        FROM monthly a JOIN monthly b
          ON a.o_orderpriority = b.o_orderpriority AND a.x < b.x
    ), ranked AS (
        SELECT o_orderpriority, slope,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY slope, x1, x2) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
        FROM slopes
    )
    SELECT o_orderpriority,
           CAST(MAX(cnt) AS BIGINT) AS n_pairs,
           MAX(slope) AS median_slope_cents_per_month
    FROM ranked WHERE rn = (cnt + 1) // 2
    GROUP BY 1
    """,
    survey_ref="extension: Theil-Sen robust trend — the exact lower-"
    "median of all pairwise monthly-revenue slopes per priority "
    "(deterministic slope ties by the month pair); the outlier-immune "
    "companion to q202's OLS, with the pair blowup bounded by "
    "aggregating to months FIRST (the always-apply trick at scale)",
)
def q256_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust revenue trend per priority: the Theil-Sen estimator —
    median of all pairwise slopes — immune to the outlier months that
    drag OLS (q202). The O(n²) pair step is taken AFTER aggregating to
    monthly points (~80 per priority), so the pair count stays in the
    thousands regardless of raw data size: reduce-first is what makes
    the robust estimator affordable at 100 TB. Slopes divide identical
    integer operands in both engines; the median is the deterministic
    lower median with (x1, x2) tie-break."""
    o = load_table(spark, sf_dir, "orders")
    month = (
        (F.year(F.col("o_orderdate")) - 1995) * 12 + F.month(F.col("o_orderdate")) - 1
    ).cast("long")
    monthly = o.groupBy("o_orderpriority", month.alias("x")).agg(
        F.sum((_dec("o_totalprice") * 100).cast("long")).cast("long").alias("y")
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
    )
    wp = Window.partitionBy("o_orderpriority")
    ranked = slopes.select(
        "o_orderpriority",
        "slope",
        F.row_number().over(wp.orderBy("slope", "x1", "x2")).alias("rn"),
        F.count("*").over(wp).alias("cnt"),
    )
    half = ((F.col("cnt") + 1) - F.pmod(F.col("cnt") + 1, F.lit(2))) / 2
    return (
        ranked.filter(F.col("rn") == half.cast("int"))
        .groupBy("o_orderpriority")
        .agg(
            F.max("cnt").cast("long").alias("n_pairs"),
            F.max("slope").alias("median_slope_cents_per_month"),
        )
    )
