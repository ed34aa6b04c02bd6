"""Queries: BPE/tokenizer, retrieval-eval and off-policy queries (q302-q332).

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
    _LANG_HIT,
    _dec,
    _duck_tokens,
    dedup,
    load_events,
    load_table,
    register,
    similarity,
    text,
)
from ._p4_rankings_linkage import _Q222_SCORE_SQL, _mix31_col, _mix31_sql
from ._p5_sketches_multimodal import _BPE_SEP




@register(
    "q302_bpe_merge_apply",
    oracle="""
    WITH toks AS (
        -- tokens containing the fold separator chr(31) are dropped (not
        -- just assumed absent): one inside a token would silently
        -- re-split during the between-fold resplit
        SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                   t -> t <> '' AND NOT contains(t, chr(31))) AS tk
        FROM documents
    ), prs AS (
        SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                      i -> {'lt': tk[i], 'rt': tk[i + 1]})) AS p
        FROM toks WHERE len(tk) > 1
    ), cnt AS (
        SELECT p.lt AS lt, p.rt AS rt, CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM prs
        WHERE p.lt NOT LIKE '%+%' AND p.rt NOT LIKE '%+%'
        GROUP BY 1, 2
    ), top5 AS (
        SELECT lt, rt, ROW_NUMBER() OVER (ORDER BY pair_count DESC, lt, rt) AS rnk
        FROM cnt QUALIFY rnk <= 5
    ), rules AS (
        SELECT MAX(CASE WHEN rnk = 1 THEN lt END) AS lt1, MAX(CASE WHEN rnk = 1 THEN rt END) AS rt1,
               MAX(CASE WHEN rnk = 2 THEN lt END) AS lt2, MAX(CASE WHEN rnk = 2 THEN rt END) AS rt2,
               MAX(CASE WHEN rnk = 3 THEN lt END) AS lt3, MAX(CASE WHEN rnk = 3 THEN rt END) AS rt3,
               MAX(CASE WHEN rnk = 4 THEN lt END) AS lt4, MAX(CASE WHEN rnk = 4 THEN rt END) AS rt4,
               MAX(CASE WHEN rnk = 5 THEN lt END) AS lt5, MAX(CASE WHEN rnk = 5 THEN rt END) AS rt5
        FROM top5
    ), folded AS (
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tok_raw,
        list_reduce(list_prepend('', list_transform(
        string_split(
        list_reduce(list_prepend('', list_transform(
        string_split(
        list_reduce(list_prepend('', list_transform(
        string_split(
        list_reduce(list_prepend('', list_transform(
        string_split(
        list_reduce(list_prepend('', tk),
            (a, t) -> CASE WHEN ends_with(a, chr(31) || lt1) AND t = rt1
                           THEN a || '+' || t ELSE a || chr(31) || t END),
        chr(31)), x -> x)[2:]),
            (a, t) -> CASE WHEN ends_with(a, chr(31) || lt2) AND t = rt2
                           THEN a || '+' || t ELSE a || chr(31) || t END),
        chr(31)), x -> x)[2:]),
            (a, t) -> CASE WHEN ends_with(a, chr(31) || lt3) AND t = rt3
                           THEN a || '+' || t ELSE a || chr(31) || t END),
        chr(31)), x -> x)[2:]),
            (a, t) -> CASE WHEN ends_with(a, chr(31) || lt4) AND t = rt4
                           THEN a || '+' || t ELSE a || chr(31) || t END),
        chr(31)), x -> x)[2:]),
            (a, t) -> CASE WHEN ends_with(a, chr(31) || lt5) AND t = rt5
                           THEN a || '+' || t ELSE a || chr(31) || t END) AS acc
        FROM toks CROSS JOIN rules
    )
    SELECT doc_id, n_tok_raw,
           CAST(length(acc) - length(replace(acc, chr(31), '')) AS BIGINT) AS n_tok_bpe,
           CAST(n_tok_raw - (length(acc) - length(replace(acc, chr(31), ''))) AS BIGINT) AS n_merges,
           array_to_string(string_split(acc, chr(31))[2:9], ' ') AS bpe_head
    FROM folded
    """,
    survey_ref="extension: BPE merge APPLICATION — the tokenizer-side "
    "half of q75's pair counting: the top-5 learned merges applied to "
    "every document by a greedy left-to-right fold, identical on both "
    "engines (the step a 100 TB pre-tokenization pass runs per shard)",
)
def q302_bpe_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus's top-5 learned merge rules (q75's ranking,
    restricted to '+'-free tokens so merged symbols can never collide
    with raw ones) to every document: one greedy left-to-right pass per
    rule in rank order, merging each adjacent (lt, rt) occurrence into
    'lt+rt' — the standard BPE tokenizer application discipline,
    word-level here like q75's trainer.

    Both engines run the IDENTICAL fold: the accumulator is the token
    stream joined by chr(31) (tokens containing the separator are
    dropped up front on both engines — never silently re-split), a merge
    appends '+rt' to the trailing 'lt', a non-merge appends the
    separator + token; overlap resolution (e.g. [a,a,a] under (a,a) →
    [a+a, a]) falls out of the fold because a merged trail no longer
    suffix-matches the rule.

    Scale: rule learning is q75's one pair-count shuffle reduced to 5
    rows; the 1-row rule table broadcasts; application is row-local
    (5 linear passes per doc, no shuffle) — exactly how a tokenizer
    pass runs over a 100 TB corpus.
    """
    doc = load_table(spark, sf_dir, "documents")
    # drop (never silently re-split) any token containing the fold
    # separator — mirrors the oracle's chr(31) filter
    tks = doc.select(
        "doc_id",
        F.filter(
            text.tokens(F.col("text")), lambda t: ~t.contains(_BPE_SEP)
        ).alias("tk"),
    )
    plus_free = lambda c: ~F.col(c).contains("+")  # noqa: E731
    pairs = (
        tks.filter(F.size("tk") > 1)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at("tk", i).alias("lt"),
                        F.element_at("tk", i + 1).alias("rt"),
                    ),
                )
            ).alias("p")
        )
        .select("p.lt", "p.rt")
        .filter(plus_free("lt") & plus_free("rt"))
        .groupBy("lt", "rt")
        .agg(F.count("*").cast("long").alias("pair_count"))
    )
    top5 = pairs.orderBy(F.col("pair_count").desc(), "lt", "rt").limit(5)
    wr = Window.orderBy(F.col("pair_count").desc(), "lt", "rt")
    ranked = top5.withColumn("rnk", F.row_number().over(wr))
    rules = ranked.agg(
        *[
            F.max(F.when(F.col("rnk") == i, F.col(c))).alias(f"{c}{i}")
            for i in range(1, 6)
            for c in ("lt", "rt")
        ]
    )

    sep = F.lit(_BPE_SEP)

    def fold(arr: F.Column, lt: F.Column, rt: F.Column) -> F.Column:
        return F.aggregate(
            arr,
            F.lit(""),
            lambda a, t: F.when(
                a.endswith(F.concat(sep, lt)) & (t == rt),
                F.concat(a, F.lit("+"), t),
            ).otherwise(F.concat(a, sep, t)),
        )

    def resplit(acc: F.Column) -> F.Column:
        # drop the leading '' element the leading separator creates
        return F.slice(F.split(acc, _BPE_SEP), 2, 2_000_000_000)

    df = tks.join(F.broadcast(rules))
    acc = F.col("tk")
    for i in range(1, 6):
        acc = fold(acc if i == 1 else resplit(acc), F.col(f"lt{i}"), F.col(f"rt{i}"))
    n_bpe = (F.length(acc) - F.length(F.regexp_replace(acc, _BPE_SEP, ""))).cast("long")
    return df.select(
        "doc_id",
        F.size("tk").cast("long").alias("n_tok_raw"),
        n_bpe.alias("n_tok_bpe"),
        (F.size("tk").cast("long") - n_bpe).alias("n_merges"),
        F.concat_ws(" ", F.slice(F.split(acc, _BPE_SEP), 2, 8)).alias("bpe_head"),
    )


import math as _math

_NDCG_K = 10
_NDCG_W = [1.0 / _math.log2(i + 1) for i in range(1, _NDCG_K + 1)]
_NDCG_IDCG = sum((_NDCG_K + 1 - i) * _NDCG_W[i - 1] for i in range(1, _NDCG_K + 1))
_NDCG_W_SQL = "[" + ", ".join(f"{w!r}e0" for w in _NDCG_W) + "]"


@register(
    "q303_ndcg_truncated",
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
        SELECT query_id, vec_id, rn AS frank FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 64),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= {_NDCG_K}
    ), trunc_top AS (
        SELECT query_id, vec_id, rn AS trank FROM (
            SELECT q.query_id, c.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                       list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(1, 16),
                               i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))), (a, b) -> a + b)
                       ASC, c.vec_id ASC) AS rn
            FROM q CROSS JOIN c
        ) WHERE rn <= {_NDCG_K}
    ), contrib AS (
        SELECT t.query_id, t.trank,
               CAST(COALESCE({_NDCG_K} + 1 - f.frank, 0) AS BIGINT) AS gain,
               CAST(COALESCE({_NDCG_K} + 1 - f.frank, 0) AS DOUBLE)
                   * ({_NDCG_W_SQL})[t.trank] AS dc
        FROM trunc_top t
        LEFT JOIN full_top f ON f.query_id = t.query_id AND f.vec_id = t.vec_id
    )
    SELECT query_id,
           CAST(SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dc ORDER BY trank)),
                       (a, b) -> a + b) AS dcg,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dc ORDER BY trank)),
                       (a, b) -> a + b) / {_NDCG_IDCG!r}e0 AS ndcg
    FROM contrib
    GROUP BY 1
    """,
    survey_ref="extension: nDCG@10 of the 16-dim truncated ranking "
    "against the full 64-dim exact ranking — q219's recall upgraded to "
    "the graded position-discounted metric (gain = 11 − exact rank, "
    "log2 discounts and the constant IDCG as host-generated literals, "
    "fold pinned in position order)",
)
def q303_ndcg_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the cheap 16-dim-prefix retrieval, graded by the full
    64-dim exact ranking (gain 10..1 for exact ranks 1..10, else 0) —
    the standard eval a dimension-budget decision actually reads
    (recall@10 treats rank 1 and rank 10 alike; nDCG doesn't).

    Engine-exact float discipline: gains are integers, the 1/log2(i+1)
    discount table and the constant IDCG (every query has exactly 10
    graded-relevant docs) are host-generated literals shared with the
    oracle, and each query's 10 products fold in trank order. Shapes:
    both rankings share q28's crossJoin(broadcast(queries)) scan; the
    rank join is per-query top-k only (k² rows per query, corpus-
    independent) — q219's scale story unchanged. The ranker is the
    shared ``similarity.quantized_prefix_topk``."""
    emb = load_table(spark, sf_dir, "embeddings")

    full = similarity.quantized_prefix_topk(emb, 64, _NDCG_K, "frank")
    trunc = similarity.quantized_prefix_topk(emb, 16, _NDCG_K, "trank")
    gain = F.coalesce(F.lit(_NDCG_K + 1) - full["frank"], F.lit(0)).cast("long")
    wtab = F.array(*[F.lit(w) for w in _NDCG_W])
    joined = (
        trunc.join(
            full,
            (full["query_id"] == trunc["query_id"])
            & (full["vec_id"] == trunc["vec_id"]),
            "left",
        )
        .select(
            trunc["query_id"].alias("query_id"),
            trunc["trank"].alias("trank"),
            gain.alias("gain"),
            (gain.cast("double") * F.element_at(wtab, trunc["trank"])).alias("dc"),
        )
    )
    dcg = F.aggregate(
        F.array_sort(F.collect_list(F.struct("trank", "dc"))),
        F.lit(0.0),
        lambda a, x: a + x["dc"],
    )
    return joined.groupBy("query_id").agg(
        F.sum((F.col("gain") > 0).cast("int")).cast("long").alias("n_hits"),
        dcg.alias("dcg"),
        (dcg / F.lit(_NDCG_IDCG)).alias("ndcg"),
    )


_QUANTILE_SPECS = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p95", 19, 20), ("p99", 99, 100)]
_QUANTILE_BUCKET_CENTS = 100_000  # $1,000-wide value buckets


@register(
    "q304_exact_quantiles",
    oracle=f"""
    WITH v AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v
    ), specs(label, num, den) AS (
        VALUES {", ".join(f"('{l}', {a}, {b})" for l, a, b in _QUANTILE_SPECS)}
    ), ranks AS (
        SELECT label, CAST((num * n + den - 1) // den AS BIGINT) AS rank FROM specs, n
    ), ordered AS (
        SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM v
    )
    SELECT label, rank, cents AS value_cents,
           CAST(cents AS DOUBLE) / 100 AS value
    FROM ranks JOIN ordered ON rn = rank
    """,
    survey_ref="extension: EXACT distributed quantiles — lower quantile "
    "(type-1, rank = ceil(p·n) in integer math) of l_extendedprice at "
    "p25/p50/p75/p95/p99 via the q245 two-phase value-bucket scan; the "
    "quantile member of the sketch/summary family (HLL/KMV/CMS/Bloom "
    "cover cardinality/frequency/membership; this covers order "
    "statistics) — what percentile_approx answers approximately, "
    "answered exactly and cross-engine-verifiably",
)
def q304_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p95/p99 of lineitem extended price WITHOUT a
    global sort: the two-phase distributed order-statistics shape —

    1. bucket every row by a VALUE-DERIVED equi-width id (``cents div
       100000`` — immune to ``repartitionByRange`` sampling
       instability, q245's lesson), one map-side-combined count per
       bucket;
    2. running offsets over the ~100-row bucket-totals frame (the only
       unpartitioned window), target bucket per quantile by a range
       join on that tiny frame;
    3. in-bucket ``row_number`` rank selection ONLY inside the ≤5
       buckets that contain a target rank — the data-sized sort never
       happens, and ties are value-identical so the selected value is
       deterministic.

    Ranks use pure integer math (ceil(p·n) = (num·n + den − 1) div
    den) so Spark and DuckDB agree bit-for-bit; the only float is the
    final cents→dollars division of identical integers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = (_dec("l_extendedprice") * 100).cast("long")
    # integral div keeps the whole plan integer-only (q76's lesson);
    # cents >= 0 here — signed values would need floor-div (q236)
    v = li.select(
        cents.alias("cents"),
        F.expr(
            f"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
            f" div {_QUANTILE_BUCKET_CENTS}"
        ).alias("b"),
    )
    bcounts = v.groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    wb = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.select(
        "b", "cnt", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("long").alias("off")
    )
    n_row = v.agg(F.count("*").cast("long").alias("n"))
    specs = spark.createDataFrame(_QUANTILE_SPECS, "label string, num long, den long")
    ranks = specs.crossJoin(F.broadcast(n_row)).select(
        "label", F.expr("(num * n + den - 1) div den").alias("rank")
    )
    targets = ranks.join(
        F.broadcast(offsets),
        (F.col("off") < F.col("rank")) & (F.col("rank") <= F.col("off") + F.col("cnt")),
    ).select("label", "rank", "b", "off")
    wr = Window.partitionBy("b").orderBy("cents")
    in_bucket = (
        v.join(F.broadcast(targets.select("b").distinct()), "b", "left_semi")
        .withColumn("rn", F.row_number().over(wr).cast("long"))
    )
    return (
        in_bucket.join(F.broadcast(targets), "b")
        .filter(F.col("rn") == F.col("rank") - F.col("off"))
        .select(
            "label",
            "rank",
            F.col("cents").alias("value_cents"),
            (F.col("cents").cast("double") / 100).alias("value"),
        )
    )


_MG_K = 256  # Misra–Gries counter budget per partition


@register(
    "q305_heavy_hitters",
    headline=True,  # new plan family: map-only MG candidates + verify
    oracle=f"""
    WITH n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
    ), c AS (
        SELECT CAST(l_suppkey AS BIGINT) AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT key, cnt, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS support
    FROM c, n
    WHERE cnt * {_MG_K} > n
    """,
    survey_ref="extension: exact heavy hitters by the two-pass "
    "Misra–Gries discipline — map-only mergeable MG(256) summaries per "
    "partition generate a lossless candidate superset (pigeonhole: any "
    "key with global count > n/k exceeds n_p/k in some partition), then "
    "an exact count verifies ONLY candidates; the final output is exact "
    "and partitioning-independent, so it full-value-oracles against a "
    "plain GROUP BY HAVING",
)
def q305_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All keys with count > n/256 of lineitem's supplier column, found
    the way a 100 TB job should: phase 1 is a MAP-ONLY pass — each
    partition keeps a Misra–Gries summary of ≤255 counters (batches
    merged with the Agarwal et al. mergeable-summaries rule: pointwise
    add, subtract the k-th largest, clip), so no shuffle carries the
    full key universe; phase 2 exactly counts ONLY the ≤ partitions×k
    candidate keys (broadcast semi-join) and keeps those whose exact
    count clears the threshold (integer compare ``cnt·k > n``).

    Losslessness: a key with global count > n/k must exceed n_p/k in
    at least one partition, where MG's error bound (≤ n_p/k) cannot
    evict it — so candidates ⊇ true heavy hitters and the exact second
    pass makes the output deterministic no matter how the data is
    partitioned (pinned by a hostile-repartition test). A plain
    groupBy-count shuffles every distinct key; this shuffles only
    candidates — the difference between feasible and not when the key
    universe dwarfs executor memory.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("long").alias("key")
    )

    def mg_partition(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            # value_counts is an exact sub-summary of this Arrow batch
            # (its own footprint is batch-bounded, ~maxRecordsPerBatch
            # distinct keys, columnar and transient); merging it key by
            # key lets the counter dict shrink MID-batch, so the ≤255
            # live-counter budget holds between insertions instead of
            # only between batches
            vc = pdf["key"].value_counts()
            for k, c in vc.items():
                counters[int(k)] = counters.get(int(k), 0) + int(c)
                if len(counters) >= _MG_K:
                    # mergeable-summaries shrink: subtract the k-th
                    # largest count from all, drop the non-positive;
                    # shrink timing can only change which EXTRA
                    # candidates survive — phase 2's exact recount
                    # makes the final output independent of it
                    kth = sorted(counters.values(), reverse=True)[_MG_K - 1]
                    counters = {
                        k2: c2 - kth for k2, c2 in counters.items() if c2 - kth > 0
                    }
        yield pd.DataFrame({"key": pd.array(sorted(counters), dtype="Int64")})

    cands = li.mapInPandas(mg_partition, "key long").distinct()
    n_row = li.agg(F.count("*").cast("long").alias("n"))
    exact = (
        li.join(F.broadcast(cands), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_row))
        .filter(F.col("cnt") * _MG_K > F.col("n"))
        .select(
            "key",
            "cnt",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("support"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 29 (round 5): reference-LM quality filtering, distributed PCA,
# Mann–Whitney U
# ---------------------------------------------------------------------------


@register(
    "q306_lm_quality",
    headline=True,
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), bi AS (
        SELECT doc_id, source, tk[i] AS w1, tk[i+1] AS w2
        FROM toks, unnest(generate_series(1, greatest(len(tk) - 1, 0))) AS g(i)
    ), ref_bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM bi WHERE source = 'src0' GROUP BY 1, 2
    ), ref_uni AS (
        SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
        FROM bi WHERE source = 'src0' GROUP BY 1
    ), ref_v AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
            SELECT unnest(tk) AS tok FROM toks WHERE source = 'src0'
        )
    ), bits AS (
        SELECT b.doc_id, b.source,
               CAST(length(bin((COALESCE(u.c1, 0) + rv.v)
                               // (COALESCE(r.c2, 0) + 1))) - 1 AS BIGINT) AS sbits
        FROM bi b
        LEFT JOIN ref_bi r ON b.w1 = r.w1 AND b.w2 = r.w2
        LEFT JOIN ref_uni u ON b.w1 = u.w1
        CROSS JOIN ref_v rv
    )
    SELECT doc_id, source,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(sbits) AS BIGINT) AS total_bits,
           CAST(SUM(sbits) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bits_per_bigram
    FROM bits GROUP BY 1, 2
    """,
    survey_ref="extension: reference-LM corpus quality scoring (the "
    "CCNet discipline) — an add-one-smoothed bigram LM trained on one "
    "trusted source scores every document's mean surprise; kept "
    "engine-exact by measuring surprise in whole BITS via integer "
    "floor-log2 (length(bin(a div b)) - 1), no float log anywhere",
)
def q306_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality filtering: train a bigram LM on the
    trusted reference slice (source 'src0', add-one smoothing over its
    vocabulary), then score EVERY document by its mean per-bigram
    surprise. Surprise is measured in whole bits as
    floor(log2((c1(w1)+V) / (c2(w1,w2)+1))) — and since for integers
    a ≥ b ≥ 1, floor(log2(a/b)) == floor(log2(a div b)), both engines
    compute it exactly as length(bin(a div b)) − 1 with zero
    floating-point logs. An unseen bigram under a seen left token costs
    ~log2(c1+V) bits; a fully-OOV left token costs log2(V) — the
    standard smoothed-LM penalty shape.

    Scale: the reference LM is (w1,w2)→count — built with one shuffle
    over the reference slice only; scoring streams every document's
    bigrams through hash equi-joins on (w1,w2) and w1 (no broadcast
    assumption: a web-scale reference LM is itself large), then one
    map-side-combinable per-doc aggregate. This is the shape CCNet/
    RedPajama-class pipelines use to rank a 100 TB crawl against a
    Wikipedia-grade reference."""
    doc = load_table(spark, sf_dir, "documents")
    tks = doc.select("doc_id", "source", text.tokens(F.col("text")).alias("tk"))
    bi = (
        tks.filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at("tk", i).alias("w1"),
                        F.element_at("tk", i + 1).alias("w2"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "source", "p.w1", "p.w2")
    )
    ref = bi.filter(F.col("source") == "src0")
    ref_bi = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    ref_uni = ref.groupBy("w1").agg(F.count("*").cast("long").alias("c1"))
    ref_v = (
        tks.filter(F.col("source") == "src0")
        .select(F.explode("tk").alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("v"))
    )
    scored = (
        bi.join(ref_bi, ["w1", "w2"], "left")
        .join(ref_uni, ["w1"], "left")
        .crossJoin(F.broadcast(ref_v))
        .select(
            "doc_id",
            "source",
            (
                F.length(
                    F.bin(
                        F.expr("(coalesce(c1, 0) + v) div (coalesce(c2, 0) + 1)")
                    )
                )
                - 1
            )
            .cast("long")
            .alias("sbits"),
        )
    )
    return scored.groupBy("doc_id", "source").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("sbits").cast("long").alias("total_bits"),
        (F.sum("sbits").cast("double") / F.count("*").cast("double")).alias(
            "bits_per_bigram"
        ),
    )


def _pca_oracle(rounds: int = 3) -> str:
    """Unrolled power-iteration CTE chain mirroring q307's Spark plan:
    exact-integer scaled covariance, then ``rounds`` matrix-vector
    products with L∞ normalization, every fold ascending — the q80/q193
    generated-oracle discipline applied to linear algebra."""
    parts = [
        """qe AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
        FROM embeddings
    ), ex AS (
        SELECT vec_id, i, qv[i] AS x
        FROM qe, unnest(generate_series(1, 64)) AS g(i)
    ), s AS (
        SELECT i, CAST(SUM(x) AS BIGINT) AS si FROM ex GROUP BY 1
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM qe
    ), p AS (
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sij
        FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2
    ), crow AS (
        SELECT p.i,
               list(CAST(nn.n * p.sij - si.si * sj.si AS DOUBLE) ORDER BY p.j) AS cr
        FROM p CROSS JOIN nn
        JOIN s si ON si.i = p.i
        JOIN s sj ON sj.i = p.j
        GROUP BY p.i
    ), v0 AS (
        SELECT list_transform(generate_series(1, 64), x -> CAST(1.0 AS DOUBLE)) AS v
    )"""
    ]
    for t in range(1, rounds + 1):
        parts.append(f"""w{t} AS (
        SELECT i,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(generate_series(1, 64), jj -> cr[jj] * v[jj])),
                   (a, b) -> a + b) AS w
        FROM crow CROSS JOIN v{t - 1}
    ), m{t} AS (
        SELECT w AS m FROM w{t} ORDER BY abs(w) DESC, i ASC LIMIT 1
    ), v{t} AS (
        SELECT list(w / m ORDER BY i) AS v FROM w{t} CROSS JOIN m{t}
    )""")
    last = rounds
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(i AS BIGINT) AS dim, w / m AS component, m AS lambda_linf
    FROM w{last} CROSS JOIN m{last}
    """
    )


@register(
    "q307_power_iteration_pca",
    oracle=_pca_oracle(rounds=3),
    survey_ref="extension: distributed PCA — top principal direction of "
    "the embedding covariance by 3 unrolled power-iteration rounds; the "
    "n²-scaled covariance n·Σxxᵀ − (Σx)(Σx)ᵀ is exact int64, every "
    "later fold is ascending-order IEEE with identical operands, so the "
    "eigenvector is bit-reproducible with a FULL generated value oracle",
)
def q307_power_iteration_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud — the whitening /
    decorrelation primitive for embedding stores (ANN preconditioning,
    drift monitoring, OPQ's rotation seed). Two stages, both exact:

    1. Scaled covariance C = n·Σ x xᵀ − (Σx)(Σx)ᵀ over the quantized
       integer embeddings — one self-join on vec_id (co-partitioned
       after one shuffle) and a (64×64)-cell map-side-combinable SUM.
       Centering via the n² scaling keeps every cell exact int64
       (≈2.5e13 at sf0.1 — double-exact too, < 2^53).
    2. Three power-iteration rounds v ← C v / ‖C v‖∞ over the 64-row
       broadcast matrix: each matrix-vector product folds ascending-j,
       the L∞ normalizer picks (max |w|, lowest dim) — a deterministic
       sign convention — and both engines execute the identical IEEE
       sequence, so components hash-match bitwise.

    Scale: stage 1 touches the corpus exactly once; its output is
    64×64 cells regardless of corpus size. Stage 2 is O(dim²) on the
    driver-sized matrix — exactly how you'd seed a 100 TB whitening
    job (the corpus pass is the only data-sized cost)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qe = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1024).cast("long")
        ).alias("qv"),
    )
    ex = qe.select(
        "vec_id", F.posexplode("qv").alias("i0", "x")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    s = ex.groupBy("i").agg(F.sum("x").cast("long").alias("si"))
    nn = qe.agg(F.count("*").cast("long").alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    p = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("sij"))
    )
    crow = (
        p.crossJoin(F.broadcast(nn))
        .join(F.broadcast(s.select(F.col("i"), F.col("si"))), "i")
        .join(
            F.broadcast(s.select(F.col("i").alias("j"), F.col("si").alias("sj"))),
            "j",
        )
        .select(
            "i",
            "j",
            (F.col("n") * F.col("sij") - F.col("si") * F.col("sj"))
            .cast("double")
            .alias("cij"),
        )
        .groupBy("i")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "cij"))),
                lambda t: t["cij"],
            ).alias("cr")
        )
    )
    v = None  # single-row DataFrame with a 64-double array column "v"
    for _ in range(3):
        if v is None:
            src = crow.withColumn(
                "v", F.array(*[F.lit(1.0) for _ in range(64)])
            )
        else:
            src = crow.crossJoin(F.broadcast(v))
        w = src.select(
            "i",
            F.aggregate(
                F.zip_with("cr", "v", lambda c, x: c * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("w"),
        )
        m = w.orderBy(F.abs(F.col("w")).desc(), F.col("i").asc()).limit(1).select(
            F.col("w").alias("m")
        )
        wm = w.crossJoin(F.broadcast(m))
        v = wm.groupBy().agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("i", (F.col("w") / F.col("m")).alias("c")))),
                lambda t: t["c"],
            ).alias("v")
        )
    return wm.select(
        F.col("i").cast("long").alias("dim"),
        (F.col("w") / F.col("m")).alias("component"),
        F.col("m").alias("lambda_linf"),
    )


@register(
    "q308_mann_whitney",
    oracle="""
    WITH tagged AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_r
        FROM lineitem
    ), vals AS (
        SELECT v, CAST(SUM(is_r) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS ct
        FROM tagged GROUP BY 1
    ), cum AS (
        SELECT v, ca, ct,
               COALESCE(SUM(ct) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM vals
    ), agg AS (
        SELECT CAST(SUM(ca * (2 * cb + ct + 1)) AS BIGINT) AS r_a2,
               CAST(SUM(ca) AS BIGINT) AS na,
               CAST(SUM(ct - ca) AS BIGINT) AS nb,
               CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie3
        FROM cum
    )
    SELECT na, nb,
           r_a2 - na * (na + 1) AS u_a2,
           2 * na * nb - (r_a2 - na * (na + 1)) AS u_b2,
           CAST(r_a2 - na * (na + 1) - na * nb AS DOUBLE) / 2.0
           / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                  * (CAST(na + nb + 1 AS DOUBLE)
                     - CAST(tie3 AS DOUBLE)
                       / (CAST(na + nb AS DOUBLE) * CAST(na + nb - 1 AS DOUBLE))))
               AS z_stat
    FROM agg
    """,
    survey_ref="extension: Mann–Whitney U (Wilcoxon rank-sum) with the "
    "full tie correction — midranks carried as exact DOUBLED integers "
    "(2·midrank = 2·cum_before + t + 1), U and the tie term Σ(t³−t) "
    "stay BIGINT, one final double z; completes the nonparametric "
    "two-sample family next to KS (q245) and EMD (q275)",
)
def q308_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are returned ('R') line items drawn from a different price
    distribution than kept ones — without assuming normality? The
    rank-sum test needs every value's midrank; computed per DISTINCT
    value (not per row): group to (value, count_A, count_total), prefix
    sum of counts gives each value's doubled midrank 2·cb + t + 1
    exactly (ties included), and the rank sum, U statistic, and tie
    correction Σ(t³−t) are all integer arithmetic. The only doubles are
    the final z's fixed operand sequence — identical on both engines.

    Scale: identical two-phase discipline as q245/q275 — the heavy
    per-row work collapses to one map-side-combinable GROUP BY value;
    the prefix sum runs over distinct values only (bucket-partitionable
    exactly like q245 if the value universe ever dwarfs a partition;
    the plain window keeps this plan oracle-comparable)."""
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        (_dec("l_extendedprice") * 100).cast("long").alias("v"),
        (F.col("l_returnflag") == "R").cast("long").alias("is_r"),
    )
    vals = tagged.groupBy("v").agg(
        F.sum("is_r").cast("long").alias("ca"),
        F.count("*").cast("long").alias("ct"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v", "ca", "ct", F.coalesce(F.sum("ct").over(wv), F.lit(0)).alias("cb")
    )
    agg = cum.agg(
        F.sum(F.col("ca") * (2 * F.col("cb") + F.col("ct") + 1))
        .cast("long")
        .alias("r_a2"),
        F.sum("ca").cast("long").alias("na"),
        F.sum(F.col("ct") - F.col("ca")).cast("long").alias("nb"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tie3"),
    )
    u_a2 = F.col("r_a2") - F.col("na") * (F.col("na") + 1)
    z = (
        (u_a2 - F.col("na") * F.col("nb")).cast("double")
        / 2.0
        / F.sqrt(
            F.col("na").cast("double") * F.col("nb").cast("double") / 12.0
            * (
                (F.col("na") + F.col("nb") + 1).cast("double")
                - F.col("tie3").cast("double")
                / (
                    (F.col("na") + F.col("nb")).cast("double")
                    * (F.col("na") + F.col("nb") - 1).cast("double")
                )
            )
        )
    )
    return agg.select(
        "na",
        "nb",
        u_a2.alias("u_a2"),
        (2 * F.col("na") * F.col("nb") - u_a2).alias("u_b2"),
        z.alias("z_stat"),
    )


# Poisson(1) inverse-CDF thresholds, host-computed once and embedded as
# e-notation literals (DuckDB types a PLAIN decimal literal as DECIMAL,
# not DOUBLE — the q247 lesson; e-notation forces DOUBLE in both
# engines, and both parse the same 17-significant-digit literal to the
# same bits). w = #thresholds below u, capped at 8; E[w] = 1.
_POISSON1_CUM = [
    "3.67879441171442334e-01", "7.35758882342884668e-01",
    "9.19698602928605835e-01", "9.81011843123846261e-01",
    "9.96340153172656340e-01", "9.99405815182418333e-01",
    "9.99916758850711962e-01", "9.99989750803325306e-01",
]


def _poisson1_w_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POISSON1_CUM)
    )
    return f"CASE {branches} ELSE 8 END"


def _poisson1_w_col(u: F.Column) -> F.Column:
    out = F.lit(8)
    for k, c in reversed(list(enumerate(_POISSON1_CUM))):
        out = F.when(u < F.lit(float(c)), F.lit(k)).otherwise(out)
    return out


@register(
    "q309_poisson_bootstrap",
    headline=True,
    oracle=f"""
    WITH vals AS (
        SELECT o_orderkey AS k,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders
    ), weighted AS (
        SELECT b, cents,
               {_poisson1_w_sql(f"CAST({_mix31_sql('k * 64 + b')} AS DOUBLE) / 2147483648.0")} AS w
        FROM vals, unnest(generate_series(0, 31)) AS g(b)
    )
    SELECT CAST(b AS BIGINT) AS replica,
           CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(SUM(CAST(w AS BIGINT) * cents) AS BIGINT) AS wsum_cents,
           CAST(SUM(CAST(w AS BIGINT) * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
               AS mean_cents
    FROM weighted GROUP BY 1
    """,
    survey_ref="extension: Poisson bootstrap — the distributed-standard "
    "resampling CI (per-row independent Poisson(1) weights instead of "
    "multinomial draws, so replicas need no global coordination); "
    "weights come from the portable 31-bit mixer through a host-literal "
    "inverse CDF, making all 32 replica means engine-exact",
)
def q309_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for mean order value, the way a
    100 TB job has to do it: the classic bootstrap's multinomial
    resample needs the global row count per replica, but Poisson(1)
    weights approximate it row-locally (Chamandy et al., 'Estimating
    Uncertainty for Massive Data Streams') — each row draws its weight
    for each of 32 replicas from a deterministic hash, so the whole
    thing is ONE map stage plus a 32-group aggregate. Replica spread
    gives the CI; no second pass, no driver state.

    Engine-exactness: u = mix31(key·64+b)/2^31 is an exact double
    (power-of-two divisor), the Poisson(1) inverse-CDF thresholds are
    shared e-notation literals, weights and weighted sums stay BIGINT,
    and the single division per replica has identical operands."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (_dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    weighted = o.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
        "k",
    ).select(
        "b",
        "cents",
        _poisson1_w_col(
            _mix31_col(F.col("k") * 64 + F.col("b")).cast("double")
            / F.lit(2147483648.0)
        ).alias("w"),
    )
    return weighted.groupBy(F.col("b").cast("long").alias("replica")).agg(
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w").cast("long") * F.col("cents")).cast("long").alias("wsum_cents"),
        (
            F.sum(F.col("w").cast("long") * F.col("cents")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_cents"),
    )


def _bt_oracle(rounds: int = 3) -> str:
    """Unrolled Bradley–Terry MM CTE chain mirroring q310's Spark plan:
    integer win counts (Laplace-smoothed), then ``rounds`` minorize-
    maximize updates s_a ← W_a / Σ_b n_ab/(s_a+s_b) with the partner
    fold ascending-b — the generated-oracle discipline (q80/q193/q307)
    applied to a fixed-point fit."""
    parts = [
        """cmp AS (
        SELECT a.l_suppkey AS sa, b.l_suppkey AS sb,
               CAST(CAST(a.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pa,
               CAST(CAST(b.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
        WHERE a.l_suppkey <> b.l_suppkey
    ), outcomes AS (
        SELECT least(sa, sb) AS u, greatest(sa, sb) AS v,
               CASE WHEN pa = pb THEN 0
                    WHEN (pa < pb) = (sa < sb) THEN 1 ELSE 2 END AS win
        FROM cmp
    ), pairs AS (  -- Laplace +1 each way keeps every score positive/finite
        SELECT u, v,
               CAST(SUM(CASE WHEN win = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS w_uv,
               CAST(SUM(CASE WHEN win = 2 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS w_vu
        FROM outcomes GROUP BY 1, 2
    ), edges AS (
        SELECT u AS a, v AS b, w_uv + w_vu AS n, w_uv AS w FROM pairs
        UNION ALL
        SELECT v, u, w_uv + w_vu, w_vu FROM pairs
    ), wtot AS (
        SELECT a, CAST(SUM(w) AS BIGINT) AS wa,
               CAST(SUM(n) AS BIGINT) AS n_cmp
        FROM edges GROUP BY 1
    ), s0 AS (
        SELECT a, CAST(1.0 AS DOUBLE) AS s FROM wtot
    )"""
    ]
    for t in range(1, rounds + 1):
        prev = f"s{t - 1}"
        parts.append(f"""s{t} AS (
        SELECT e.a,
               CAST(w.wa AS DOUBLE) / list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                       list(CAST(e.n AS DOUBLE) / (sa.s + sb.s) ORDER BY e.b)),
                   (x, y) -> x + y) AS s
        FROM edges e
        JOIN {prev} sa ON sa.a = e.a
        JOIN {prev} sb ON sb.a = e.b
        JOIN wtot w ON w.a = e.a
        GROUP BY e.a, w.wa
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT w.a AS suppkey, w.n_cmp AS n_comparisons,
           w.wa AS n_wins_smoothed, s{rounds}.s AS bt_score
    FROM wtot w JOIN s{rounds} ON s{rounds}.a = w.a
    """
    )


@register(
    "q310_bradley_terry",
    oracle=_bt_oracle(rounds=3),
    survey_ref="extension: Bradley–Terry preference-strength fitting — "
    "the pairwise-preference primitive behind RLHF reward-data prep and "
    "ranking-from-comparisons; 3 unrolled MM rounds over Laplace-"
    "smoothed integer win counts, partner folds ascending, so the fit "
    "is engine-exact with a FULL generated value oracle",
)
def q310_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit Bradley–Terry strengths from pairwise outcomes — the model
    behind reward-data curation (which annotator/model 'wins'
    head-to-heads), here over a deterministic comparison stream:
    consecutive lines of each order, cheaper supplier wins (ties emit
    nothing). Counts are Laplace-smoothed (+1 each way per observed
    pair) so every compared supplier keeps a positive, finite score
    even if it never wins, and the MM update (Hunter 2004)
    s_a ← W_a / Σ_b n_ab/(s_a+s_b) runs 3 unrolled rounds from s=1.

    Engine-exactness: win/total counts are BIGINT; each round's only
    float math is the per-edge division n/(s_a+s_b) and an
    ascending-partner fold — identical operand sequences on both
    engines (the q307 discipline), so scores hash-match bitwise.

    Scale: comparisons derive from a self-join on (order, line+1) —
    co-partitioned on orderkey, one shuffle; the fit then runs on the
    PAIR aggregate (≤ suppliers² rows, typically tiny vs the event
    stream), with each MM round two broadcast-size joins and one
    map-side-combinable fold. This is the standard shape: reduce the
    preference log to pair counts once, iterate on the small summary.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        (_dec("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    a = li.alias("a")
    b = li.alias("b")
    cmp_ = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("sa"),
            F.col("b.l_suppkey").alias("sb"),
            F.col("a.cents").alias("pa"),
            F.col("b.cents").alias("pb"),
        )
    )
    outcomes = cmp_.select(
        F.least("sa", "sb").alias("u"),
        F.greatest("sa", "sb").alias("v"),
        F.when(F.col("pa") == F.col("pb"), F.lit(0))
        .when((F.col("pa") < F.col("pb")) == (F.col("sa") < F.col("sb")), F.lit(1))
        .otherwise(F.lit(2))
        .alias("win"),
    )
    pairs = outcomes.groupBy("u", "v").agg(
        (F.sum((F.col("win") == 1).cast("long")) + 1).cast("long").alias("w_uv"),
        (F.sum((F.col("win") == 2).cast("long")) + 1).cast("long").alias("w_vu"),
    )
    edges = pairs.select(
        F.col("u").alias("a"), F.col("v").alias("b"),
        (F.col("w_uv") + F.col("w_vu")).alias("n"), F.col("w_uv").alias("w"),
    ).unionByName(
        pairs.select(
            F.col("v").alias("a"), F.col("u").alias("b"),
            (F.col("w_uv") + F.col("w_vu")).alias("n"), F.col("w_vu").alias("w"),
        )
    )
    wtot = edges.groupBy("a").agg(
        F.sum("w").cast("long").alias("wa"),
        F.sum("n").cast("long").alias("n_cmp"),
    )
    scores = wtot.select("a", F.lit(1.0).alias("s"))
    for _ in range(3):
        sa = scores.select(F.col("a"), F.col("s").alias("s_a"))
        sb = scores.select(F.col("a").alias("b"), F.col("s").alias("s_b"))
        scores = (
            edges.join(sa, "a")
            .join(sb, "b")
            .select(
                "a",
                "b",
                (F.col("n").cast("double") / (F.col("s_a") + F.col("s_b"))).alias(
                    "term"
                ),
            )
            .groupBy("a")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("b", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                ).alias("den")
            )
            .join(wtot.select("a", "wa"), "a")
            .select("a", (F.col("wa").cast("double") / F.col("den")).alias("s"))
        )
    return (
        wtot.join(scores, "a")
        .select(
            F.col("a").alias("suppkey"),
            F.col("n_cmp").alias("n_comparisons"),
            F.col("wa").alias("n_wins_smoothed"),
            F.col("s").alias("bt_score"),
        )
    )


@register(
    "q311_ips_offpolicy",
    oracle="""
    WITH logged AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS action,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS r_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), seg AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_seg FROM logged GROUP BY 1
    ), sa AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_sa,
               CAST(SUM(r_cents) AS BIGINT) AS matched_cents
        FROM logged WHERE action = '1-URGENT' GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM logged
    )
    SELECT s.segment,
           s.n_seg,
           COALESCE(a.n_sa, 0) AS n_matched,
           CAST(COALESCE(a.n_sa, 0) AS DOUBLE) / CAST(s.n_seg AS DOUBLE)
               AS propensity,
           COALESCE(a.matched_cents, 0) AS matched_cents,
           CASE WHEN COALESCE(a.n_sa, 0) = 0 THEN 0.0
                ELSE CAST(a.matched_cents * s.n_seg AS DOUBLE)
                     / CAST(a.n_sa AS DOUBLE) / CAST(t.n AS DOUBLE)
           END AS ips_contrib_cents,
           CASE WHEN COALESCE(a.n_sa, 0) = 0 THEN 0.0
                ELSE CAST(a.n_sa * s.n_seg AS DOUBLE)
                     / CAST(a.n_sa AS DOUBLE) / CAST(t.n AS DOUBLE)
           END AS weight_mass
    FROM seg s LEFT JOIN sa a ON a.segment = s.segment CROSS JOIN tot t
    """,
    survey_ref="extension: inverse-propensity off-policy evaluation — "
    "the counterfactual estimator behind recsys/RLHF policy audits "
    "('what would the always-URGENT policy have earned on this logged "
    "traffic?'); per-row weights collapse to one exact-integer term "
    "per segment (all matched rows in a segment share n_seg/n_sa), so "
    "IPS and the SNIPS normalizer are engine-exact",
)
def q311_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy (counterfactual) evaluation from logged data: the
    logging policy's empirical propensities are p(a|segment) =
    n_sa/n_seg; the target policy 'always 1-URGENT' is valued by
    IPS = (1/N) Σ_matched r·n_seg/n_sa. Because every matched row in a
    segment shares the same weight, the per-row sum collapses exactly:
    segment contribution = matched_cents·n_seg / n_sa / N — integer
    numerators (≤ ~4e14 at sf0.1), two divisions in a fixed order.
    The emitted weight_mass column is the SNIPS normalizer term
    (Σ weights / N per segment): Σ ips_contrib / Σ weight_mass is the
    self-normalized estimate, and segments where the logging policy
    never took the target action surface as propensity-0 rows — the
    support-deficiency diagnostic every off-policy audit needs.

    Scale: one orders⋈customer shuffle, then everything is per-segment
    aggregates (≤ segments rows). The per-row reweighting never
    materializes — the standard trick for IPS over a 100 TB log."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("action"),
        (_dec("o_totalprice") * 100).cast("long").alias("r_cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    logged = o.join(c, "o_custkey")
    seg = logged.groupBy("segment").agg(F.count("*").cast("long").alias("n_seg"))
    sa = (
        logged.filter(F.col("action") == "1-URGENT")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_sa"),
            F.sum("r_cents").cast("long").alias("matched_cents"),
        )
    )
    tot = logged.agg(F.count("*").cast("long").alias("n"))
    n_matched = F.coalesce(F.col("n_sa"), F.lit(0)).cast("long")
    return (
        seg.join(sa, "segment", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "n_seg",
            n_matched.alias("n_matched"),
            (n_matched.cast("double") / F.col("n_seg").cast("double")).alias(
                "propensity"
            ),
            F.coalesce(F.col("matched_cents"), F.lit(0)).cast("long").alias(
                "matched_cents"
            ),
            F.when(n_matched == 0, F.lit(0.0))
            .otherwise(
                (F.col("matched_cents") * F.col("n_seg")).cast("double")
                / F.col("n_sa").cast("double")
                / F.col("n").cast("double")
            )
            .alias("ips_contrib_cents"),
            F.when(n_matched == 0, F.lit(0.0))
            .otherwise(
                (F.col("n_sa") * F.col("n_seg")).cast("double")
                / F.col("n_sa").cast("double")
                / F.col("n").cast("double")
            )
            .alias("weight_mass"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 30 (round 5, cont.): multiple-testing control, doubly-robust OPE,
# l-diversity, isotonic calibration, Kruskal–Wallis, segmented trend,
# Mantel–Haenszel pooled odds
# ---------------------------------------------------------------------------


@register(
    "q312_bh_fdr",
    oracle="""
    WITH joined AS (
        SELECT p.p_brand AS brand, l.l_quantity AS q,
               CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END AS is_f
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), stats AS (
        SELECT brand,
               CAST(SUM(is_f) AS BIGINT) AS na,
               CAST(SUM(is_f * q) AS BIGINT) AS sa,
               CAST(SUM(is_f * q * q) AS BIGINT) AS ssa,
               CAST(SUM(1 - is_f) AS BIGINT) AS nb,
               CAST(SUM((1 - is_f) * q) AS BIGINT) AS sb,
               CAST(SUM((1 - is_f) * q * q) AS BIGINT) AS ssb
        FROM joined GROUP BY 1
    ), tests AS (
        SELECT brand, na, nb,
               (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
               * (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
               / ((CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE)
                   - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                      / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)
                         * CAST(na - 1 AS DOUBLE))
                  + (CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE)
                     - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                      / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                         * CAST(nb - 1 AS DOUBLE))) AS z2
        FROM stats
        WHERE na >= 2 AND nb >= 2
          AND CAST(na AS DOUBLE) * CAST(ssa AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
              + CAST(nb AS DOUBLE) * CAST(ssb AS DOUBLE)
              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0e0
    ), ranked AS (
        SELECT brand, na, nb, z2,
               CASE WHEN z2 <= 1e0 THEN 1e0 ELSE 1e0 / z2 END AS p,
               ROW_NUMBER() OVER (ORDER BY
                   CASE WHEN z2 <= 1e0 THEN 1e0 ELSE 1e0 / z2 END, brand) AS r,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM tests
    ), cut AS (
        SELECT *, MAX(CASE WHEN p * CAST(m AS DOUBLE) * 1e1
                                <= CAST(r AS DOUBLE) THEN r END)
                      OVER () AS kstar
        FROM ranked
    )
    SELECT brand, na AS n_f, nb AS n_o, z2, p AS p_chebyshev,
           CAST(r AS BIGINT) AS p_rank, m AS m_tests,
           r <= COALESCE(kstar, 0) AS discovery
    FROM cut
    """,
    survey_ref="extension: Benjamini–Hochberg FDR control over a family "
    "of per-brand two-sample tests — the multiple-testing step every "
    "metrics platform needs after q141's single A/B test; p-values are "
    "distribution-free Chebyshev bounds min(1, 1/z²) so the whole "
    "procedure is closed-form arithmetic (no erf/exp), and the step-up "
    "cutoff k* = max{k : p_(k) <= k·α/m} is one window max",
)
def q312_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m simultaneous hypothesis tests (one per part brand: does mean
    order quantity differ between finished 'F' and open 'O' line
    items?) with Benjamini–Hochberg false-discovery-rate control at
    α = 0.1. Per test, a Welch z² from exact integer sums; the moment
    combinations n·Σx²−(Σx)² and n²(n−1) are formed in DOUBLES (the
    q316 N³ discipline — int64 would overflow once a brand holds ~2.1M
    rows); the p-value is the two-sided Chebyshev bound
    min(1, 1/z²) — deliberately distribution-free AND transcendental-
    free, so both engines produce bit-identical doubles. BH step-up:
    sort p ascending (brand tiebreak), find the largest rank r with
    p_(r) ≤ r·α/m (compared as 10·p·m ≤ r, exact literal arithmetic),
    reject everything at or below it.

    Scale: the per-row work is one map-side-combinable GROUP BY brand;
    the BH pass runs on m = #brands rows (25 here, thousands at most in
    practice), so the unpartitioned rank/max windows cost nothing — the
    same tiny-totals-frame discipline as q245."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_linestatus") == "F").cast("long").alias("is_f"),
    )
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    st = (
        li.join(pt, "l_partkey")
        .groupBy("brand")
        .agg(
            F.sum("is_f").cast("long").alias("na"),
            F.sum(F.col("is_f") * F.col("q")).cast("long").alias("sa"),
            F.sum(F.col("is_f") * F.col("q") * F.col("q")).cast("long").alias("ssa"),
            F.sum(1 - F.col("is_f")).cast("long").alias("nb"),
            F.sum((1 - F.col("is_f")) * F.col("q")).cast("long").alias("sb"),
            F.sum((1 - F.col("is_f")) * F.col("q") * F.col("q"))
            .cast("long")
            .alias("ssb"),
        )
    )
    delta = F.col("sa").cast("double") / F.col("na").cast("double") - F.col(
        "sb"
    ).cast("double") / F.col("nb").cast("double")
    na_d, sa_d, ssa_d = (F.col(c).cast("double") for c in ("na", "sa", "ssa"))
    nb_d, sb_d, ssb_d = (F.col(c).cast("double") for c in ("nb", "sb", "ssb"))
    se2 = (na_d * ssa_d - sa_d * sa_d) / (
        na_d * na_d * (F.col("na") - 1).cast("double")
    ) + (nb_d * ssb_d - sb_d * sb_d) / (
        nb_d * nb_d * (F.col("nb") - 1).cast("double")
    )
    tests = st.filter(
        (F.col("na") >= 2)
        & (F.col("nb") >= 2)
        & (na_d * ssa_d - sa_d * sa_d + nb_d * ssb_d - sb_d * sb_d > 0.0)
    ).select("brand", "na", "nb", (delta * delta / se2).alias("z2"))
    p = F.when(F.col("z2") <= 1.0, F.lit(1.0)).otherwise(1.0 / F.col("z2"))
    ranked = tests.select(
        "brand",
        "na",
        "nb",
        "z2",
        p.alias("p"),
    ).select(
        "*",
        F.row_number().over(Window.orderBy("p", "brand")).alias("r"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("m"),
    )
    cond = F.col("p") * F.col("m").cast("double") * 10.0 <= F.col("r").cast("double")
    cut = ranked.select(
        "*",
        F.max(F.when(cond, F.col("r"))).over(Window.partitionBy()).alias("kstar"),
    )
    return cut.select(
        "brand",
        F.col("na").alias("n_f"),
        F.col("nb").alias("n_o"),
        "z2",
        F.col("p").alias("p_chebyshev"),
        F.col("r").cast("long").alias("p_rank"),
        F.col("m").alias("m_tests"),
        (F.col("r") <= F.coalesce(F.col("kstar"), F.lit(0))).alias("discovery"),
    )


@register(
    "q313_dr_offpolicy",
    oracle="""
    WITH logged AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS is_tgt,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS r_cents,
               o.o_orderkey % 2 AS fold
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), model AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS nm,
               CAST(SUM(r_cents) AS BIGINT) AS mc
        FROM logged WHERE fold = 0 AND is_tgt = 1 GROUP BY 1
    ), gmodel AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nmg,
               CAST(SUM(r_cents) AS BIGINT) AS mcg
        FROM logged WHERE fold = 0 AND is_tgt = 1
    ), eval_seg AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS ne_seg,
               CAST(SUM(is_tgt) AS BIGINT) AS na_e,
               CAST(SUM(is_tgt * r_cents) AS BIGINT) AS mc_e
        FROM logged WHERE fold = 1 GROUP BY 1
    ), eval_tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_e FROM logged WHERE fold = 1
    ), fitted AS (
        SELECT e.segment, e.ne_seg, e.na_e, e.mc_e,
               COALESCE(m.nm, 0) AS n_model,
               CASE WHEN COALESCE(m.nm, 0) > 0
                    THEN CAST(m.mc AS DOUBLE) / CAST(m.nm AS DOUBLE)
                    ELSE CAST(g.mcg AS DOUBLE) / CAST(g.nmg AS DOUBLE)
               END AS qhat,
               t.n_e
        FROM eval_seg e LEFT JOIN model m ON m.segment = e.segment
        CROSS JOIN gmodel g CROSS JOIN eval_tot t
    )
    SELECT segment, n_model AS n_model_urgent, ne_seg AS n_eval,
           na_e AS n_eval_urgent, qhat AS qhat_cents,
           CAST(ne_seg AS DOUBLE) * qhat / CAST(n_e AS DOUBLE)
               AS dm_contrib_cents,
           CASE WHEN na_e = 0 THEN 0e0
                ELSE (CAST(mc_e AS DOUBLE) - CAST(na_e AS DOUBLE) * qhat)
                     * CAST(ne_seg AS DOUBLE) / CAST(na_e AS DOUBLE)
                     / CAST(n_e AS DOUBLE)
           END AS correction_cents,
           CAST(ne_seg AS DOUBLE) * qhat / CAST(n_e AS DOUBLE)
           + CASE WHEN na_e = 0 THEN 0e0
                  ELSE (CAST(mc_e AS DOUBLE) - CAST(na_e AS DOUBLE) * qhat)
                       * CAST(ne_seg AS DOUBLE) / CAST(na_e AS DOUBLE)
                       / CAST(n_e AS DOUBLE)
             END AS dr_contrib_cents
    FROM fitted
    """,
    survey_ref="extension: cross-fitted doubly-robust off-policy "
    "evaluation — the estimator that upgrades q311's IPS with an "
    "outcome model fitted on a DISJOINT fold (without cross-fitting, "
    "the empirical-propensity correction is identically zero and DR "
    "degenerates to the direct method); per-segment collapse keeps the "
    "per-row reweighting unmaterialized, same as q311",
)
def q313_dr_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust counterfactual value of the 'always 1-URGENT'
    policy with two-fold cross-fitting: the outcome model q̂(segment) =
    mean urgent reward on fold 0; the DR estimator runs on fold 1 —
    per row, q̂ + 1{a=π}·(r − q̂)/p̂ — which collapses per segment to
    DM term n_seg·q̂/N plus correction (Σr_matched − n_matched·q̂)·
    n_seg/n_matched/N, all from exact integer sums and a fixed double
    operand order. Segments the model fold never saw urgent fall back
    to the global model mean (reported via n_model_urgent = 0);
    segments with no eval-side urgent keep the DM term with zero
    correction — the support-deficiency cases an OPE audit must
    surface, not crash on.

    Scale: one orders⋈customer shuffle feeding four map-side-combinable
    aggregates; everything after is per-segment rows joined to two
    broadcast scalars."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("is_tgt"),
        (_dec("o_totalprice") * 100).cast("long").alias("r_cents"),
        (F.col("o_orderkey") % 2).alias("fold"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    logged = o.join(c, "o_custkey")
    model_rows = logged.filter((F.col("fold") == 0) & (F.col("is_tgt") == 1))
    model = model_rows.groupBy("segment").agg(
        F.count("*").cast("long").alias("nm"),
        F.sum("r_cents").cast("long").alias("mc"),
    )
    gmodel = model_rows.agg(
        F.count("*").cast("long").alias("nmg"),
        F.sum("r_cents").cast("long").alias("mcg"),
    )
    ev = logged.filter(F.col("fold") == 1)
    eval_seg = ev.groupBy("segment").agg(
        F.count("*").cast("long").alias("ne_seg"),
        F.sum("is_tgt").cast("long").alias("na_e"),
        F.sum(F.col("is_tgt") * F.col("r_cents")).cast("long").alias("mc_e"),
    )
    eval_tot = ev.agg(F.count("*").cast("long").alias("n_e"))
    n_model = F.coalesce(F.col("nm"), F.lit(0)).cast("long")
    qhat = F.when(
        n_model > 0, F.col("mc").cast("double") / F.col("nm").cast("double")
    ).otherwise(F.col("mcg").cast("double") / F.col("nmg").cast("double"))
    fitted = (
        eval_seg.join(model, "segment", "left")
        .crossJoin(F.broadcast(gmodel))
        .crossJoin(F.broadcast(eval_tot))
        .select(
            "segment",
            "ne_seg",
            "na_e",
            "mc_e",
            n_model.alias("n_model"),
            qhat.alias("qhat"),
            "n_e",
        )
    )
    dm = (
        F.col("ne_seg").cast("double")
        * F.col("qhat")
        / F.col("n_e").cast("double")
    )
    corr = F.when(F.col("na_e") == 0, F.lit(0.0)).otherwise(
        (F.col("mc_e").cast("double") - F.col("na_e").cast("double") * F.col("qhat"))
        * F.col("ne_seg").cast("double")
        / F.col("na_e").cast("double")
        / F.col("n_e").cast("double")
    )
    return fitted.select(
        "segment",
        F.col("n_model").alias("n_model_urgent"),
        F.col("ne_seg").alias("n_eval"),
        F.col("na_e").alias("n_eval_urgent"),
        F.col("qhat").alias("qhat_cents"),
        dm.alias("dm_contrib_cents"),
        corr.alias("correction_cents"),
        (dm + corr).alias("dr_contrib_cents"),
    )


@register(
    "q314_l_diversity",
    oracle="""
    WITH cell AS (
        SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS segment,
               o.o_orderpriority AS action, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey, segment,
           CAST(SUM(cnt) AS BIGINT) AS group_n,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(MAX(cnt) AS BIGINT) AS top_count,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share,
           COUNT(*) < 3 AS at_risk
    FROM cell GROUP BY 1, 2
    """,
    survey_ref="extension: distinct l-diversity audit — the "
    "re-identification check that complements q236's k-anonymity "
    "(a k-anonymous group is still leaky if the sensitive attribute "
    "is near-constant inside it); reports per-QI-group sensitive "
    "diversity, the modal sensitive share (the recursive-(c,l) "
    "frequency term), and the l<3 risk flag",
)
def q314_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit over the quasi-identifier (nation, market
    segment): for each QI group, how many DISTINCT values of the
    sensitive attribute (order priority) appear, and how concentrated
    is the modal value? k-anonymity (q236) bounds group size; this
    bounds attribute disclosure — a group where 9 of 10 orders are
    '1-URGENT' reveals the sensitive value with 90% confidence no
    matter how large the group is. Groups with l < 3 are flagged.

    Scale: two stacked map-side-combinable aggregates ((QI, action)
    then QI) — the count-distinct never builds a per-group set because
    the first GROUP BY already reduced to distinct cells."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderpriority").alias("action")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    cell = (
        o.join(c, "o_custkey")
        .groupBy("nationkey", "segment", "action")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return cell.groupBy("nationkey", "segment").agg(
        F.sum("cnt").cast("long").alias("group_n"),
        F.count("*").cast("long").alias("l_distinct"),
        F.max("cnt").cast("long").alias("top_count"),
        (F.max("cnt").cast("double") / F.sum("cnt").cast("double")).alias(
            "top_share"
        ),
        (F.count("*") < 3).alias("at_risk"),
    )


@register(
    "q315_isotonic_calibration",
    oracle="""
    WITH lv AS (
        SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS w,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM lineitem GROUP BY 1
    ), cum AS (
        SELECT d, w, s,
               CAST(SUM(w) OVER (ORDER BY d) AS BIGINT) AS cw,
               CAST(SUM(s) OVER (ORDER BY d) AS BIGINT) AS cs
        FROM lv
    ), pairs AS (
        SELECT j.d AS dj, k.d AS dk,
               CAST(k.cs - (j.cs - j.s) AS DOUBLE)
               / CAST(k.cw - (j.cw - j.w) AS DOUBLE) AS seg_mean
        FROM cum j JOIN cum k ON j.d <= k.d
    ), inner_min AS (
        SELECT i.d AS di, p.dj, MIN(p.seg_mean) AS m_ij
        FROM cum i JOIN pairs p ON p.dj <= i.d AND p.dk >= i.d
        GROUP BY 1, 2
    ), iso AS (
        SELECT di AS d, MAX(m_ij) AS iso_rate FROM inner_min GROUP BY 1
    )
    SELECT lv.d AS discount_cents, lv.w AS n, lv.s AS n_pos,
           CAST(lv.s AS DOUBLE) / CAST(lv.w AS DOUBLE) AS emp_rate,
           iso.iso_rate AS iso_rate
    FROM lv JOIN iso ON lv.d = iso.d
    """,
    survey_ref="extension: isotonic regression (PAVA) for calibration — "
    "the monotone fit behind calibrated probabilities and monotone "
    "binning, complementing q222's raw calibration curve; computed by "
    "the exact minimax identity iso(i) = max_{j<=i} min_{k>=i} "
    "mean(y_j..y_k) over AGGREGATED levels, so no sequential "
    "pool-adjacent pass and no iteration cap",
)
def q315_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-calibrated return rate as a function of discount level:
    the isotonic (PAVA) fit of P(returnflag='R' | discount). Instead of
    the sequential pool-adjacent-violators sweep (driver-side, orderful),
    this uses the closed-form minimax characterization — the isotonic
    value at level i is max over starts j≤i of the min over ends k≥i of
    the segment mean — which is embarrassingly parallel over the
    (j,i,k) triples of AGGREGATED levels. Segment means come from
    integer prefix sums (one division each), so min/max select among
    bit-identical doubles on both engines.

    Scale: the per-row pass is one map-side-combinable GROUP BY level;
    the minimax runs on L levels (11 here — L³ pairs of broadcast-joined
    aggregates), the right shape whenever the calibration grid is
    bounded, which is what a calibration grid is."""
    li = load_table(spark, sf_dir, "lineitem")
    lv = li.groupBy(
        (_dec("l_discount") * 100).cast("long").alias("d")
    ).agg(
        F.count("*").cast("long").alias("w"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).cast("long").alias("s"),
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = lv.select(
        "d",
        "w",
        "s",
        F.sum("w").over(wd).cast("long").alias("cw"),
        F.sum("s").over(wd).cast("long").alias("cs"),
    )
    j = cum.select(
        F.col("d").alias("dj"),
        (F.col("cw") - F.col("w")).alias("pw"),
        (F.col("cs") - F.col("s")).alias("ps"),
    )
    k = cum.select(
        F.col("d").alias("dk"), F.col("cw").alias("kw"), F.col("cs").alias("ks")
    )
    pairs = (
        j.join(F.broadcast(k), F.col("dj") <= F.col("dk"))
        .select(
            "dj",
            "dk",
            (
                (F.col("ks") - F.col("ps")).cast("double")
                / (F.col("kw") - F.col("pw")).cast("double")
            ).alias("seg_mean"),
        )
    )
    inner_min = (
        cum.select(F.col("d").alias("di"))
        .join(
            F.broadcast(pairs),
            (F.col("dj") <= F.col("di")) & (F.col("dk") >= F.col("di")),
        )
        .groupBy("di", "dj")
        .agg(F.min("seg_mean").alias("m_ij"))
    )
    iso = inner_min.groupBy(F.col("di").alias("d")).agg(
        F.max("m_ij").alias("iso_rate")
    )
    return lv.join(iso, "d").select(
        F.col("d").alias("discount_cents"),
        F.col("w").alias("n"),
        F.col("s").alias("n_pos"),
        (F.col("s").cast("double") / F.col("w").cast("double")).alias("emp_rate"),
        "iso_rate",
    )


@register(
    "q316_kruskal_wallis",
    oracle="""
    WITH tagged AS (
        SELECT l_returnflag AS g,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        FROM lineitem
    ), cells AS (
        SELECT v, g, CAST(COUNT(*) AS BIGINT) AS cnt FROM tagged GROUP BY 1, 2
    ), vals AS (
        SELECT v, CAST(SUM(cnt) AS BIGINT) AS ct FROM cells GROUP BY 1
    ), cum AS (
        SELECT v, ct,
               COALESCE(SUM(ct) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM vals
    ), groups AS (
        SELECT c.g, CAST(SUM(c.cnt) AS BIGINT) AS n_g,
               CAST(SUM(c.cnt * (2 * u.cb + u.ct + 1)) AS BIGINT) AS r2_g
        FROM cells c JOIN cum u ON c.v = u.v
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS n,
               CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS tie3
        FROM vals
    ), folded AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(r2_g AS DOUBLE) * CAST(r2_g AS DOUBLE)
                        / CAST(4 * n_g AS DOUBLE) ORDER BY g)),
                   (a, b) -> a + b) AS srank
        FROM groups
    ), stats AS (
        SELECT 1.2e1 * f.srank / (CAST(t.n AS DOUBLE) * CAST(t.n + 1 AS DOUBLE))
               - 3e0 * CAST(t.n + 1 AS DOUBLE) AS hstat,
               1e0 - CAST(t.tie3 AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * CAST(t.n AS DOUBLE)
                        * CAST(t.n AS DOUBLE) - CAST(t.n AS DOUBLE)) AS tie_c,
               t.n AS n_total
        FROM folded f CROSS JOIN tot t
    )
    SELECT g.g AS returnflag, g.n_g, g.r2_g AS rank_sum2, s.n_total,
           s.hstat, s.tie_c AS tie_correction, s.hstat / s.tie_c AS h_corrected
    FROM groups g CROSS JOIN stats s
    """,
    survey_ref="extension: Kruskal–Wallis H (one-way ANOVA on ranks) "
    "with full tie correction — the 3-group (returnflag A/N/R) "
    "generalization of q308's Mann–Whitney, same doubled-midrank "
    "discipline (rank sums "
    "stay BIGINT); the only cross-group double sum folds left-to-right "
    "in group order on both engines (the q178 pinned-fold pattern), so "
    "H hash-matches bit-for-bit",
)
def q316_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the three return-flag populations (A/N/R) draw line-item
    prices from the same distribution? The k-group rank ANOVA that
    q308's two-sample test generalizes to (lineitem carries no other
    categorical with >2 levels; at k=2 this H is exactly z² from
    q308). Kruskal–Wallis: midranks per DISTINCT value via one
    prefix sum (doubled to stay integer under ties, as in q308),
    per-group rank sums as exact BIGINTs, then
    H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1) over the G group rows, divided
    by the tie correction 1 − Σ(t³−t)/(N³−N). Σ R_g²/n_g is a sum of
    G doubles — order-sensitive — so it is folded over an array sorted
    by group name, making the summation order part of the contract;
    N³ is formed in doubles so the expression survives row counts past
    the int64 cube bound.

    Scale: per-row work is one GROUP BY (value, group); the prefix sum
    runs over distinct values (bucket-partitionable as in q245); the
    fold touches G rows."""
    li = load_table(spark, sf_dir, "lineitem")
    tagged = li.select(
        F.col("l_returnflag").alias("g"),
        (_dec("l_extendedprice") * 100).cast("long").alias("v"),
    )
    cells = tagged.groupBy("v", "g").agg(F.count("*").cast("long").alias("cnt"))
    vals = cells.groupBy("v").agg(F.sum("cnt").cast("long").alias("ct"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = vals.select(
        "v", "ct", F.coalesce(F.sum("ct").over(wv), F.lit(0)).alias("cb")
    )
    groups = (
        cells.join(cum, "v")
        .groupBy("g")
        .agg(
            F.sum("cnt").cast("long").alias("n_g"),
            F.sum(F.col("cnt") * (2 * F.col("cb") + F.col("ct") + 1))
            .cast("long")
            .alias("r2_g"),
        )
    )
    tot = vals.agg(
        F.sum("ct").cast("long").alias("n"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("tie3"),
    )
    term = F.col("r2_g").cast("double") * F.col("r2_g").cast("double") / (
        4 * F.col("n_g")
    ).cast("double")
    folded = groups.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("g").alias("g"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("srank")
    )
    n_d = F.col("n").cast("double")
    stats = folded.crossJoin(F.broadcast(tot)).select(
        (
            12.0 * F.col("srank") / (n_d * (F.col("n") + 1).cast("double"))
            - 3.0 * (F.col("n") + 1).cast("double")
        ).alias("hstat"),
        (
            1.0 - F.col("tie3").cast("double") / (n_d * n_d * n_d - n_d)
        ).alias("tie_c"),
        F.col("n").alias("n_total"),
    )
    return groups.crossJoin(F.broadcast(stats)).select(
        F.col("g").alias("returnflag"),
        "n_g",
        F.col("r2_g").alias("rank_sum2"),
        "n_total",
        "hstat",
        F.col("tie_c").alias("tie_correction"),
        (F.col("hstat") / F.col("tie_c")).alias("h_corrected"),
    )


@register(
    "q317_segmented_trend",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS x,
               o_orderdate AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1, 2
    ), cum AS (
        SELECT day,
               CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS cn,
               CAST(SUM(x) OVER (ORDER BY x) AS BIGINT) AS cx,
               CAST(SUM(y) OVER (ORDER BY x) AS BIGINT) AS cy,
               CAST(SUM(x * x) OVER (ORDER BY x) AS BIGINT) AS cxx,
               CAST(SUM(x * y) OVER (ORDER BY x) AS BIGINT) AS cxy,
               CAST(SUM(y * y) OVER (ORDER BY x) AS BIGINT) AS cyy
        FROM daily
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS tx,
               CAST(SUM(y) AS BIGINT) AS ty, CAST(SUM(x * x) AS BIGINT) AS txx,
               CAST(SUM(x * y) AS BIGINT) AS txy,
               CAST(SUM(y * y) AS BIGINT) AS tyy
        FROM daily
    ), scored AS (
        SELECT c.day, c.cn AS n_left, t.n - c.cn AS n_right,
               CAST(c.cn * c.cxy - c.cx * c.cy AS DOUBLE)
                   / CAST(c.cn * c.cxx - c.cx * c.cx AS DOUBLE) AS slope_left,
               CAST((t.n - c.cn) * (t.txy - c.cxy)
                    - (t.tx - c.cx) * (t.ty - c.cy) AS DOUBLE)
                   / CAST((t.n - c.cn) * (t.txx - c.cxx)
                          - (t.tx - c.cx) * (t.tx - c.cx) AS DOUBLE)
                   AS slope_right,
               (CAST(c.cn * c.cyy - c.cy * c.cy AS DOUBLE)
                - CAST(c.cn * c.cxy - c.cx * c.cy AS DOUBLE)
                  * CAST(c.cn * c.cxy - c.cx * c.cy AS DOUBLE)
                  / CAST(c.cn * c.cxx - c.cx * c.cx AS DOUBLE))
               / CAST(c.cn AS DOUBLE) AS sse_left,
               (CAST((t.n - c.cn) * (t.tyy - c.cyy)
                     - (t.ty - c.cy) * (t.ty - c.cy) AS DOUBLE)
                - CAST((t.n - c.cn) * (t.txy - c.cxy)
                       - (t.tx - c.cx) * (t.ty - c.cy) AS DOUBLE)
                  * CAST((t.n - c.cn) * (t.txy - c.cxy)
                         - (t.tx - c.cx) * (t.ty - c.cy) AS DOUBLE)
                  / CAST((t.n - c.cn) * (t.txx - c.cxx)
                         - (t.tx - c.cx) * (t.tx - c.cx) AS DOUBLE))
               / CAST(t.n - c.cn AS DOUBLE) AS sse_right,
               (CAST(t.n * t.tyy - t.ty * t.ty AS DOUBLE)
                - CAST(t.n * t.txy - t.tx * t.ty AS DOUBLE)
                  * CAST(t.n * t.txy - t.tx * t.ty AS DOUBLE)
                  / CAST(t.n * t.txx - t.tx * t.tx AS DOUBLE))
               / CAST(t.n AS DOUBLE) AS sse_null
        FROM cum c CROSS JOIN tot t
        WHERE c.cn >= 2 AND t.n - c.cn >= 2
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY sse_left + sse_right, day) AS rk
        FROM scored
    )
    SELECT day AS split_day, n_left, n_right, slope_left, slope_right,
           sse_left, sse_right, sse_left + sse_right AS sse_split, sse_null,
           CASE WHEN sse_null = 0e0 THEN 0e0
                ELSE (sse_null - (sse_left + sse_right)) / sse_null
           END AS gain
    FROM ranked WHERE rk = 1
    """,
    survey_ref="extension: segmented (two-piece) least-squares trend — "
    "the structural-break detector that complements q210's CUSUM (mean "
    "shift) with a SLOPE shift, scanning every candidate breakpoint in "
    "one pass via integer prefix sums of (n, Σx, Σy, Σx², Σxy, Σy²); "
    "each side's SSE is closed-form from the exact sums, no per-split "
    "refit",
)
def q317_segmented_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single breakpoint in the daily order-volume trend: fit
    separate OLS lines to days ≤ s and days > s for EVERY candidate s,
    pick the split minimizing total SSE (day tiebreak), and report both
    slopes plus the no-split SSE and the variance-explained gain.
    The classic O(n²)-looking scan collapses to one prefix-sum pass:
    a segment's SSE is closed-form in (n, Σx, Σy, Σx², Σxy, Σy²), and
    suffix sums are totals minus prefixes. All moment sums are exact
    BIGINTs (y = daily counts, x = day offsets); each SSE is a fixed
    double expression over them.

    Scale: GROUP BY day first (map-side combinable), then the prefix
    sums run over distinct days only — bucket-partitionable like q245's
    if the day axis ever outgrows one partition; the argmin is a
    WindowGroupLimit-style rank over the same tiny frame, not a global
    sort of raw rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    ).select(
        F.datediff(F.col("day"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        "day",
        "y",
    )
    wx = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.row_number().over(Window.orderBy("x")).cast("long").alias("cn"),
        F.sum("x").over(wx).cast("long").alias("cx"),
        F.sum("y").over(wx).cast("long").alias("cy"),
        F.sum(F.col("x") * F.col("x")).over(wx).cast("long").alias("cxx"),
        F.sum(F.col("x") * F.col("y")).over(wx).cast("long").alias("cxy"),
        F.sum(F.col("y") * F.col("y")).over(wx).cast("long").alias("cyy"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("tx"),
        F.sum("y").cast("long").alias("ty"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("txx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("txy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("tyy"),
    )

    def _sse(n, sx, sy, sxx, sxy, syy):
        a = (n * syy - sy * sy).cast("double")
        b = (n * sxy - sx * sy).cast("double")
        c = (n * sxx - sx * sx).cast("double")
        return (a - b * b / c) / n.cast("double"), b / c

    nl = F.col("cn")
    nr = F.col("n") - F.col("cn")
    sse_l, slope_l = _sse(
        nl, F.col("cx"), F.col("cy"), F.col("cxx"), F.col("cxy"), F.col("cyy")
    )
    sse_r, slope_r = _sse(
        nr,
        F.col("tx") - F.col("cx"),
        F.col("ty") - F.col("cy"),
        F.col("txx") - F.col("cxx"),
        F.col("txy") - F.col("cxy"),
        F.col("tyy") - F.col("cyy"),
    )
    sse_0, _ = _sse(
        F.col("n"), F.col("tx"), F.col("ty"), F.col("txx"), F.col("txy"),
        F.col("tyy"),
    )
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter((nl >= 2) & (nr >= 2))
        .select(
            "day",
            nl.alias("n_left"),
            nr.alias("n_right"),
            slope_l.alias("slope_left"),
            slope_r.alias("slope_right"),
            sse_l.alias("sse_left"),
            sse_r.alias("sse_right"),
            sse_0.alias("sse_null"),
        )
    )
    ranked = scored.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.col("sse_left") + F.col("sse_right"), F.col("day")))
        .alias("rk"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("day").alias("split_day"),
        "n_left",
        "n_right",
        "slope_left",
        "slope_right",
        "sse_left",
        "sse_right",
        (F.col("sse_left") + F.col("sse_right")).alias("sse_split"),
        "sse_null",
        F.when(F.col("sse_null") == 0.0, F.lit(0.0))
        .otherwise(
            (F.col("sse_null") - (F.col("sse_left") + F.col("sse_right")))
            / F.col("sse_null")
        )
        .alias("gain"),
    )


@register(
    "q318_cmh_pooled_odds",
    oracle="""
    WITH base AS (
        SELECT p.p_brand AS brand,
               CASE WHEN CAST(l.l_discount AS DECIMAL(18,2)) * 100 >= 5
                    THEN 1 ELSE 0 END AS e,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS r
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), strata AS (
        SELECT brand,
               CAST(SUM(e * r) AS BIGINT) AS a,
               CAST(SUM(e * (1 - r)) AS BIGINT) AS b,
               CAST(SUM((1 - e) * r) AS BIGINT) AS c,
               CAST(SUM((1 - e) * (1 - r)) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY 1
    ), pooled AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                        / CAST(n AS DOUBLE)
                        ORDER BY brand)), (x, y) -> x + y) AS mh_num,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                        / CAST(n AS DOUBLE)
                        ORDER BY brand)), (x, y) -> x + y) AS mh_den
        FROM strata
    )
    SELECT s.brand, s.a AS n_exp_ret, s.b AS n_exp_keep,
           s.c AS n_unexp_ret, s.d AS n_unexp_keep,
           CASE WHEN s.b = 0 OR s.c = 0 THEN NULL
                ELSE CAST(s.a AS DOUBLE) * CAST(s.d AS DOUBLE)
                     / (CAST(s.b AS DOUBLE) * CAST(s.c AS DOUBLE))
           END AS or_stratum,
           p.mh_num, p.mh_den, p.mh_num / p.mh_den AS or_mh
    FROM strata s CROSS JOIN pooled p
    """,
    survey_ref="extension: Cochran–Mantel–Haenszel pooled odds ratio — "
    "the stratified-confounding answer to q293's Simpson's-paradox "
    "detector: instead of flagging the reversal, CMH pools the per-"
    "stratum 2×2 tables into one confounder-adjusted association "
    "estimate Σ(a·d/n)/Σ(b·c/n); the two cross-stratum double sums use "
    "the q178 pinned fold so they hash-match",
)
def q318_cmh_pooled_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is a high discount (≥5%) associated with returns after
    controlling for brand? Each brand is a stratum with a 2×2
    exposure(high-discount)×outcome(returned) table; the
    Mantel–Haenszel estimator pools them as
    Σ_k(a_k·d_k/n_k) / Σ_k(b_k·c_k/n_k) — robust to brand-level
    confounding that a marginal odds ratio (the q293 trap) absorbs.
    Per-stratum cells are exact integer conditional sums; the a·d and
    b·c products form in DOUBLES (at 100 TB a stratum holds ~2.4e10
    rows — int64 products would overflow, the q327 discipline), and
    the cross-stratum sums fold in brand order on both engines.
    Degenerate strata (a zero off-diagonal) report a NULL per-stratum
    OR but still contribute their defined term to the pooled sums —
    exactly why CMH exists.

    Scale: one lineitem⋈part equi-join, one map-side-combinable GROUP
    BY brand, then G-row arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (_dec("l_discount") * 100 >= 5).cast("long").alias("e"),
        (F.col("l_returnflag") == "R").cast("long").alias("r"),
    )
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    strata = (
        li.join(pt, "l_partkey")
        .groupBy("brand")
        .agg(
            F.sum(F.col("e") * F.col("r")).cast("long").alias("a"),
            F.sum(F.col("e") * (1 - F.col("r"))).cast("long").alias("b"),
            F.sum((1 - F.col("e")) * F.col("r")).cast("long").alias("c"),
            F.sum((1 - F.col("e")) * (1 - F.col("r"))).cast("long").alias("d"),
            F.count("*").cast("long").alias("n"),
        )
    )

    def _fold(term: F.Column) -> F.Column:
        return F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("brand").alias("brand"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        )

    pooled = strata.agg(
        _fold(
            F.col("a").cast("double") * F.col("d").cast("double")
            / F.col("n").cast("double")
        ).alias("mh_num"),
        _fold(
            F.col("b").cast("double") * F.col("c").cast("double")
            / F.col("n").cast("double")
        ).alias("mh_den"),
    )
    return strata.crossJoin(F.broadcast(pooled)).select(
        "brand",
        F.col("a").alias("n_exp_ret"),
        F.col("b").alias("n_exp_keep"),
        F.col("c").alias("n_unexp_ret"),
        F.col("d").alias("n_unexp_keep"),
        F.when((F.col("b") == 0) | (F.col("c") == 0), F.lit(None).cast("double"))
        .otherwise(
            F.col("a").cast("double") * F.col("d").cast("double")
            / (F.col("b").cast("double") * F.col("c").cast("double"))
        )
        .alias("or_stratum"),
        "mh_num",
        "mh_den",
        (F.col("mh_num") / F.col("mh_den")).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# Batch 31 (round 5, cont.): HITS, memorization audit, Cohen's kappa,
# Qini uplift
# ---------------------------------------------------------------------------


def _hits_oracle(rounds: int = 2) -> str:
    """DuckDB oracle for q319: unrolled HITS rounds over the event-type
    transition graph. Mirrors operators.graph.hits_fixed exactly —
    integer edge weights, per-node contribution folds pinned in
    neighbor order, L1 normalizers folded in node order — so hubs and
    authorities are bit-identical doubles."""
    parts = [
        """seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ), ed AS (
        SELECT event_type AS src, nxt AS dst, COUNT(*) AS w
        FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), nodes AS (
        SELECT DISTINCT src AS node FROM ed
        UNION SELECT DISTINCT dst FROM ed
    ), nn AS (SELECT COUNT(*) AS n FROM nodes),
    e AS (SELECT src, dst, CAST(w AS DOUBLE) AS w FROM ed),
    h0 AS (
        SELECT node, CAST(1.0 AS DOUBLE) / CAST(n AS DOUBLE) AS h
        FROM nodes CROSS JOIN nn
    )"""
    ]
    for r in range(rounds):
        parts.append(f"""ar{r + 1} AS (
        SELECT e.dst AS node,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(h{r}.h * e.w ORDER BY e.src)), (x, y) -> x + y) AS a
        FROM h{r} JOIN e ON h{r}.node = e.src GROUP BY 1
    ), af{r + 1} AS (
        SELECT nodes.node, COALESCE(ar{r + 1}.a, CAST(0e0 AS DOUBLE)) AS a
        FROM nodes LEFT JOIN ar{r + 1} ON nodes.node = ar{r + 1}.node
    ), at{r + 1} AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(a ORDER BY node)), (x, y) -> x + y) AS t
        FROM af{r + 1}
    ), a{r + 1} AS (
        SELECT node, a / t AS a FROM af{r + 1} CROSS JOIN at{r + 1}
    ), hr{r + 1} AS (
        SELECT e.src AS node,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(a{r + 1}.a * e.w ORDER BY e.dst)), (x, y) -> x + y) AS h
        FROM a{r + 1} JOIN e ON a{r + 1}.node = e.dst GROUP BY 1
    ), hf{r + 1} AS (
        SELECT nodes.node, COALESCE(hr{r + 1}.h, CAST(0e0 AS DOUBLE)) AS h
        FROM nodes LEFT JOIN hr{r + 1} ON nodes.node = hr{r + 1}.node
    ), ht{r + 1} AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(h ORDER BY node)), (x, y) -> x + y) AS t
        FROM hf{r + 1}
    ), h{r + 1} AS (
        SELECT node, h / t AS h FROM hf{r + 1} CROSS JOIN ht{r + 1}
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT h{rounds}.node, h{rounds}.h AS hub,"
        f" a{rounds}.a AS authority"
        f"\n    FROM h{rounds} JOIN a{rounds}"
        f" ON h{rounds}.node = a{rounds}.node\n    "
    )


@register(
    "q319_hits",
    oracle=_hits_oracle(rounds=2),
    survey_ref="extension: HITS hubs-and-authorities (Kleinberg) over "
    "the event-type transition graph — the mutual-reinforcement "
    "companion to q110's PageRank; 2 unrolled rounds, each an equi-join "
    "plus a pinned grouped fold per half-step, with the L1 normalizer "
    "folded in node order so every double hash-matches",
)
def q319_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types funnel traffic (hubs) and which receive it
    (authorities)? HITS on the weighted transition graph: authority =
    normalized in-weighted hub mass, hub = normalized out-weighted
    authority mass, two unrolled mutual-reinforcement rounds from a
    uniform hub start.

    Same scale shape as q110: per round, shuffle ∝ |edges| for the two
    half-step joins; the normalizer folds one array bounded by the
    node-domain size (event types), broadcast back as a 1-row scalar.
    """
    from stock_data_pipeline_spark.operators.graph import hits_fixed

    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("event_type").over(w))
    edges = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return hits_fixed(edges, rounds=2)


@register(
    "q320_memorization",
    headline=True,  # new plan family: directional containment + islands
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), pg AS (
        SELECT doc_id, source, u.pos AS pos, u.g AS g
        FROM (
            SELECT doc_id, source,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 7, 0)),
                       i -> struct_pack(pos := i,
                            g := tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                                 || tk[i+3] || ' ' || tk[i+4] || ' ' || tk[i+5]
                                 || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS u
            FROM toks
        )
    ), ref AS (
        SELECT DISTINCT g FROM pg WHERE source = 'src0'
    ), ev AS (
        SELECT doc_id, pos, g FROM pg WHERE source <> 'src0'
    ), mem AS (
        SELECT ev.doc_id, ev.pos FROM ev JOIN ref ON ev.g = ref.g
    ), stats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM ev GROUP BY 1
    ), memstats AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_mem FROM mem GROUP BY 1
    ), runs AS (
        SELECT doc_id,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        FROM mem
    ), runlen AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS rl
        FROM runs GROUP BY doc_id, isl
    ), longest AS (
        SELECT doc_id, MAX(rl) AS longest FROM runlen GROUP BY 1
    )
    SELECT s.doc_id, s.n_grams,
           COALESCE(m.n_mem, 0) AS n_memorized,
           CAST(COALESCE(m.n_mem, 0) AS DOUBLE) / CAST(s.n_grams AS DOUBLE)
               AS mem_rate,
           COALESCE(l.longest, 0) AS longest_run
    FROM stats s
    LEFT JOIN memstats m ON s.doc_id = m.doc_id
    LEFT JOIN longest l ON s.doc_id = l.doc_id
    """,
    survey_ref="extension: memorization / extractability audit "
    "(Carlini-style) — per evaluation document, the fraction of its "
    "word-8-gram positions present ANYWHERE in the reference slice, "
    "plus the longest contiguous memorized span; grades leakage that "
    "q77's exact and q192's Bloom contamination checks (whole-doc "
    "membership) cannot see, and unlike q86 it is directional "
    "(eval vs reference), not corpus-internal",
)
def q320_memorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each non-reference document is reconstructible from
    the reference corpus? For every eval doc: the share of its word
    8-gram positions whose gram occurs in ANY 'src0' document
    (verbatim-memorization rate), and the longest run of consecutive
    memorized positions (the extractable-span length — 30 means a
    37-token verbatim stretch). Runs via the gaps-and-islands
    row_number trick on memorized positions, all integers.

    Scale: gram posting lists shuffle once on the gram (equi-join
    against the DISTINCT reference set — semi-join, no fan-out); the
    island pass windows per doc (bounded). At 100 TB you'd hash grams
    to 64 bits first (q25's xxhash64 pattern) — string grams kept here
    for the full value oracle."""
    from stock_data_pipeline_spark.llm.text import tokens

    doc = load_table(spark, sf_dir, "documents")
    pg = doc.select(
        "doc_id", "source", tokens("text").alias("__tk")
    ).select(
        "doc_id",
        "source",
        F.posexplode(dedup.ngrams_from_tokens(F.col("__tk"), 8)).alias("pos", "g"),
    )
    ref = pg.filter(F.col("source") == "src0").select("g").distinct()
    ev = pg.filter(F.col("source") != "src0").select("doc_id", "pos", "g")
    mem = ev.join(ref, "g", "left_semi").select("doc_id", "pos")
    stats = ev.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    memstats = mem.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_mem"))
    wruns = Window.partitionBy("doc_id").orderBy("pos")
    runlen = (
        mem.select(
            "doc_id", (F.col("pos") - F.row_number().over(wruns)).alias("isl")
        )
        .groupBy("doc_id", "isl")
        .agg(F.count("*").cast("long").alias("rl"))
    )
    longest = runlen.groupBy("doc_id").agg(F.max("rl").alias("longest"))
    return (
        stats.join(memstats, "doc_id", "left")
        .join(longest, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_mem"), F.lit(0)).cast("long").alias("n_memorized"),
            (
                F.coalesce(F.col("n_mem"), F.lit(0)).cast("double")
                / F.col("n_grams").cast("double")
            ).alias("mem_rate"),
            F.coalesce(F.col("longest"), F.lit(0)).cast("long").alias("longest_run"),
        )
    )


def _kappa_oracle() -> str:
    """DuckDB oracle for q321: Cohen's kappa between the gold `lang`
    column and the q30 marker-lexicon prediction, from the exact
    confusion counts (all marginal products stay integer)."""
    from stock_data_pipeline_spark.llm.text import LANG_MARKERS

    tk = _duck_tokens()
    hits = {
        lang: _LANG_HIT.format(tk=tk, lst=str(markers))
        for lang, markers in LANG_MARKERS.items()
    }
    hit_cols = ",\n               ".join(
        f"{h} AS {lang}_hits" for lang, h in hits.items()
    )
    langs = list(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"{lang}_hits" for lang in langs) + ")"
    whens = " ".join(f"WHEN {lang}_hits = {best} THEN '{lang}'" for lang in langs)
    return f"""
    WITH scored AS (
        SELECT doc_id, lang, {hit_cols}
        FROM documents
    ), pred AS (
        SELECT lang AS gold,
               CASE WHEN {best} = 0 THEN 'und' {whens} END AS pred
        FROM scored
    ), conf AS (
        SELECT gold, pred, CAST(COUNT(*) AS BIGINT) AS c FROM pred GROUP BY 1, 2
    ), labels AS (
        SELECT DISTINCT gold AS label FROM conf
        UNION SELECT DISTINCT pred FROM conf
    ), rowm AS (
        SELECT gold AS label, CAST(SUM(c) AS BIGINT) AS n_gold
        FROM conf GROUP BY 1
    ), colm AS (
        SELECT pred AS label, CAST(SUM(c) AS BIGINT) AS n_pred
        FROM conf GROUP BY 1
    ), diag AS (
        SELECT gold AS label, CAST(SUM(c) AS BIGINT) AS n_agree
        FROM conf WHERE gold = pred GROUP BY 1
    ), marg AS (
        SELECT l.label,
               COALESCE(r.n_gold, 0) AS n_gold,
               COALESCE(m.n_pred, 0) AS n_pred,
               COALESCE(d.n_agree, 0) AS n_agree
        FROM labels l
        LEFT JOIN rowm r ON l.label = r.label
        LEFT JOIN colm m ON l.label = m.label
        LEFT JOIN diag d ON l.label = d.label
    ), tot AS (
        SELECT CAST(SUM(n_gold) AS BIGINT) AS n,
               CAST(SUM(n_agree) AS BIGINT) AS agree,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(n_gold AS DOUBLE) * CAST(n_pred AS DOUBLE)
                        ORDER BY label)), (x, y) -> x + y) AS cx
        FROM marg
    ), kap AS (
        SELECT n,
               CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
               cx / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
        FROM tot
    )
    SELECT marg.label, marg.n_gold, marg.n_pred, marg.n_agree,
           kap.n AS n_total, kap.po, kap.pe,
           (kap.po - kap.pe) / (1e0 - kap.pe) AS kappa
    FROM marg CROSS JOIN kap
    """


@register(
    "q321_cohens_kappa",
    oracle=_kappa_oracle(),
    survey_ref="extension: Cohen's kappa — chance-corrected agreement "
    "between the q30 lang-ID heuristic and the gold label, computed "
    "from q125's confusion cells; the annotator-agreement statistic "
    "every labeling pipeline reports, exact-integer marginals with "
    "three fixed-order double divisions",
)
def q321_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much better than chance does the marker-lexicon language
    identifier agree with the gold labels? Raw accuracy (q125's
    confusion matrix) overstates agreement when one class dominates;
    kappa = (p_o − p_e)/(1 − p_e) corrects by the agreement expected
    from the marginals alone. Emitted per label (gold count, predicted
    count, diagonal count) with the corpus-level p_o, p_e, kappa
    replicated — the same one-result-set atomicity as q311/q316.

    Scale: one codegen scan scores every doc (no UDF), one GROUP BY
    (gold, pred) whose cell count is |labels|², then label-row
    arithmetic. Marginals stay BIGINT; the marginal PRODUCTS and p_e's
    n² form in doubles (an int64 product overflows at the same ~3·10⁹
    corpus bound), summed in pinned label order."""
    from stock_data_pipeline_spark.llm.text import lang_id

    doc = load_table(spark, sf_dir, "documents")
    conf = (
        doc.select(F.col("lang").alias("gold"), lang_id("text").alias("pred"))
        .groupBy("gold", "pred")
        .agg(F.count("*").cast("long").alias("c"))
    )
    labels = (
        conf.select(F.col("gold").alias("label"))
        .unionByName(conf.select(F.col("pred").alias("label")))
        .distinct()
    )
    rowm = conf.groupBy(F.col("gold").alias("label")).agg(
        F.sum("c").cast("long").alias("n_gold")
    )
    colm = conf.groupBy(F.col("pred").alias("label")).agg(
        F.sum("c").cast("long").alias("n_pred")
    )
    diag = (
        conf.filter(F.col("gold") == F.col("pred"))
        .groupBy(F.col("gold").alias("label"))
        .agg(F.sum("c").cast("long").alias("n_agree"))
    )
    marg = (
        labels.join(rowm, "label", "left")
        .join(colm, "label", "left")
        .join(diag, "label", "left")
        .select(
            "label",
            F.coalesce("n_gold", F.lit(0)).cast("long").alias("n_gold"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
            F.coalesce("n_agree", F.lit(0)).cast("long").alias("n_agree"),
        )
    )
    tot = marg.agg(
        F.sum("n_gold").cast("long").alias("n"),
        F.sum("n_agree").cast("long").alias("agree"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("label").alias("label"),
                        (
                            F.col("n_gold").cast("double")
                            * F.col("n_pred").cast("double")
                        ).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        ).alias("cx"),
    )
    kap = tot.select(
        "n",
        (F.col("agree").cast("double") / F.col("n").cast("double")).alias("po"),
        (
            F.col("cx")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("pe"),
    )
    return marg.crossJoin(F.broadcast(kap)).select(
        "label",
        "n_gold",
        "n_pred",
        "n_agree",
        F.col("n").alias("n_total"),
        "po",
        "pe",
        ((F.col("po") - F.col("pe")) / (1.0 - F.col("pe"))).alias("kappa"),
    )


@register(
    "q322_qini_uplift",
    headline=True,  # new plan family: cell-interval decile assignment
    oracle="""
    WITH base AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
               CASE WHEN CAST(l_discount AS DECIMAL(18,2)) * 100 >= 5
                    THEN 1 ELSE 0 END AS t,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), cells AS (
        SELECT v, t, y, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY 1, 2, 3
    ), cum AS (
        SELECT v, t, y, cnt,
               COALESCE(SUM(cnt) OVER (ORDER BY v DESC, t, y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM cells
    ), nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells),
    dec AS (
        SELECT k, (k * n) // 10 + 1 AS lo, ((k + 1) * n) // 10 AS hi
        FROM generate_series(0, 9) AS s(k) CROSS JOIN nn
    ), ov AS (
        SELECT d.k, c.t, c.y,
               least(d.hi, c.cb + c.cnt) - greatest(d.lo, c.cb + 1) + 1 AS m
        FROM cum c JOIN dec d
          ON c.cb + 1 <= d.hi AND c.cb + c.cnt >= d.lo
    ), per AS (
        SELECT k,
               CAST(SUM(CASE WHEN t = 1 THEN m ELSE 0 END) AS BIGINT) AS nt,
               CAST(SUM(CASE WHEN t = 0 THEN m ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN t = 1 AND y = 1 THEN m ELSE 0 END)
                    AS BIGINT) AS yt,
               CAST(SUM(CASE WHEN t = 0 AND y = 1 THEN m ELSE 0 END)
                    AS BIGINT) AS yc
        FROM ov GROUP BY 1
    ), cumk AS (
        SELECT k, nt, nc, yt, yc,
               CAST(SUM(nt) OVER (ORDER BY k) AS BIGINT) AS cnt_t,
               CAST(SUM(nc) OVER (ORDER BY k) AS BIGINT) AS cnc,
               CAST(SUM(yt) OVER (ORDER BY k) AS BIGINT) AS cyt,
               CAST(SUM(yc) OVER (ORDER BY k) AS BIGINT) AS cyc
        FROM per
    )
    SELECT CAST(k AS BIGINT) AS decile, nt AS n_treat, nc AS n_ctrl,
           yt AS y_treat, yc AS y_ctrl,
           cnt_t AS cum_n_treat, cnc AS cum_n_ctrl,
           cyt AS cum_y_treat, cyc AS cum_y_ctrl,
           CASE WHEN nt = 0 OR nc = 0 THEN 0e0
                ELSE CAST(yt AS DOUBLE) / CAST(nt AS DOUBLE)
                     - CAST(yc AS DOUBLE) / CAST(nc AS DOUBLE)
           END AS uplift_rate,
           CASE WHEN cnc = 0 THEN CAST(cyt AS DOUBLE)
                ELSE CAST(cyt AS DOUBLE)
                     - CAST(cyc * cnt_t AS DOUBLE) / CAST(cnc AS DOUBLE)
           END AS qini_value
    FROM cumk
    """,
    survey_ref="extension: Qini uplift curve — the evaluation harness "
    "for targeting policies (which decile of the score ordering "
    "actually responds to treatment?); deciles are assigned by VALUE "
    "CELLS via interval overlap against the 10 rank ranges, never a "
    "global per-row sort, so the plan is q304-shaped and the result is "
    "independent of row order and tie-breaking",
)
def q322_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift evaluation of a targeting score: order the population by
    score (price cents, descending), cut into deciles, and per decile
    compare the outcome rate (returns) between treated (discount ≥ 5%)
    and control rows; the cumulative Qini value
    Y_t(d) − Y_c(d)·N_t(d)/N_c(d) is the running incremental-outcome
    estimate whose curve-vs-random-diagonal is how uplift models are
    scored.

    The scale trick: rows never get individual ranks. The data
    collapses to (score, t, y) cells with exact prefix counts; each
    cell's rank interval [cb+1, cb+cnt] is intersected with the 10
    decile intervals (broadcast join against 10 rows) and contributes
    its overlap SIZE — so rows with tied scores split across a decile
    boundary deterministically by count, independent of physical order,
    with no global row_number over the table (the q304 exact-quantile
    discipline applied to decile assignment)."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = li.select(
        (_dec("l_extendedprice") * 100).cast("long").alias("v"),
        (_dec("l_discount") * 100 >= 5).cast("long").alias("t"),
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
    ).groupBy("v", "t", "y").agg(F.count("*").cast("long").alias("cnt"))
    wv = Window.orderBy(F.col("v").desc(), "t", "y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = cells.select(
        "v", "t", "y", "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).cast("long").alias("cb"),
    )
    nn = cells.agg(F.sum("cnt").cast("long").alias("n"))
    dec = (
        spark.range(10)
        .select(F.col("id").cast("long").alias("k"))
        .crossJoin(F.broadcast(nn))
        .select(
            "k",
            F.expr("(k * n) div 10 + 1").alias("lo"),
            F.expr("((k + 1) * n) div 10").alias("hi"),
        )
    )
    ov = cum.join(
        F.broadcast(dec),
        (F.col("cb") + 1 <= F.col("hi")) & (F.col("cb") + F.col("cnt") >= F.col("lo")),
    ).select(
        "k", "t", "y",
        (
            F.least(F.col("hi"), F.col("cb") + F.col("cnt"))
            - F.greatest(F.col("lo"), F.col("cb") + 1)
            + 1
        ).alias("m"),
    )
    per = ov.groupBy("k").agg(
        F.sum(F.when(F.col("t") == 1, F.col("m")).otherwise(0))
        .cast("long").alias("nt"),
        F.sum(F.when(F.col("t") == 0, F.col("m")).otherwise(0))
        .cast("long").alias("nc"),
        F.sum(F.when((F.col("t") == 1) & (F.col("y") == 1), F.col("m")).otherwise(0))
        .cast("long").alias("yt"),
        F.sum(F.when((F.col("t") == 0) & (F.col("y") == 1), F.col("m")).otherwise(0))
        .cast("long").alias("yc"),
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cumk = per.select(
        "k", "nt", "nc", "yt", "yc",
        F.sum("nt").over(wk).cast("long").alias("cnt_t"),
        F.sum("nc").over(wk).cast("long").alias("cnc"),
        F.sum("yt").over(wk).cast("long").alias("cyt"),
        F.sum("yc").over(wk).cast("long").alias("cyc"),
    )
    return cumk.select(
        F.col("k").alias("decile"),
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_ctrl"),
        F.col("yt").alias("y_treat"),
        F.col("yc").alias("y_ctrl"),
        F.col("cnt_t").alias("cum_n_treat"),
        F.col("cnc").alias("cum_n_ctrl"),
        F.col("cyt").alias("cum_y_treat"),
        F.col("cyc").alias("cum_y_ctrl"),
        F.when((F.col("nt") == 0) | (F.col("nc") == 0), F.lit(0.0))
        .otherwise(
            F.col("yt").cast("double") / F.col("nt").cast("double")
            - F.col("yc").cast("double") / F.col("nc").cast("double")
        )
        .alias("uplift_rate"),
        F.when(F.col("cnc") == 0, F.col("cyt").cast("double"))
        .otherwise(
            F.col("cyt").cast("double")
            - (F.col("cyc") * F.col("cnt_t")).cast("double")
            / F.col("cnc").cast("double")
        )
        .alias("qini_value"),
    )


# ---------------------------------------------------------------------------
# Batch 32 (round 5, cont.): embedding-label diagnostics, forecast
# decomposition, best-of-n selection, experiment planning
# ---------------------------------------------------------------------------


@register(
    "q323_label_centroid_confusion",
    oracle="""
    WITH q AS (
        SELECT label, u.d AS dim, u.qv AS qv
        FROM (
            SELECT label,
                   unnest(list_transform(generate_series(1, len(embedding)),
                       i -> struct_pack(d := i,
                            qv := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                             * 1024.0) AS BIGINT)))) AS u
            FROM embeddings
        )
    ), sums AS (
        SELECT label, dim, CAST(SUM(qv) AS BIGINT) AS s
        FROM q GROUP BY 1, 2
    ), norms AS (
        SELECT label, CAST(SUM(s * s) AS BIGINT) AS n2 FROM sums GROUP BY 1
    ), counts AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n FROM embeddings GROUP BY 1
    ), dots AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM(a.s * b.s) AS BIGINT) AS dot
        FROM sums a JOIN sums b ON a.dim = b.dim AND a.label <= b.label
        GROUP BY 1, 2
    )
    SELECT d.label_a, d.label_b, ca.n AS n_a, cb.n AS n_b, d.dot,
           CAST(d.dot AS DOUBLE)
           / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
               AS cos_sim
    FROM dots d
    JOIN counts ca ON d.label_a = ca.label
    JOIN counts cb ON d.label_b = cb.label
    JOIN norms na ON d.label_a = na.label
    JOIN norms nb ON d.label_b = nb.label
    """,
    survey_ref="extension: label-centroid cosine confusion matrix — "
    "the embedding-space diagnostic behind class-collision audits and "
    "SemDeDup cluster sanity (labels whose centroids are near-parallel "
    "are candidates for merging or relabeling); centroid cosine needs "
    "no mean because the 1/n factors cancel, so the whole matrix is "
    "exact int64 sums with one double division per pair",
)
def q323_label_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids
    (diagonal included as the 1.0 sanity row). The mean-vector cosine
    equals the SUM-vector cosine (1/n scalars cancel), and with the
    q80/q307 power-of-two quantization (floor(x·2¹⁰) — exact on
    float32 inputs) every per-label per-dimension sum is exact int64,
    making the dot products and norms order-independent integers; the
    only doubles are one division by a product of two exact sqrts.

    Scale: one posexplode shuffle to (label, dim) — map-side
    combinable; the pairwise stage joins |labels|·dims rows on dim,
    quadratic only in the label count (tiny), never in rows. The int64
    exactness holds while per-label sums stay under ~3·10⁹ in absolute
    value (n_label·2^quant_bits); past that, lower quant_bits by the
    excess — cosine is scale-invariant, so coarser quantization only
    perturbs, never breaks, the similarity."""
    emb = load_table(spark, sf_dir, "embeddings")
    from stock_data_pipeline_spark.llm.clustering import _quantize

    sums = (
        emb.select(
            "label", F.posexplode(_quantize(F.col("embedding"), 10)).alias("dim", "qv")
        )
        .groupBy("label", "dim")
        .agg(F.sum("qv").cast("long").alias("s"))
    )
    norms = sums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("long").alias("n2")
    )
    counts = emb.groupBy("label").agg(F.count("*").cast("long").alias("n"))
    a = sums.select(
        F.col("label").alias("label_a"), F.col("dim").alias("dim"), F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("label").alias("label_b"), F.col("dim").alias("dim"), F.col("s").alias("sb")
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") <= F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sa") * F.col("sb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2"))
    ca = counts.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        dots.join(ca, "label_a")
        .join(cb, "label_b")
        .join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            "dot",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
            ).alias("cos_sim"),
        )
    )


@register(
    "q324_brier_decomposition",
    oracle=f"""
    WITH scored AS ({_Q222_SCORE_SQL}
    ), binned AS (
        SELECT NTILE(10) OVER (ORDER BY score, doc_id) AS bin, doc_id, score, label
        FROM scored
    ), bins AS (
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(score ORDER BY doc_id)), (a, b) -> a + b) / COUNT(*)
                   AS fbar,
               CAST(SUM(label) AS BIGINT) AS pos
        FROM binned GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS pp
        FROM bins
    ), parts AS (
        SELECT
            list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                list(CAST(n AS DOUBLE)
                     * (fbar - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                     * (fbar - CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                     ORDER BY bin)), (a, b) -> a + b) AS rel_num,
            list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                list(CAST(n AS DOUBLE)
                     * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                        - CAST(t.pp AS DOUBLE) / CAST(t.nn AS DOUBLE))
                     * (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)
                        - CAST(t.pp AS DOUBLE) / CAST(t.nn AS DOUBLE))
                     ORDER BY bin)), (a, b) -> a + b) AS res_num
        FROM bins CROSS JOIN tot t GROUP BY t.nn, t.pp
    ), stats AS (
        SELECT rel_num / CAST(t.nn AS DOUBLE) AS reliability,
               res_num / CAST(t.nn AS DOUBLE) AS resolution,
               (CAST(t.pp AS DOUBLE) / CAST(t.nn AS DOUBLE))
               * (1e0 - CAST(t.pp AS DOUBLE) / CAST(t.nn AS DOUBLE))
                   AS uncertainty,
               t.nn AS n_total
        FROM parts CROSS JOIN tot t
    )
    SELECT b.bin, b.n, b.fbar AS mean_score,
           CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS positive_rate,
           s.n_total, s.reliability, s.resolution, s.uncertainty,
           s.reliability - s.resolution + s.uncertainty AS brier_binned
    FROM bins b CROSS JOIN stats s
    """,
    survey_ref="extension: Murphy decomposition of the Brier score "
    "(reliability − resolution + uncertainty) over q222's calibration "
    "bins — the standard forecast-quality accounting that separates "
    "miscalibration from lack of discrimination; bin means reuse "
    "q222's pinned score folds, the two cross-bin sums fold in bin "
    "order, and the identity is pinned by the replay test",
)
def q324_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why is the document scorer's Brier score what it is? The Murphy
    decomposition over the binned forecasts: reliability (how far each
    bin's mean forecast sits from its realized rate — calibration
    error, lower better), resolution (how much the bins' realized
    rates spread from the base rate — discrimination, higher better),
    and uncertainty (the irreducible ō(1−ō)). For bin-constant
    forecasts the three recombine EXACTLY into the binned Brier score.
    Emitted per bin with the corpus-level decomposition replicated.

    Scale: identical to q222 (two-phase bucketed ntile via
    operators/ranks.py + one aggregate) plus 10-row arithmetic; the
    cross-bin folds are the q178 pinned pattern."""
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
    bins = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("doc_id", "score"))),
                F.lit(0.0),
                lambda a, x: a + x["score"],
            )
            / F.count("*")
        ).alias("fbar"),
        F.sum("label").cast("long").alias("pos"),
    )
    tot = bins.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("pos").cast("long").alias("pp")
    )
    obar_k = F.col("pos").cast("double") / F.col("n").cast("double")
    obar = F.col("pp").cast("double") / F.col("nn").cast("double")
    rel_term = F.col("n").cast("double") * (F.col("fbar") - obar_k) * (
        F.col("fbar") - obar_k
    )
    res_term = F.col("n").cast("double") * (obar_k - obar) * (obar_k - obar)

    def _binfold(term: F.Column) -> F.Column:
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("bin").alias("bin"),
                                                 term.alias("t")))),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        )

    parts = (
        bins.crossJoin(F.broadcast(tot))
        .groupBy("nn", "pp")
        .agg(
            _binfold(rel_term).alias("rel_num"),
            _binfold(res_term).alias("res_num"),
        )
    )
    stats = parts.select(
        (F.col("rel_num") / F.col("nn").cast("double")).alias("reliability"),
        (F.col("res_num") / F.col("nn").cast("double")).alias("resolution"),
        (obar * (1.0 - obar)).alias("uncertainty"),
        F.col("nn").alias("n_total"),
    )
    return bins.crossJoin(F.broadcast(stats)).select(
        "bin",
        "n",
        F.col("fbar").alias("mean_score"),
        obar_k.alias("positive_rate"),
        "n_total",
        "reliability",
        "resolution",
        "uncertainty",
        (F.col("reliability") - F.col("resolution") + F.col("uncertainty")).alias(
            "brier_binned"
        ),
    )


@register(
    "q325_best_of_n",
    oracle=f"""
    WITH scored0 AS ({_Q222_SCORE_SQL}
    ), scored AS (
        SELECT least(CAST(floor(score * 16.0) AS BIGINT), 15) AS bucket
        FROM scored0
    ), bk AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM scored GROUP BY 1
    ), cum AS (
        SELECT bucket, cnt, CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS c
        FROM bk
    ), nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM bk),
    fr AS (
        SELECT bucket, cnt,
               CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS cf,
               CAST(c - cnt AS DOUBLE) / CAST(n AS DOUBLE) AS cf0
        FROM cum CROSS JOIN nn
    ), pw AS (
        SELECT bucket, cnt, cf, cf0,
               cf * cf AS cf2, cf0 * cf0 AS cf02
        FROM fr
    ), pw2 AS (
        SELECT *, cf2 * cf2 AS cf4, cf02 * cf02 AS cf04 FROM pw
    ), pw3 AS (
        SELECT *, cf4 * cf4 AS cf8, cf04 * cf04 AS cf08 FROM pw2
    ), pw4 AS (
        SELECT *, cf8 * cf8 AS cf16, cf08 * cf08 AS cf016 FROM pw3
    ), pw5 AS (
        SELECT *, cf16 * cf16 AS cf32, cf016 * cf016 AS cf032 FROM pw4
    ), ns(n_draws) AS (VALUES (1), (2), (4), (8), (16), (32))
    SELECT CAST(ns.n_draws AS BIGINT) AS n_draws, p.bucket,
           p.cnt AS n_docs, p.cf AS cum_frac,
           CASE ns.n_draws
                WHEN 1 THEN p.cf - p.cf0
                WHEN 2 THEN p.cf2 - p.cf02
                WHEN 4 THEN p.cf4 - p.cf04
                WHEN 8 THEN p.cf8 - p.cf08
                WHEN 16 THEN p.cf16 - p.cf016
                ELSE p.cf32 - p.cf032
           END AS p_max_bucket
    FROM pw5 p CROSS JOIN ns
    """,
    survey_ref="extension: best-of-n selection curve — the "
    "rejection-sampling/BoN analysis behind candidate-overgeneration "
    "pipelines: P(best of n i.i.d. draws lands in quality bucket b) = "
    "F(b)ⁿ − F(b−1)ⁿ from the empirical score CDF; the powers are "
    "explicit repeated squarings (n ∈ {1,2,4,8,16,32}), so no pow() "
    "and every value is a fixed IEEE product chain",
)
def q325_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """If you sample n candidates and keep the best-scoring one, where
    does quality land? Bucket the q31 document score into 16 bins,
    build the empirical CDF from exact counts, and emit the max-of-n
    distribution P(bucket | n) = F(b)ⁿ − F(b⁻)ⁿ for n = 1,2,4,8,16,32.
    The doubling grid means every power is a chain of squarings —
    bit-deterministic, unlike a libm pow — and each output row is pure
    row-local arithmetic (no cross-row double sums at all).

    Scale: one codegen scan + one 16-group aggregate; the CDF window
    runs over 16 rows; the n-grid is a 6-row broadcast cross join."""
    doc = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    score = (
        0.4 * F.least(F.size(toks) / F.lit(100.0), F.lit(1.0))
        + 0.3 * text.stopword_ratio(F.col("text"))
        + 0.3 * (1.0 - text.punct_ratio(F.col("text")))
    )
    bk = (
        doc.select(
            F.least(F.floor(score * 16.0).cast("long"), F.lit(15)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = bk.select(
        "bucket", "cnt", F.sum("cnt").over(wb).cast("long").alias("c")
    )
    nn = bk.agg(F.sum("cnt").cast("long").alias("n"))
    fr = cum.crossJoin(F.broadcast(nn)).select(
        "bucket",
        "cnt",
        (F.col("c").cast("double") / F.col("n").cast("double")).alias("cf"),
        ((F.col("c") - F.col("cnt")).cast("double") / F.col("n").cast("double")).alias(
            "cf0"
        ),
    )
    p = fr
    for col, src in [("cf2", "cf"), ("cf02", "cf0")]:
        p = p.withColumn(col, F.col(src) * F.col(src))
    for a, b in [("cf4", "cf2"), ("cf04", "cf02"), ("cf8", "cf4"), ("cf08", "cf04"),
                 ("cf16", "cf8"), ("cf016", "cf08"), ("cf32", "cf16"),
                 ("cf032", "cf016")]:
        p = p.withColumn(a, F.col(b) * F.col(b))
    ns = spark.createDataFrame([(1,), (2,), (4,), (8,), (16,), (32,)], "n_draws long")
    pick = (
        F.when(F.col("n_draws") == 1, F.col("cf") - F.col("cf0"))
        .when(F.col("n_draws") == 2, F.col("cf2") - F.col("cf02"))
        .when(F.col("n_draws") == 4, F.col("cf4") - F.col("cf04"))
        .when(F.col("n_draws") == 8, F.col("cf8") - F.col("cf08"))
        .when(F.col("n_draws") == 16, F.col("cf16") - F.col("cf016"))
        .otherwise(F.col("cf32") - F.col("cf032"))
    )
    return p.crossJoin(F.broadcast(ns)).select(
        "n_draws",
        "bucket",
        F.col("cnt").alias("n_docs"),
        F.col("cf").alias("cum_frac"),
        pick.alias("p_max_bucket"),
    )


# Standard-normal quantiles, host-computed once (scipy-free constants:
# Φ⁻¹(0.975) and Φ⁻¹(0.8)), embedded as e-notation literals per the
# q309 lesson — both engines parse the same 18-significant-digit text
# to the same IEEE double.
_Z_ALPHA_HALF = "1.95996398454005423e0"  # two-sided α = 0.05
_Z_POWER = "8.41621233572914406e-1"  # power = 0.80


@register(
    "q326_ab_power_planner",
    oracle=f"""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem
    ), traffic AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS n_days
        FROM orders
    ), deltas(delta) AS (VALUES (5e-3), (1e-2), (2e-2), (5e-2)),
    calc AS (
        SELECT d.delta,
               CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE) AS p,
               ({_Z_ALPHA_HALF} + {_Z_POWER})
               * ({_Z_ALPHA_HALF} + {_Z_POWER}) AS zsum2,
               CAST(t.n_orders AS DOUBLE) / CAST(t.n_days AS DOUBLE)
                   AS orders_per_day
        FROM deltas d CROSS JOIN base b CROSS JOIN traffic t
    )
    SELECT delta, p AS baseline_rate,
           zsum2 * (p * (1e0 - p) + (p + delta) * (1e0 - p - delta))
               / (delta * delta) AS n_per_arm,
           CAST(ceil(zsum2 * (p * (1e0 - p) + (p + delta) * (1e0 - p - delta))
                / (delta * delta)) AS BIGINT) AS n_per_arm_ceil,
           orders_per_day,
           CAST(ceil(2e0 * (zsum2 * (p * (1e0 - p)
                                     + (p + delta) * (1e0 - p - delta))
                            / (delta * delta)) / orders_per_day)
                AS BIGINT) AS days_needed
    FROM calc
    """,
    survey_ref="extension: A/B sample-size / power planner — the "
    "two-proportion formula n = (z_α/2+z_β)²·[p(1−p)+(p+δ)(1−p−δ)]/δ² "
    "fed by the corpus's own baseline rate and daily traffic; the "
    "planning complement to q141's analysis and q247's SRM check, with "
    "the normal quantiles as host-literal constants (q309 discipline)",
)
def q326_ab_power_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before running the experiment q141 analyzes: for a grid of
    minimum detectable effects δ, how many units per arm — and at the
    observed traffic, how many days — does an α=0.05 / power=0.80
    two-proportion test need? Baseline rate and orders/day come from
    the data (exact integer counts); the z constants are embedded
    literals; everything else is fixed-order double arithmetic, so the
    plan hash-matches.

    Scale: two map-side-combinable aggregates feeding a 4-row grid."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("long")).cast("long").alias("pos"),
    )
    o = load_table(spark, sf_dir, "orders")
    traffic = o.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.countDistinct("o_orderdate").cast("long").alias("n_days"),
    )
    deltas = spark.createDataFrame(
        [(0.005,), (0.01,), (0.02,), (0.05,)], "delta double"
    )
    za, zb = float(_Z_ALPHA_HALF), float(_Z_POWER)
    zsum2 = (F.lit(za) + F.lit(zb)) * (F.lit(za) + F.lit(zb))
    p = F.col("pos").cast("double") / F.col("n").cast("double")
    opd = F.col("n_orders").cast("double") / F.col("n_days").cast("double")
    calc = (
        deltas.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(traffic))
        .select("delta", p.alias("p"), zsum2.alias("zsum2"), opd.alias("orders_per_day"))
    )
    n_arm = (
        F.col("zsum2")
        * (
            F.col("p") * (1.0 - F.col("p"))
            + (F.col("p") + F.col("delta")) * (1.0 - F.col("p") - F.col("delta"))
        )
        / (F.col("delta") * F.col("delta"))
    )
    return calc.select(
        "delta",
        F.col("p").alias("baseline_rate"),
        n_arm.alias("n_per_arm"),
        F.ceil(n_arm).cast("long").alias("n_per_arm_ceil"),
        "orders_per_day",
        F.ceil(2.0 * n_arm / F.col("orders_per_day")).cast("long").alias("days_needed"),
    )


# ---------------------------------------------------------------------------
# Batch 33 (round 5, cont.): categorical association, sequential testing,
# survey raking
# ---------------------------------------------------------------------------

_CRAMER_PAIRS = [
    ("prio_x_status", "prio", "status"),
    ("prio_x_segment", "prio", "seg"),
    ("status_x_segment", "status", "seg"),
]


def _cramers_oracle() -> str:
    """DuckDB oracle for q327: χ² and Cramér's V per categorical pair,
    over the FULL r×c grid (absent cells contribute their expected
    count), χ² folded in (va, vb) cell order."""
    blocks = []
    for tag, ca, cb in _CRAMER_PAIRS:
        blocks.append(f"""
        SELECT '{tag}' AS pair, n_t.n,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list((CAST(o AS DOUBLE)
                         - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                           / CAST(n_t.n AS DOUBLE))
                        * (CAST(o AS DOUBLE)
                           - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                             / CAST(n_t.n AS DOUBLE))
                        / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                           / CAST(n_t.n AS DOUBLE))
                        ORDER BY va, vb)), (x, y) -> x + y) AS chi2,
               CAST((rd.k - 1) * (cd.k - 1) AS BIGINT) AS dof,
               CAST(least(rd.k - 1, cd.k - 1) AS BIGINT) AS minrc
        FROM (
            SELECT r.va, c.vb, r.nr, c.nc, COALESCE(t.o, 0) AS o
            FROM (SELECT {ca} AS va, CAST(COUNT(*) AS BIGINT) AS nr
                  FROM j GROUP BY 1) r
            CROSS JOIN (SELECT {cb} AS vb, CAST(COUNT(*) AS BIGINT) AS nc
                        FROM j GROUP BY 1) c
            LEFT JOIN (SELECT {ca} AS va, {cb} AS vb,
                              CAST(COUNT(*) AS BIGINT) AS o
                       FROM j GROUP BY 1, 2) t
              ON r.va = t.va AND c.vb = t.vb
        ) grid
        CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j) n_t
        CROSS JOIN (SELECT COUNT(*) AS k
                    FROM (SELECT DISTINCT {ca} FROM j)) rd
        CROSS JOIN (SELECT COUNT(*) AS k
                    FROM (SELECT DISTINCT {cb} FROM j)) cd
        GROUP BY n_t.n, rd.k, cd.k""")
    union = "\n        UNION ALL\n".join(blocks)
    return f"""
    WITH j AS (
        SELECT o.o_orderpriority AS prio, o.o_orderstatus AS status,
               c.c_mktsegment AS seg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), stats AS ({union}
    )
    SELECT pair, n, chi2, dof,
           sqrt(chi2 / (CAST(n AS DOUBLE) * CAST(minrc AS DOUBLE)))
               AS cramers_v
    FROM stats
    """


@register(
    "q327_cramers_v",
    oracle=_cramers_oracle(),
    survey_ref="extension: categorical association profile — χ² and "
    "Cramér's V for every attribute pair in one pass (the effect-size "
    "companion to q205's χ² drift and q289's FD discovery: V≈1 means "
    "a near-functional dependency, V≈0 independence); the full r×c "
    "grid including absent cells, χ² folded in cell order",
)
def q327_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How strongly are the categorical attributes of the order stream
    associated? For each pair, the χ² statistic over the COMPLETE r×c
    grid (absent combinations contribute their full expected count —
    dropping them understates χ², a classic profiling bug) and the
    normalized Cramér's V = sqrt(χ²/(n·min(r−1,c−1))), which is
    comparable across pairs with different cardinalities. Marginals
    and observed cells are exact integers; expected counts form in
    doubles (scale-safe past int64 products); the cell fold is pinned.

    Scale: one shuffle for the base join, then per pair one
    map-side-combinable cell aggregate; grids are |domain|² rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("seg")
    )
    j = o.join(c, "o_custkey").select("prio", "status", "seg")

    outs = []
    for tag, ca, cb in _CRAMER_PAIRS:
        rm = j.groupBy(F.col(ca).alias("va")).agg(
            F.count("*").cast("long").alias("nr")
        )
        cm = j.groupBy(F.col(cb).alias("vb")).agg(
            F.count("*").cast("long").alias("nc")
        )
        cells = j.groupBy(F.col(ca).alias("va"), F.col(cb).alias("vb")).agg(
            F.count("*").cast("long").alias("o")
        )
        n_t = j.agg(F.count("*").cast("long").alias("n"))
        rd = rm.agg(F.count("*").alias("rk"))
        cd = cm.agg(F.count("*").alias("ck"))
        grid = (
            rm.crossJoin(F.broadcast(cm))
            .join(cells, ["va", "vb"], "left")
            .select(
                "va", "vb", "nr", "nc",
                F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o"),
            )
        )
        e = (
            F.col("nr").cast("double") * F.col("nc").cast("double")
            / F.col("n").cast("double")
        )
        term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
        folded = (
            grid.crossJoin(F.broadcast(n_t))
            .groupBy("n")
            .agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("va").alias("va"),
                                F.col("vb").alias("vb"),
                                term.alias("t"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x["t"],
                ).alias("chi2")
            )
        )
        outs.append(
            folded.crossJoin(F.broadcast(rd))
            .crossJoin(F.broadcast(cd))
            .select(
                F.lit(tag).alias("pair"),
                "n",
                "chi2",
                ((F.col("rk") - 1) * (F.col("ck") - 1)).cast("long").alias("dof"),
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n").cast("double")
                        * F.least(F.col("rk") - 1, F.col("ck") - 1).cast("double")
                    )
                ).alias("cramers_v"),
            )
        )
    out = outs[0]
    for more in outs[1:]:
        out = out.unionByName(more)
    return out


# O'Brien–Fleming boundary constant for K=5 looks at two-sided α=0.05,
# the standard tabulated value (Jennison & Turnbull tab. 2.1), embedded
# as an e-notation literal per the q309/q326 discipline.
_OBF_C5 = "2.0401e0"


@register(
    "q328_group_sequential",
    oracle=f"""
    WITH arms AS (
        SELECT o_orderdate AS day, o_orderkey % 2 AS arm,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS conv
        FROM orders
    ), days AS (
        SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rn,
               COUNT(*) OVER () AS nd
        FROM (SELECT DISTINCT day FROM arms)
    ), looks AS (
        SELECT day, CAST((rn - 1) * 5 // nd + 1 AS BIGINT) AS k FROM days
    ), per AS (
        SELECT l.k,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        FROM arms a JOIN looks l ON a.day = l.day GROUP BY 1
    ), cum AS (
        SELECT k,
               CAST(SUM(n0) OVER (ORDER BY k) AS BIGINT) AS n0,
               CAST(SUM(n1) OVER (ORDER BY k) AS BIGINT) AS n1,
               CAST(SUM(c0) OVER (ORDER BY k) AS BIGINT) AS c0,
               CAST(SUM(c1) OVER (ORDER BY k) AS BIGINT) AS c1
        FROM per
    ), z AS (
        SELECT k, n0, n1, c0, c1,
               (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / sqrt(CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                      * (1e0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                      * (1e0 / CAST(n0 AS DOUBLE) + 1e0 / CAST(n1 AS DOUBLE)))
                   AS z_stat,
               {_OBF_C5} * sqrt(5e0 / CAST(k AS DOUBLE)) AS boundary
        FROM cum
    )
    SELECT k AS look, n0 AS cum_n_ctrl, n1 AS cum_n_treat,
           c0 AS cum_conv_ctrl, c1 AS cum_conv_treat,
           z_stat, boundary, abs(z_stat) > boundary AS crossed
    FROM z
    """,
    survey_ref="extension: group-sequential monitoring (O'Brien–"
    "Fleming, K=5) — the peeking-safe interim-analysis schedule that "
    "completes the experimentation family (q141 analysis, q247 SRM, "
    "q262 Wilson CI, q326 power planning): five calendar looks, "
    "cumulative two-proportion z per look against the spending "
    "boundary C·sqrt(K/k)",
)
def q328_group_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can the experiment stop early without inflating false positives?
    The order timeline is cut into 5 looks (equal spans of DISTINCT
    days, deterministic row-number binning over the tiny day
    dimension); at each look the cumulative two-proportion z between
    the even/odd-orderkey arms is compared to the O'Brien–Fleming
    boundary 2.0401·√(5/k) — very strict early, ≈2.04 at the final
    look. Counts stay integer through the cumulative stage; z and the
    boundary are fixed-order double arithmetic + exact sqrts.

    Scale: one map-side-combinable (look, arm) aggregate after a
    broadcast join of the day→look map; windows run over 5 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("day"),
        (F.col("o_orderkey") % 2).alias("arm"),
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("conv"),
    )
    days = (
        o.select("day")
        .distinct()
        .select(
            "day",
            F.row_number().over(Window.orderBy("day")).alias("rn"),
            F.count("*").over(Window.partitionBy()).alias("nd"),
        )
    )
    looks = days.select(
        "day", F.expr("CAST((rn - 1) * 5 div nd + 1 AS BIGINT)").alias("k")
    )
    per = (
        o.join(F.broadcast(looks), "day")
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long").alias("n0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long").alias("n1"),
            F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
            .cast("long").alias("c0"),
            F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
            .cast("long").alias("c1"),
        )
    )
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "k",
        F.sum("n0").over(wk).cast("long").alias("n0"),
        F.sum("n1").over(wk).cast("long").alias("n1"),
        F.sum("c0").over(wk).cast("long").alias("c0"),
        F.sum("c1").over(wk).cast("long").alias("c1"),
    )
    p_pool = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    z = (
        F.col("c1").cast("double") / F.col("n1").cast("double")
        - F.col("c0").cast("double") / F.col("n0").cast("double")
    ) / F.sqrt(
        p_pool
        * (1.0 - p_pool)
        * (1.0 / F.col("n0").cast("double") + 1.0 / F.col("n1").cast("double"))
    )
    boundary = F.lit(float(_OBF_C5)) * F.sqrt(5.0 / F.col("k").cast("double"))
    return cum.select(
        F.col("k").alias("look"),
        F.col("n0").alias("cum_n_ctrl"),
        F.col("n1").alias("cum_n_treat"),
        F.col("c0").alias("cum_conv_ctrl"),
        F.col("c1").alias("cum_conv_treat"),
        z.alias("z_stat"),
        boundary.alias("boundary"),
        (F.abs(z) > boundary).alias("crossed"),
    )


def _raking_oracle(rounds: int = 3) -> str:
    """DuckDB oracle for q329: unrolled iterative-proportional-fitting
    rounds. Cell weights start at 1; each half-step rescales to one
    margin, with the current-margin sums folded in cell order."""
    parts = [
        """samp AS (
        SELECT c_nationkey AS nk, c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS s
        FROM customer WHERE c_acctbal >= 0 GROUP BY 1, 2
    ), tn AS (
        SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS t
        FROM customer GROUP BY 1
    ), ts AS (
        SELECT c_mktsegment AS seg, CAST(COUNT(*) AS BIGINT) AS t
        FROM customer GROUP BY 1
    ), w0 AS (
        SELECT nk, seg, s, CAST(1e0 AS DOUBLE) AS w FROM samp
    )"""
    ]
    for r in range(rounds):
        parts.append(f"""cn{r + 1} AS (
        SELECT nk, list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(w * CAST(s AS DOUBLE) ORDER BY seg)),
                   (x, y) -> x + y) AS cur
        FROM w{r} GROUP BY 1
    ), wn{r + 1} AS (
        SELECT w.nk, w.seg, w.s,
               w.w * (CAST(t.t AS DOUBLE) / c.cur) AS w
        FROM w{r} w JOIN cn{r + 1} c ON w.nk = c.nk
        JOIN tn t ON w.nk = t.nk
    ), cs{r + 1} AS (
        SELECT seg, list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(w * CAST(s AS DOUBLE) ORDER BY nk)),
                   (x, y) -> x + y) AS cur
        FROM wn{r + 1} GROUP BY 1
    ), w{r + 1} AS (
        SELECT w.nk, w.seg, w.s,
               w.w * (CAST(t.t AS DOUBLE) / c.cur) AS w
        FROM wn{r + 1} w JOIN cs{r + 1} c ON w.seg = c.seg
        JOIN ts t ON w.seg = t.seg
    )""")
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT w.nk AS nationkey, w.seg AS segment, w.s AS n_sample,
           tn.t AS target_nation, ts.t AS target_segment,
           w.w AS weight, w.w * CAST(w.s AS DOUBLE) AS weighted_count
    FROM w{rounds} w JOIN tn ON w.nk = tn.nk JOIN ts ON w.seg = ts.seg
    """
    )


@register(
    "q329_raking_ipf",
    oracle=_raking_oracle(rounds=3),
    survey_ref="extension: raking / iterative proportional fitting — "
    "the survey-weighting workhorse that reweights a biased sample "
    "(non-negative-balance customers) to match the full population's "
    "nation AND segment margins simultaneously; 3 unrolled IPF rounds "
    "(the q310 unrolled-MM discipline), margin sums folded in cell "
    "order so every weight hash-matches",
)
def q329_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification when the cross-tab target is unknown but
    the margins are: start every (nation, segment) sample cell at
    weight 1 and alternately rescale to the nation margins then the
    segment margins (3 rounds — IPF converges geometrically, and the
    fixed unroll keeps the plan pure algebra, no driver loop). Sample
    cell counts and both target margins are exact integers; each
    rescale is one fold over a margin's cells plus one multiply.

    Scale: margins and cells are |domains|-sized aggregates off one
    scan each; every IPF step is arithmetic on the ≤ r·c cell table —
    the 100 TB cost is the two base aggregates, nothing else."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nk"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    samp = (
        cust.filter(F.col("bal") >= 0)
        .groupBy("nk", "seg")
        .agg(F.count("*").cast("long").alias("s"))
    )
    tn = cust.groupBy("nk").agg(F.count("*").cast("long").alias("tn"))
    ts = cust.groupBy("seg").agg(F.count("*").cast("long").alias("ts"))
    w = samp.select("nk", "seg", "s", F.lit(1.0).alias("w"))

    def _fold(order_col: str) -> F.Column:
        return F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("o"),
                        (F.col("w") * F.col("s").cast("double")).alias("t"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["t"],
        )

    for _ in range(3):
        cn = w.groupBy("nk").agg(_fold("seg").alias("cur"))
        w = (
            w.join(cn, "nk")
            .join(F.broadcast(tn), "nk")
            .select(
                "nk", "seg", "s",
                (F.col("w") * (F.col("tn").cast("double") / F.col("cur"))).alias("w"),
            )
        )
        cs = w.groupBy("seg").agg(_fold("nk").alias("cur"))
        w = (
            w.join(cs, "seg")
            .join(F.broadcast(ts), "seg")
            .select(
                "nk", "seg", "s",
                (F.col("w") * (F.col("ts").cast("double") / F.col("cur"))).alias("w"),
            )
        )
    return (
        w.join(F.broadcast(tn), "nk")
        .join(F.broadcast(ts), "seg")
        .select(
            F.col("nk").alias("nationkey"),
            F.col("seg").alias("segment"),
            F.col("s").alias("n_sample"),
            F.col("tn").alias("target_nation"),
            F.col("ts").alias("target_segment"),
            F.col("w").alias("weight"),
            (F.col("w") * F.col("s").cast("double")).alias("weighted_count"),
        )
    )


# ---------------------------------------------------------------------------
# Batch 34 (round 5, cont.): curriculum ordering, sketch-vs-exact
# quantiles, DP-histogram mechanism
# ---------------------------------------------------------------------------


@register(
    "q330_curriculum_interleave",
    oracle="""
    WITH b AS (
        SELECT doc_id, least(n_chars // 400, 3) AS bucket
        FROM documents
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id)
                AS BIGINT) AS rank_in_bucket,
           CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                * 4 + bucket AS BIGINT) AS position
    FROM b
    """,
    survey_ref="extension: curriculum / interleaved training order — "
    "the deterministic data-ordering pass before sequence packing "
    "(q76): difficulty buckets emitted round-robin so every stride of "
    "4 positions mixes all difficulty levels; a pure rank computation "
    "(no shuffle beyond the bucket partition), reproducible across "
    "runs and engines",
)
def q330_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its position in an interleaved curriculum:
    bucket by length (a difficulty proxy, fixed 400-char strides capped
    at 4 buckets), rank within each bucket by doc_id, and interleave
    round-robin — position = (rank−1)·4 + bucket — so consecutive
    training batches always mix difficulties instead of sweeping easy
    to hard in one monotone pass (the failure mode interleaving
    exists to prevent). Every value is an integer; the ordering is a
    pure function of (doc_id, n_chars).

    Scale: one window per bucket partition (each bucket's rank stream
    is independent — partition-parallel); no global sort, no shuffle
    beyond the bucket hash."""
    doc = load_table(spark, sf_dir, "documents")
    b = doc.select(
        "doc_id",
        F.least(F.expr("n_chars div 400"), F.lit(3)).cast("long").alias("bucket"),
    )
    wb = Window.partitionBy("bucket").orderBy("doc_id")
    rn = F.row_number().over(wb).cast("long")
    return b.select(
        "doc_id",
        "bucket",
        rn.alias("rank_in_bucket"),
        ((rn - 1) * 4 + F.col("bucket")).cast("long").alias("position"),
    )


_SQ_SPECS = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10),
             ("p99", 99, 100)]
_SQ_SPECS_SQL = ", ".join(f"('{l}', {n}, {d})" for l, n, d in _SQ_SPECS)


@register(
    "q331_sampled_quantiles",
    oracle=f"""
    WITH v AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents,
               ({_mix31_sql("l_orderkey * 8 + l_linenumber")}) % 64 = 0
                   AS in_sample
        FROM lineitem
    ), fc AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS ct FROM v GROUP BY 1
    ), fcum AS (
        SELECT cents, ct,
               COALESCE(SUM(ct) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM fc
    ), fn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    sc AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS ct FROM v
        WHERE in_sample GROUP BY 1
    ), scum AS (
        SELECT cents, ct,
               COALESCE(SUM(ct) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        FROM sc
    ), sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v WHERE in_sample),
    specs(label, num, den) AS (VALUES {_SQ_SPECS_SQL}),
    fex AS (
        SELECT s.label, f.cents AS exact_cents
        FROM specs s CROSS JOIN fn
        JOIN fcum f ON f.cb < (s.num * fn.n + s.den - 1) // s.den
                   AND (s.num * fn.n + s.den - 1) // s.den <= f.cb + f.ct
    ), sex AS (
        SELECT s.label, f.cents AS est_cents
        FROM specs s CROSS JOIN sn
        JOIN scum f ON f.cb < (s.num * sn.n + s.den - 1) // s.den
                   AND (s.num * sn.n + s.den - 1) // s.den <= f.cb + f.ct
    )
    SELECT fex.label, sn.n AS n_sample, fn.n AS n_total,
           sex.est_cents, fex.exact_cents,
           abs(sex.est_cents - fex.exact_cents) AS abs_err_cents,
           CAST(abs(sex.est_cents - fex.exact_cents) AS DOUBLE)
               / CAST(fex.exact_cents AS DOUBLE) AS rel_err
    FROM fex JOIN sex ON fex.label = sex.label
    CROSS JOIN fn CROSS JOIN sn
    """,
    survey_ref="extension: sketch-vs-exact quantile audit — a "
    "deterministic 1/64 hash sample (the mergeable, coordinator-free "
    "sampling every quantile sketch reduces to) estimates the quantile "
    "grid and is scored IN THE SAME PLAN against the exact q304-style "
    "answer, emitting the absolute and relative error per quantile — "
    "the accuracy contract a sketch deployment documents",
)
def q331_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What error does a 1/64 deterministic hash sample introduce into
    the price-quantile grid? Both branches use the same exact-rank
    discipline (per-distinct-value counts, prefix sums, rank r =
    ⌈q·n⌉ located by cb < r ≤ cb+ct); the sample membership is a
    portable integer mixer on the row key, so the 'sketch' is
    reproducible anywhere. Output: estimated vs exact value per
    quantile with abs/relative error — the audit that justifies (or
    rejects) replacing q304's two-pass exact scan with a one-pass
    sample at 100 TB.

    Scale: the sample branch shrinks 64× before its prefix sum; both
    windows run over distinct values only (q308's shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        (_dec("l_extendedprice") * 100).cast("long").alias("cents"),
        (
            F.pmod(
                _mix31_col(F.col("l_orderkey") * 8 + F.col("l_linenumber")),
                F.lit(64).cast("long"),
            )
            == 0
        ).alias("in_sample"),
    )

    def branch(df: DataFrame):
        c = df.groupBy("cents").agg(F.count("*").cast("long").alias("ct"))
        wv = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
        cum = c.select(
            "cents", "ct", F.coalesce(F.sum("ct").over(wv), F.lit(0)).alias("cb")
        )
        n = df.agg(F.count("*").cast("long").alias("n"))
        return cum, n

    fcum, fn = branch(v)
    scum, sn = branch(v.filter(F.col("in_sample")))
    specs = spark.createDataFrame(_SQ_SPECS, "label string, num long, den long")

    def locate(cum: DataFrame, n: DataFrame, out: str) -> DataFrame:
        rank = F.expr("(num * n + den - 1) div den")
        return (
            specs.crossJoin(F.broadcast(n))
            .select("label", rank.alias("rank"))
            .join(
                cum,
                (F.col("cb") < F.col("rank"))
                & (F.col("rank") <= F.col("cb") + F.col("ct")),
            )
            .select("label", F.col("cents").alias(out))
        )

    fex = locate(fcum, fn, "exact_cents")
    sex = locate(scum, sn, "est_cents")
    return (
        fex.join(sex, "label")
        .crossJoin(F.broadcast(fn.select(F.col("n").alias("n_total"))))
        .crossJoin(F.broadcast(sn.select(F.col("n").alias("n_sample"))))
        .select(
            "label",
            "n_sample",
            "n_total",
            "est_cents",
            "exact_cents",
            F.abs(F.col("est_cents") - F.col("exact_cents")).alias("abs_err_cents"),
            (
                F.abs(F.col("est_cents") - F.col("exact_cents")).cast("double")
                / F.col("exact_cents").cast("double")
            ).alias("rel_err"),
        )
    )


def _two_sided_geometric_cum(alpha: float, kmax: int = 8) -> list[str]:
    """Host-computed CDF thresholds of the two-sided geometric
    distribution P(K=k) ∝ α^|k| on k ∈ [−kmax, kmax] (the discrete
    Laplace / geometric mechanism of Ghosh-Roughgarden-Sundararajan),
    renormalized to the truncated support and emitted as e-notation
    literals (q309 discipline)."""
    ks = list(range(-kmax, kmax + 1))
    mass = [alpha ** abs(k) for k in ks]
    tot = sum(mass)
    cum, acc = [], 0.0
    for m in mass[:-1]:  # last bucket is the ELSE arm
        acc += m / tot
        cum.append(f"{acc:.17e}")
    return cum


_DP_ALPHA = 0.36787944117144233  # e^{-1}: two-sided geometric at eps=1
_DP_CUM = _two_sided_geometric_cum(_DP_ALPHA)


def _dp_noise_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k - 8}" for k, c in enumerate(_DP_CUM)
    )
    return f"CASE {branches} ELSE 8 END"


def _dp_noise_col(u: F.Column) -> F.Column:
    out = F.lit(8)
    for k, c in reversed(list(enumerate(_DP_CUM))):
        out = F.when(u < F.lit(float(c)), F.lit(k - 8)).otherwise(out)
    return out


@register(
    "q332_dp_histogram",
    oracle=f"""
    WITH h AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_true
        FROM customer GROUP BY 1
    ), u AS (
        SELECT nationkey, n_true,
               CAST(({_mix31_sql("nationkey * 7919 + 17")}) AS DOUBLE)
                   / 2147483648e0 AS uu
        FROM h
    )
    SELECT nationkey, n_true,
           CAST({_dp_noise_sql("uu")} AS BIGINT) AS noise,
           CAST(greatest(n_true + {_dp_noise_sql("uu")}, 0) AS BIGINT)
               AS n_released
    FROM u
    """,
    survey_ref="extension: differential-privacy histogram mechanism — "
    "the geometric (discrete-Laplace) mechanism of Ghosh et al. at "
    "ε=1 over per-nation counts, with the noise drawn from a "
    "DETERMINISTIC portable hash through host-literal inverse-CDF "
    "thresholds (q309's Poisson trick applied to the two-sided "
    "geometric) so the released histogram is engine-reproducible; "
    "n_true is emitted alongside for the oracle/audit — a production "
    "release would project it away and use a secret seed",
)
def q332_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ε=1 geometric mechanism over the customers-per-nation
    histogram: each count is perturbed by two-sided geometric noise
    (P(K=k) ∝ e^{−|k|}, truncated at ±8 which carries ~1−1e-7 of the
    mass) and clamped at zero. The 'randomness' is the q224 integer
    mixer seeded by the category key, pushed through 16 shared
    e-notation CDF literals — so both engines release identical
    histograms, which is what makes the mechanism testable here (a
    deployment would key the mixer with a secret salt and drop
    n_true).

    Scale: one map-side-combinable aggregate plus row-local noise —
    the mechanism adds zero shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    h = cust.groupBy(F.col("c_nationkey").cast("long").alias("nationkey")).agg(
        F.count("*").cast("long").alias("n_true")
    )
    uu = _mix31_col(F.col("nationkey") * 7919 + 17).cast("double") / F.lit(
        2147483648.0
    )
    noise = _dp_noise_col(uu).cast("long")
    return h.select(
        "nationkey",
        "n_true",
        noise.alias("noise"),
        F.greatest(F.col("n_true") + noise, F.lit(0).cast("long"))
        .cast("long")
        .alias("n_released"),
    )


# ---------------------------------------------------------------------------
# Batch 31 (round 5): portable natural log + the information-theoretic /
# evaluation operators it unlocks (ANOVA, mutual information, PSI drift,
# t-closeness, average precision)
# ---------------------------------------------------------------------------

_PLN_LN2 = 0.6931471805599453  # repr(math.log(2.0)) — correctly-rounded literal
_PLN_COEFFS = [1.0 / k for k in (3, 5, 7, 9, 11, 13, 15, 17, 19)]


def _pln_horner_sql(s: str) -> str:
    """Horner form of the atanh series 1 + s/3 + s²/5 + … over a named
    s = t² column — textually identical association order to the Spark
    builder in _pln_col, so both engines execute the same IEEE ops."""
    poly = f"{_PLN_COEFFS[-1]!r}e0"
    for c in reversed(_PLN_COEFFS[:-1]):
        poly = f"({c!r}e0 + {s} * {poly})"
    return f"(1e0 + {s} * {poly})"


def _pln_ctes(src: str, num: str, den: str, out: str, tag: str) -> str:
    """CTE chain computing ``out`` = portable ln(num/den) from relation
    ``src`` (num/den must be positive BIGINT columns), carrying every
    other column through.

    Portable ln: the engines' own ln() builtins guarantee only ~1-ulp
    accuracy, not BIT-identical results, so (like every transcendental
    in this file) it is never called. Instead: (1) the binary exponent
    e comes from bit lengths — length(bin(num)) − length(bin(den)) —
    exact integer ops; (2) the mantissa m = (num≪max(−e,0)) /
    (den≪max(e,0)) ∈ [0.5,2) is ONE correctly-rounded double division
    (shifts stay exact: the shifted side is < 2^52 by construction,
    since shifting by the bit-length difference equalizes magnitudes);
    (3) ln(m) = 2·atanh(t), t = (m−1)/(m+1) ∈ (−1/3,1/3), via a
    10-term Horner polynomial whose decimal literals parse to the same
    doubles in both engines; (4) ln(x) = ln(m) + e·ln2 with ln2 a
    correctly-rounded literal. Every step is exact-operand IEEE
    arithmetic ⇒ bit-identical across engines (probed over 14 decades);
    semantic accuracy vs true ln is ~4e-11 relative (series tail
    t^21/21 at |t|≤1/3) — pinned by tests/test_round5c_queries.py."""
    m0 = f"{tag}_m0"
    return f"""{tag}_a AS (
        SELECT *, (length(bin({num})) - length(bin({den}))) AS {tag}_e FROM {src}
    ), {tag}_b AS (
        SELECT *, CAST(({num}) << greatest(-{tag}_e, 0) AS DOUBLE)
                  / CAST(({den}) << greatest({tag}_e, 0) AS DOUBLE) AS {m0}
        FROM {tag}_a
    ), {tag}_c AS (
        SELECT *, CASE WHEN {m0} < 1e0 THEN {m0} * 2e0 ELSE {m0} END AS {tag}_m,
               CASE WHEN {m0} < 1e0 THEN {tag}_e - 1 ELSE {tag}_e END AS {tag}_e2
        FROM {tag}_b
    ), {tag}_d AS (
        SELECT *, ({tag}_m - 1e0) / ({tag}_m + 1e0) AS {tag}_t FROM {tag}_c
    ), {tag}_f AS (
        SELECT *, {tag}_t * {tag}_t AS {tag}_s FROM {tag}_d
    ), {tag} AS (
        SELECT *, 2e0 * {tag}_t * {_pln_horner_sql(f"{tag}_s")}
                  + CAST({tag}_e2 AS DOUBLE) * {_PLN_LN2!r}e0 AS {out}
        FROM {tag}_f
    )"""


def _pln_stage(df: DataFrame, num: str, den: str, out: str, tag: str) -> DataFrame:
    """Spark twin of _pln_ctes — same operand sequence, staged through
    NAMED columns exactly like the SQL CTE chain. Staging matters: a
    single nested Column would duplicate each subterm in the expression
    tree (t appears 18×, the mantissa division 100+×, ~33 kB of plan
    per call — measured 2× slower end-to-end from py4j build + codegen
    alone). Catalyst may collapse the projections back, but it does so
    JVM-side with subexpression elimination in codegen; results are
    bit-identical to the nested form (probe-verified)."""
    e, m0, m, e2, t, s = (f"{tag}_{x}" for x in ("e", "m0", "m", "e2", "t", "s"))
    df = df.withColumn(
        e, F.length(F.bin(F.col(num))) - F.length(F.bin(F.col(den)))
    )
    df = df.withColumn(
        m0,
        F.call_function(
            "shiftleft", F.col(num), F.greatest(-F.col(e), F.lit(0))
        ).cast("double")
        / F.call_function(
            "shiftleft", F.col(den), F.greatest(F.col(e), F.lit(0))
        ).cast("double"),
    )
    df = df.withColumn(
        m, F.when(F.col(m0) < 1.0, F.col(m0) * 2.0).otherwise(F.col(m0))
    )
    df = df.withColumn(e2, F.when(F.col(m0) < 1.0, F.col(e) - 1).otherwise(F.col(e)))
    df = df.withColumn(t, (F.col(m) - F.lit(1.0)) / (F.col(m) + F.lit(1.0)))
    df = df.withColumn(s, F.col(t) * F.col(t))
    # Horner as a fold over the literal coefficient array: one copy of
    # the s subtree in the lambda instead of eight in a nested tree —
    # the step (c + s·acc) runs in the same order as the SQL side's
    # nested literals, so results stay bit-identical (probe-verified)
    arr = F.array(*[F.lit(c) for c in reversed(_PLN_COEFFS[:-1])])
    poly = F.aggregate(arr, F.lit(_PLN_COEFFS[-1]), lambda acc, c: c + F.col(s) * acc)
    df = df.withColumn(
        out,
        F.lit(2.0) * F.col(t) * (F.lit(1.0) + F.col(s) * poly)
        + F.col(e2).cast("double") * F.lit(_PLN_LN2),
    )
    return df.drop(e, m0, m, e2, t, s)


def _fold_sql(term: str, order: str) -> str:
    """The pinned-order double fold (q178/q316 pattern) as DuckDB SQL."""
    return f"""list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
               list({term} ORDER BY {order})), (a, b) -> a + b)"""


def _fold_col(keys: list[str], term: F.Column) -> F.Column:
    """Spark twin of _fold_sql: sort collected (key…, term) structs,
    fold left-to-right from an exact 0.0 seed."""
    fields = [F.col(k).alias(k) for k in keys] + [term.alias("__t")]
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(*fields))),
        F.lit(0.0),
        lambda acc, x: acc + x["__t"],
    )
