"""Queries: graph, time-series and model-diagnostic queries (q366-q390).

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

from ._p1_parity_corpus import (
    _dec,
    _duck_cos,
    _duck_tokens,
    _ivf_oracle,
    _lang_oracle,
    load_events,
    load_table,
    register,
    similarity,
    text,
)
from ._p6_llm_eval import _math, _pln_ctes, _pln_stage
from ._p7_stats_tests import _pexp_ctes, _pexp_stage




@register(
    "q366_vif",
    oracle="""
    WITH x AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
               CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS x3
        FROM lineitem
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(x3) AS BIGINT) AS s3,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               CAST(SUM(x3 * x3) AS BIGINT) AS s33,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x1 * x3) AS BIGINT) AS s13,
               CAST(SUM(x2 * x3) AS BIGINT) AS s23
        FROM x
    ), r AS (
        SELECT n,
               CAST(n * s12 - s1 * s2 AS DOUBLE)
                   / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                          * CAST(n * s22 - s2 * s2 AS DOUBLE)) AS r12,
               CAST(n * s13 - s1 * s3 AS DOUBLE)
                   / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                          * CAST(n * s33 - s3 * s3 AS DOUBLE)) AS r13,
               CAST(n * s23 - s2 * s3 AS DOUBLE)
                   / sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)
                          * CAST(n * s33 - s3 * s3 AS DOUBLE)) AS r23
        FROM m
    ), r2s AS (
        SELECT n, r12, r13, r23,
               (r12 * r12 + r13 * r13 - 2e0 * r12 * r13 * r23)
                   / (1e0 - r23 * r23) AS rsq1,
               (r12 * r12 + r23 * r23 - 2e0 * r12 * r23 * r13)
                   / (1e0 - r13 * r13) AS rsq2,
               (r13 * r13 + r23 * r23 - 2e0 * r13 * r23 * r12)
                   / (1e0 - r12 * r12) AS rsq3
        FROM r
    )
    SELECT 'quantity' AS regressor, n, r12 AS r_with_a, r13 AS r_with_b,
           rsq1 AS r_squared, 1e0 / (1e0 - rsq1) AS vif FROM r2s
    UNION ALL
    SELECT 'discount', n, r12, r23, rsq2, 1e0 / (1e0 - rsq2) FROM r2s
    UNION ALL
    SELECT 'tax', n, r13, r23, rsq3, 1e0 / (1e0 - rsq3) FROM r2s
    """,
    survey_ref="extension: variance inflation factors for the "
    "(quantity, discount, tax) regressor set — the multicollinearity "
    "pre-check before q202's groupwise OLS is trusted; 3-variable "
    "closed form R²_j = (r_jk² + r_jl² − 2r_jk·r_jl·r_kl)/(1 − r_kl²) "
    "over exact integer moment sums",
)
def q366_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIF per regressor from the exact pairwise correlation matrix:
    all nine moment sums are BIGINTs in one aggregate (cents-scaled
    decimals for the rate columns), each r is one mirrored double
    expression, and the 3-variable R² inverse is closed-form — no
    iterative regression anywhere. VIF ≈ 1 clears the regressor;
    VIF > 5-10 flags collinearity.

    Scale: one map-side-combinable aggregate; at 100 TB the n·s_jk
    products move to the q312-class double formation (here they peak
    ~1e17, inside int64)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_quantity").cast("long").alias("x1"),
        (_dec("l_discount") * 100).cast("long").alias("x2"),
        (_dec("l_tax") * 100).cast("long").alias("x3"),
    )
    m = x.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum("x3").cast("long").alias("s3"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.col("x3") * F.col("x3")).cast("long").alias("s33"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x1") * F.col("x3")).cast("long").alias("s13"),
        F.sum(F.col("x2") * F.col("x3")).cast("long").alias("s23"),
    )
    r = m.select(
        "n",
        F.expr(
            "CAST(n * s12 - s1 * s2 AS DOUBLE)"
            " / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)"
            " * CAST(n * s22 - s2 * s2 AS DOUBLE))"
        ).alias("r12"),
        F.expr(
            "CAST(n * s13 - s1 * s3 AS DOUBLE)"
            " / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)"
            " * CAST(n * s33 - s3 * s3 AS DOUBLE))"
        ).alias("r13"),
        F.expr(
            "CAST(n * s23 - s2 * s3 AS DOUBLE)"
            " / sqrt(CAST(n * s22 - s2 * s2 AS DOUBLE)"
            " * CAST(n * s33 - s3 * s3 AS DOUBLE))"
        ).alias("r23"),
    )
    r2s = r.select(
        "n",
        "r12",
        "r13",
        "r23",
        F.expr(
            "(r12 * r12 + r13 * r13 - 2e0 * r12 * r13 * r23)"
            " / (1e0 - r23 * r23)"
        ).alias("rsq1"),
        F.expr(
            "(r12 * r12 + r23 * r23 - 2e0 * r12 * r23 * r13)"
            " / (1e0 - r13 * r13)"
        ).alias("rsq2"),
        F.expr(
            "(r13 * r13 + r23 * r23 - 2e0 * r13 * r23 * r12)"
            " / (1e0 - r12 * r12)"
        ).alias("rsq3"),
    )
    rows = F.array(
        F.struct(
            F.lit("quantity").alias("regressor"),
            F.col("n").alias("n"),
            F.col("r12").alias("r_with_a"),
            F.col("r13").alias("r_with_b"),
            F.col("rsq1").alias("r_squared"),
            (F.lit(1.0) / (F.lit(1.0) - F.col("rsq1"))).alias("vif"),
        ),
        F.struct(
            F.lit("discount").alias("regressor"),
            F.col("n").alias("n"),
            F.col("r12").alias("r_with_a"),
            F.col("r23").alias("r_with_b"),
            F.col("rsq2").alias("r_squared"),
            (F.lit(1.0) / (F.lit(1.0) - F.col("rsq2"))).alias("vif"),
        ),
        F.struct(
            F.lit("tax").alias("regressor"),
            F.col("n").alias("n"),
            F.col("r13").alias("r_with_a"),
            F.col("r23").alias("r_with_b"),
            F.col("rsq3").alias("r_squared"),
            (F.lit(1.0) / (F.lit(1.0) - F.col("rsq3"))).alias("vif"),
        ),
    )
    return r2s.select(F.explode(rows).alias("x")).select(
        "x.regressor", "x.n", "x.r_with_a", "x.r_with_b", "x.r_squared", "x.vif"
    )


# ---------------------------------------------------------------------------
# Batch 39 (round 5): multiple-testing correction (portable erfc),
# phonetic blocking, randomization inference, Granger causality
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 erfc for x >= 0: erfc(x) = P(t)·exp(−x²),
# t = 1/(1 + 0.3275911·x), |abs err| ≤ 1.5e-7 (deterministic: the
# approximation itself is the SPEC both engines implement, so the
# oracle matches bit-for-bit even where it differs from true erfc).
def _erfc_poly(t: str) -> str:
    """Horner text for a1·t + … + a5·t⁵ over a named t column — used
    VERBATIM by both engines (same association order ⇒ same doubles)."""
    return (
        f"(((((1.061405429e0 * {t} - 1.453152027e0) * {t}"
        f" + 1.421413741e0) * {t} - 2.84496736e-1) * {t}"
        f" + 2.54829592e-1) * {t})"
    )


_Q367_Z = (
    "(CAST(k_i AS DOUBLE) / CAST(n_i AS DOUBLE)"
    " - CAST(kk - k_i AS DOUBLE) / CAST(nn - n_i AS DOUBLE))"
    " / sqrt(CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE)"
    " * (1e0 - CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE))"
    " * (1e0 / CAST(n_i AS DOUBLE) + 1e0 / CAST(nn - n_i AS DOUBLE)))"
)
_Q367_HOLM = "CAST(m - rk + 1 AS DOUBLE) * p_raw"
_Q367_BH = "p_raw * CAST(m AS DOUBLE) / CAST(rk AS DOUBLE)"


@register(
    "q367_multiple_testing",
    oracle=f"""
    WITH base AS (
        SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k_i
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS nn, CAST(SUM(k_i) AS BIGINT) AS kk,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM base
    ), zt AS (
        SELECT b.nation, b.n_i, b.k_i, t.nn, t.kk, t.m, {_Q367_Z} AS z
        FROM base b CROSS JOIN tot t
    ), xt AS (
        SELECT *, abs(z) / 1.4142135623730951e0 AS xv FROM zt
    ), tt AS (
        SELECT *, 1e0 / (1e0 + 3.275911e-1 * xv) AS tv, -(xv * xv) AS xa
        FROM xt
    ), {_pexp_ctes("tt", "xa", "ex", "pe")},
    pv AS (
        SELECT nation, n_i, k_i, z, m, {_erfc_poly("tv")} * ex AS p_raw
        FROM pe
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_raw, nation) AS BIGINT)
                      AS rk
        FROM pv
    ), adj AS (
        SELECT *,
               LEAST(MAX({_Q367_HOLM}) OVER (ORDER BY rk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     1e0) AS p_holm,
               LEAST(MIN({_Q367_BH}) OVER (ORDER BY rk
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
                     1e0) AS p_bh
        FROM ranked
    )
    SELECT nation, n_i AS n_orders, k_i AS n_urgent, z, p_raw, p_holm, p_bh,
           p_holm <= 5e-2 AS reject_holm, p_bh <= 1e-1 AS reject_bh
    FROM adj
    """,
    survey_ref="extension: the multiple-comparisons layer every "
    "metrics platform needs over q141-class per-segment tests — "
    "per-nation two-proportion z (urgent-order share vs rest of "
    "world), two-sided p via a PORTABLE erfc (A&S 7.1.26 polynomial "
    "× the q352 portable-exp primitive — engines' own erf builtins "
    "are not bit-identical), then Holm step-down FWER and "
    "Benjamini-Hochberg step-up FDR adjustments as running max/min "
    "windows over the p-ordered tests",
)
def q367_multiple_testing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation urgent-share z-tests with Holm and BH corrections.
    Counts are exact BIGINTs; z, erfc and both adjustments run the
    IDENTICAL expression text on both engines (F.expr fragments +
    portable exp), so every double hash-matches. Holm's running max
    and BH's reverse running min are each one window over the m=25
    ranked tests.

    Scale: the test count m is segment-grain (25 nations) — the
    heavy work is one map-side-combinable aggregate over orders; the
    adjustment windows touch m rows, never the fact table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_i"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int"))
            .cast("long")
            .alias("k_i"),
        )
    )
    tot = base.agg(
        F.sum("n_i").cast("long").alias("nn"),
        F.sum("k_i").cast("long").alias("kk"),
        F.count("*").cast("long").alias("m"),
    )
    zt = base.crossJoin(F.broadcast(tot)).withColumn("z", F.expr(_Q367_Z))
    xt = zt.withColumn("xv", F.expr("abs(z) / 1.4142135623730951e0"))
    tt = xt.withColumn("tv", F.expr("1e0 / (1e0 + 3.275911e-1 * xv)")).withColumn(
        "xa", F.expr("-(xv * xv)")
    )
    pe = _pexp_stage(tt, "xa", "ex", "pe")
    pv = pe.select(
        "nation",
        "n_i",
        "k_i",
        "z",
        "m",
        F.expr(f"{_erfc_poly('tv')} * ex").alias("p_raw"),
    )
    ranked = pv.withColumn(
        "rk", F.row_number().over(Window.orderBy("p_raw", "nation")).cast("long")
    )
    wh = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    wb = Window.orderBy("rk").rowsBetween(0, Window.unboundedFollowing)
    adj = ranked.withColumn(
        "p_holm", F.least(F.max(F.expr(_Q367_HOLM)).over(wh), F.lit(1.0))
    ).withColumn("p_bh", F.least(F.min(F.expr(_Q367_BH)).over(wb), F.lit(1.0)))
    return adj.select(
        "nation",
        F.col("n_i").alias("n_orders"),
        F.col("k_i").alias("n_urgent"),
        "z",
        "p_raw",
        "p_holm",
        "p_bh",
        (F.col("p_holm") <= F.lit(5e-2)).alias("reject_holm"),
        (F.col("p_bh") <= F.lit(1e-1)).alias("reject_bh"),
    )


# Simplified Soundex (H/W treated as vowels): map letters to digit
# classes, collapse same-digit runs, drop the first run (the lead
# letter's own class), strip vowel zeros, take 3 digits zero-padded.
_SOUNDEX_MAP = "01230120022455012623010202"


def _collapse_runs(col: str) -> str:
    s = col
    for d in "123456":
        s = f"regexp_replace({s}, '{d}{d}+', '{d}')"
    return s


_Q368_CODE = (
    "substr(w, 1, 1) || "
    "rpad(substr(replace(substr(cw, 2), '0', ''), 1, 3), 3, '0')"
)


@register(
    "q368_phonetic_blocking",
    oracle=f"""
    WITH words AS (
        SELECT upper(split_part(p_name, ' ', 1)) AS w FROM part
    ), mapped AS (
        SELECT w, translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            '{_SOUNDEX_MAP}') AS mw
        FROM words
    ), collapsed AS (
        SELECT w, {_collapse_runs("mw")} AS cw FROM mapped
    ), coded AS (
        SELECT w, {_Q368_CODE} AS code FROM collapsed
    )
    SELECT code, CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
           CAST(CAST(COUNT(*) AS BIGINT) * (CAST(COUNT(*) AS BIGINT) - 1)
                / 2 AS BIGINT) AS pairs_in_block
    FROM coded GROUP BY 1
    """,
    survey_ref="extension: phonetic blocking for fuzzy record "
    "linkage — simplified Soundex (translate→digit classes, "
    "regexp run-collapse, vowel strip; H/W as vowels) computed by "
    "IDENTICAL string expressions in both engines; per-block part "
    "and distinct-word counts plus the within-block candidate-pair "
    "mass quantify the blocking win vs all-pairs matching",
)
def q368_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex-style blocking keys over the first token of p_name.
    The key is a pure per-row string expression (translate + 6
    literal-pattern regexp_replace — no backreferences, so Java and
    RE2 regex engines agree), then one groupBy for block stats.
    pairs_in_block sums to the candidate mass a pairwise matcher
    would score — the blocking-efficiency metric.

    Scale: per-row expressions + one hash aggregate; candidate
    generation from these blocks is an equi-join on code, the same
    discipline as the q54 LSH band buckets (never all-pairs)."""
    part = load_table(spark, sf_dir, "part")
    words = part.select(F.expr("upper(split_part(p_name, ' ', 1))").alias("w"))
    mapped = words.withColumn(
        "mw",
        F.expr(f"translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SOUNDEX_MAP}')"),
    )
    collapsed = mapped.withColumn("cw", F.expr(_collapse_runs("mw")))
    coded = collapsed.withColumn("code", F.expr(_Q368_CODE))
    cnt = F.count("*").cast("long")
    return coded.groupBy("code").agg(
        cnt.alias("n_parts"),
        F.countDistinct("w").cast("long").alias("n_words"),
        (cnt * (cnt - F.lit(1)) / F.lit(2)).cast("long").alias("pairs_in_block"),
    )


# Non-linear side derivation (r05 advisory fix, strengthened): any
# affine hash of (rid, r) mod 2^32 — including its high bit — makes
# round r's labeling a constant rotation of round r−1's (the shift
# r·40503 is the same for every row), so at small n most rounds
# relabel NOTHING and the permutation null collapses.  Squaring the
# 31-bit affine hash breaks the affinity: the middle bit (bit 45 of
# the ≤62-bit square, exact in int64) flips per-row between rounds.
# Portable: only *, +, %, >= — identical text on both engines.
_Q369_H1 = "((rid * 2654435761 + r * 40503) % 2147483648)"
_Q369_SIDE = (
    f"(CASE WHEN (({_Q369_H1} * {_Q369_H1}) % 70368744177664)"
    " >= 35184372088832 THEN 1 ELSE 0 END)"
)
_Q369_DIFF = (
    "abs(CAST({sa} AS DOUBLE) / CAST({na} AS DOUBLE)"
    " - CAST({sb} AS DOUBLE) / CAST({nb} AS DOUBLE))"
)


@register(
    "q369_permutation_test",
    oracle=f"""
    WITH base AS (
        SELECT CAST(l_orderkey AS BIGINT) * 8 + CAST(l_linenumber AS BIGINT)
                   AS rid,
               CAST(l_quantity AS BIGINT) AS q,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), obs AS (
        SELECT CAST(SUM(CASE WHEN g = 1 THEN q ELSE 0 END) AS BIGINT) AS osa,
               CAST(SUM(g) AS BIGINT) AS ona,
               CAST(SUM(CASE WHEN g = 0 THEN q ELSE 0 END) AS BIGINT) AS osb,
               CAST(SUM(1 - g) AS BIGINT) AS onb
        FROM base
    ), perms AS (
        SELECT r,
               CAST(SUM(CASE WHEN {_Q369_SIDE} = 1 THEN q ELSE 0 END)
                    AS BIGINT) AS sa,
               CAST(SUM(CASE WHEN {_Q369_SIDE} = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN {_Q369_SIDE} = 0 THEN q ELSE 0 END)
                    AS BIGINT) AS sb,
               CAST(SUM(CASE WHEN {_Q369_SIDE} = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM base CROSS JOIN (SELECT UNNEST(range(1, 200)) AS r) rr
        GROUP BY 1
    )
    SELECT CAST(p.r AS BIGINT) AS round_id, p.na AS n_a, p.nb AS n_b,
           {_Q369_DIFF.format(sa="p.sa", na="p.na", sb="p.sb", nb="p.nb")}
               AS perm_diff,
           {_Q369_DIFF.format(sa="o.osa", na="o.ona", sb="o.osb", nb="o.onb")}
               AS obs_diff,
           {_Q369_DIFF.format(sa="p.sa", na="p.na", sb="p.sb", nb="p.nb")}
               >= {_Q369_DIFF.format(sa="o.osa", na="o.ona", sb="o.osb",
                                     nb="o.onb")} AS exceeds
    FROM perms p CROSS JOIN obs o
    """,
    survey_ref="extension: randomization inference — 199 deterministic "
    "Bernoulli relabelings of the R-vs-N quantity comparison via a "
    "squared-hash middle bit (affine hashes — low OR high bit — "
    "degenerate: the round salt shifts every row identically, so "
    "labelings collapse; r05 advisory fix, strengthened to a "
    "non-linear mixer); per-round group sums are exact BIGINTs, the "
    "mean-gap doubles are single divisions of exact integers, and "
    "the exceedance flags give the permutation p-value "
    "(1+#exceed)/(1+R) without any distributional assumption (the "
    "honest companion to q141's normal-theory test)",
)
def q369_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-randomization test for the R-vs-N mean-quantity gap.
    Each round r relabels every lineitem by bit 45 of the SQUARE of
    h1 = (rid·2654435761 + r·40503) mod 2³¹ — a pure function of
    the row id and round, never of partitioning — and the observed
    gap is compared against the 199-round reference distribution.
    The non-linearity is essential: any affine hash of (rid, r) is
    degenerate — its low bit reduces to (rid+r) mod 2 (two
    labelings total, the r05 advisory finding) and even its high
    bit only rotates a fixed threshold by the constant r·40503, so
    at small n most rounds relabel nothing.  Squaring makes the
    per-round flip row-dependent; the regression test asserts ≥150
    distinct perm_diff values across the 199 rounds.

    Scale: the explode is rounds×rows but aggregates map-side to
    199×2 partials per partition before the single 199-group
    shuffle; group sizes under Bernoulli relabeling concentrate at
    n/2 so no round is skewed. The classic fixed-size permutation
    is approximated (documented) — exact label-count preservation
    would need a global sort."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    base = li.select(
        (
            F.col("l_orderkey").cast("long") * 8
            + F.col("l_linenumber").cast("long")
        ).alias("rid"),
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_returnflag") == "R").cast("int").alias("g"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("g") == 1, F.col("q")).otherwise(0))
        .cast("long")
        .alias("osa"),
        F.sum("g").cast("long").alias("ona"),
        F.sum(F.when(F.col("g") == 0, F.col("q")).otherwise(0))
        .cast("long")
        .alias("osb"),
        F.sum(1 - F.col("g")).cast("long").alias("onb"),
    )
    side = F.expr(_Q369_SIDE)
    perms = (
        base.select("*", F.explode(F.sequence(F.lit(1), F.lit(199))).alias("r"))
        .groupBy("r")
        .agg(
            F.sum(F.when(side == 1, F.col("q")).otherwise(0))
            .cast("long")
            .alias("sa"),
            F.sum(F.when(side == 1, F.lit(1)).otherwise(0))
            .cast("long")
            .alias("na"),
            F.sum(F.when(side == 0, F.col("q")).otherwise(0))
            .cast("long")
            .alias("sb"),
            F.sum(F.when(side == 0, F.lit(1)).otherwise(0))
            .cast("long")
            .alias("nb"),
        )
    )
    pd_ = F.expr(_Q369_DIFF.format(sa="sa", na="na", sb="sb", nb="nb"))
    od = F.expr(_Q369_DIFF.format(sa="osa", na="ona", sb="osb", nb="onb"))
    return perms.crossJoin(F.broadcast(obs)).select(
        F.col("r").cast("long").alias("round_id"),
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        pd_.alias("perm_diff"),
        od.alias("obs_diff"),
        (pd_ >= od).alias("exceeds"),
    )


def _q370_exprs(stt: str, st: str, sll_: str, sl_: str, smm_: str,
                sm_: str, slm_: str, stl: str, stm: str):
    """Direction-parametrized Granger fragments from exact BIGINT
    moment sums: c_uv = n·s_uv − s_u·s_v (n²-scaled covariances,
    exact int64 at day grain), then restricted-vs-full RSS algebra in
    doubles — the scale factor cancels in F and partial R²."""
    def c(suv: str, su: str, sv: str) -> str:
        return f"CAST(n * {suv} - {su} * {sv} AS DOUBLE)"

    ctt = c(stt, st, st)
    cll = c(sll_, sl_, sl_)
    cmm = c(smm_, sm_, sm_)
    clm = c(slm_, sl_, sm_)
    ctl = c(stl, st, sl_)
    ctm = c(stm, st, sm_)
    det = f"({cll} * {cmm} - {clm} * {clm})"
    expl = (
        f"(({cmm} * {ctl} * {ctl} - 2e0 * {clm} * {ctl} * {ctm}"
        f" + {cll} * {ctm} * {ctm}) / {det})"
    )
    rssf = f"({ctt} - {expl})"
    rssr = f"({ctt} - {ctl} * {ctl} / {cll})"
    beta = f"(({cll} * {ctm} - {clm} * {ctl}) / {det})"
    f_stat = f"(({rssr} - {rssf}) * CAST(n - 3 AS DOUBLE) / {rssf})"
    pr2 = f"(({rssr} - {rssf}) / {rssr})"
    return beta, f_stat, pr2


_Q370_A = _q370_exprs("saa", "sa", "sll", "sl", "smm", "sm", "slm", "sal", "sam")
_Q370_B = _q370_exprs("sbb", "sb", "smm", "sm", "sll", "sl", "slm", "sbm", "sbl")


@register(
    "q370_granger_causality",
    oracle=f"""
    WITH da AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS a
        FROM lineitem GROUP BY 1
    ), db AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS b
        FROM orders GROUP BY 1
    ), j AS (
        SELECT da.d, da.a, db.b FROM da JOIN db ON da.d = db.d
    ), lagged AS (
        SELECT d, a, b,
               LAG(a) OVER (ORDER BY d) AS al,
               LAG(b) OVER (ORDER BY d) AS bl
        FROM j
    ), r AS (
        SELECT a, b, al, bl FROM lagged
        WHERE al IS NOT NULL AND bl IS NOT NULL
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(al) AS BIGINT) AS sl, CAST(SUM(bl) AS BIGINT) AS sm,
               CAST(SUM(a * a) AS BIGINT) AS saa,
               CAST(SUM(b * b) AS BIGINT) AS sbb,
               CAST(SUM(al * al) AS BIGINT) AS sll,
               CAST(SUM(bl * bl) AS BIGINT) AS smm,
               CAST(SUM(al * bl) AS BIGINT) AS slm,
               CAST(SUM(a * al) AS BIGINT) AS sal,
               CAST(SUM(a * bl) AS BIGINT) AS sam,
               CAST(SUM(b * al) AS BIGINT) AS sbl,
               CAST(SUM(b * bl) AS BIGINT) AS sbm
        FROM r
    )
    SELECT 'orders->shipments' AS direction, n AS n_obs,
           {_Q370_A[0]} AS beta_cross, {_Q370_A[1]} AS f_stat,
           {_Q370_A[2]} AS partial_r2
    FROM m
    UNION ALL
    SELECT 'shipments->orders', n, {_Q370_B[0]}, {_Q370_B[1]}, {_Q370_B[2]}
    FROM m
    """,
    survey_ref="extension: lag-1 Granger causality between the daily "
    "order-placement and shipment series — restricted (own lag) vs "
    "full (own + cross lag) OLS, F = ΔRSS·(n−3)/RSS_full, both "
    "models solved CLOSED-FORM from one exact-BIGINT moment "
    "aggregate (2×2 normal equations by Cramer's rule); both "
    "directions from the same 14 sums",
)
def q370_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does yesterday's order count predict today's shipments beyond
    shipments' own lag (and vice versa)? All 14 moment sums are exact
    BIGINTs from ONE aggregate over the inner-joined day series; the
    n²-scaled covariances c_uv = n·s_uv − s_u·s_v stay exact int64 at
    day grain (~3.6e13 at sf0.1), and the F/β/R² algebra runs the
    identical double fragments on both engines.

    Scale: two day-grain aggregates + one day equi-join; everything
    after is single-row algebra — the q366 VIF discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    da = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("long").alias("a")
    )
    db = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("long").alias("b")
    )
    j = da.join(db, "d")
    wd = Window.orderBy("d")
    lagged = j.select(
        "d",
        "a",
        "b",
        F.lag("a").over(wd).alias("al"),
        F.lag("b").over(wd).alias("bl"),
    )
    rws = lagged.filter(F.col("al").isNotNull() & F.col("bl").isNotNull())
    m = rws.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("sa"),
        F.sum("b").cast("long").alias("sb"),
        F.sum("al").cast("long").alias("sl"),
        F.sum("bl").cast("long").alias("sm"),
        F.sum(F.col("a") * F.col("a")).cast("long").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("long").alias("sbb"),
        F.sum(F.col("al") * F.col("al")).cast("long").alias("sll"),
        F.sum(F.col("bl") * F.col("bl")).cast("long").alias("smm"),
        F.sum(F.col("al") * F.col("bl")).cast("long").alias("slm"),
        F.sum(F.col("a") * F.col("al")).cast("long").alias("sal"),
        F.sum(F.col("a") * F.col("bl")).cast("long").alias("sam"),
        F.sum(F.col("b") * F.col("al")).cast("long").alias("sbl"),
        F.sum(F.col("b") * F.col("bl")).cast("long").alias("sbm"),
    )
    rows = F.array(
        F.struct(
            F.lit("orders->shipments").alias("direction"),
            F.col("n").alias("n_obs"),
            F.expr(_Q370_A[0]).alias("beta_cross"),
            F.expr(_Q370_A[1]).alias("f_stat"),
            F.expr(_Q370_A[2]).alias("partial_r2"),
        ),
        F.struct(
            F.lit("shipments->orders").alias("direction"),
            F.col("n").alias("n_obs"),
            F.expr(_Q370_B[0]).alias("beta_cross"),
            F.expr(_Q370_B[1]).alias("f_stat"),
            F.expr(_Q370_B[2]).alias("partial_r2"),
        ),
    )
    return m.select(F.explode(rows).alias("x")).select(
        "x.direction", "x.n_obs", "x.beta_cross", "x.f_stat", "x.partial_r2"
    )


# ---------------------------------------------------------------------------
# Batch 40 (round 5): OLS residual diagnostics — heteroscedasticity
# (Breusch-Pagan), serial correlation (Durbin-Watson), influence
# (Cook's distance) — plus instrumental-variable 2SLS. All closed-form
# from exact BIGINT moment aggregates; the only double sums (q371's
# Σe², Σe²x, Σ(e²)²) are day-ordered pinned folds over the tiny daily
# frame, never over raw rows.
# ---------------------------------------------------------------------------

# The shared daily-trend regression base (q317's frame): x = day offset
# from 1992-01-01, y = daily order count, both exact BIGINT.
_REG_DAILY = """
        SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS x,
               CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY o_orderdate
"""
# n²-scaled centered moments from the exact sums — BIGINT-exact
# (n·sxx ≈ 1.1e13 at sf0.1's 2 406 days), cast once to DOUBLE.
_REG_STAGE = (
    ("cc", "CAST(n * sxx - sx * sx AS DOUBLE)"),
    ("bn", "CAST(n * sxy - sx * sy AS DOUBLE)"),
    ("an", "CAST(n * syy - sy * sy AS DOUBLE)"),
    ("nn", "CAST(n AS DOUBLE)"),
    ("slope", "bn / cc"),
    ("icept", "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / nn"),
    ("ssr", "(an - bn * bn / cc) / nn"),
)


def _reg_moments_oracle() -> str:
    """CTE text producing the staged OLS columns from the daily frame."""
    stage = ", ".join(f"{expr} AS {name}" for name, expr in _REG_STAGE)
    return f"""daily AS ({_REG_DAILY}
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM daily
    ), st AS (
        SELECT *, {stage} FROM (SELECT * FROM m) m0
    )"""


def _reg_daily_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("y")
    ).select(
        F.datediff(F.col("day"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("day").cast("date").alias("day"),
        "y",
    )


def _reg_stats_spark(daily: DataFrame) -> DataFrame:
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    for name, expr in _REG_STAGE:
        m = m.withColumn(name, F.expr(expr))
    return m


_Q371_E = "CAST(y AS DOUBLE) - icept - slope * CAST(x AS DOUBLE)"
_Q371_R2 = "(sux_c * sux_c) / (suu_c * cc)"


@register(
    "q371_breusch_pagan",
    oracle=f"""
    WITH {_reg_moments_oracle()},
    resid AS (
        SELECT d.x, ({_Q371_E}) * ({_Q371_E}) AS uu, s.n, s.sx, s.cc, s.nn,
               s.slope
        FROM daily d CROSS JOIN st s
    ), folds AS (
        SELECT any_value(n) AS n, any_value(sx) AS sx,
               any_value(cc) AS cc, any_value(nn) AS nn,
               any_value(slope) AS slope,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(uu ORDER BY x)), (a, v) -> a + v) AS su,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(uu * CAST(x AS DOUBLE) ORDER BY x)),
                   (a, v) -> a + v) AS sux,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(uu * uu ORDER BY x)), (a, v) -> a + v) AS su2
        FROM resid
    ), cstats AS (
        SELECT *, nn * su2 - su * su AS suu_c,
               nn * sux - su * CAST(sx AS DOUBLE) AS sux_c
        FROM folds
    ), lmr AS (
        SELECT *, nn * ({_Q371_R2}) AS lm_stat FROM cstats
    ), xt AS (
        SELECT *, sqrt(lm_stat / 2e0) AS xv FROM lmr
    ), tt AS (
        SELECT *, 1e0 / (1e0 + 3.275911e-1 * xv) AS tv, -(xv * xv) AS xa
        FROM xt
    ), {_pexp_ctes("tt", "xa", "ex", "qe")}
    SELECT n AS n_days, slope, {_Q371_R2} AS aux_r2, lm_stat,
           {_erfc_poly("tv")} * ex AS p_value,
           {_erfc_poly("tv")} * ex <= 5e-2 AS heteroscedastic
    FROM qe
    """,
    survey_ref="extension: Breusch-Pagan heteroscedasticity test on "
    "the daily order-volume trend — squared OLS residuals regressed "
    "back on the day index, LM = n·R² vs chi-square(1) whose p-value "
    "comes from the portable erfc (P(chi2_1 > t) = erfc(sqrt(t/2))); "
    "residual moments are day-ordered pinned folds over the ~2.4k-row "
    "daily frame, slope/intercept closed-form from exact BIGINT sums",
)
def q371_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the variance of daily order volume grow with time? OLS of
    y on x is closed-form from one exact-BIGINT moment aggregate; the
    squared residuals u = e² (doubles from staged slope/intercept) are
    then folded in day order — Σu, Σu·x, Σu² — and the auxiliary R²,
    LM statistic and erfc-based p-value are identical double fragments
    on both engines.

    Scale: the heavy aggregate (orders → daily counts) is map-side
    combinable; the folds run over DISTINCT DAYS (~2.4k rows collected
    to one array — day grain keeps this bounded for decades of data),
    never over the fact table."""
    daily = _reg_daily_spark(spark, sf_dir)
    st = _reg_stats_spark(daily)
    resid = daily.crossJoin(F.broadcast(st)).select(
        "x",
        (F.expr(_Q371_E) * F.expr(_Q371_E)).alias("uu"),
        "n",
        "sx",
        "cc",
        "nn",
        "slope",
    )
    xd = lambda s: s["x"].cast("double")  # noqa: E731
    folds = resid.groupBy().agg(
        F.any_value("n").alias("n"),
        F.any_value("sx").alias("sx"),
        F.any_value("cc").alias("cc"),
        F.any_value("nn").alias("nn"),
        F.any_value("slope").alias("slope"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("x", "uu"))),
            F.lit(0.0),
            lambda a, s: a + s["uu"],
        ).alias("su"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("x", "uu"))),
            F.lit(0.0),
            lambda a, s: a + s["uu"] * s["x"].cast("double"),
        ).alias("sux"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("x", "uu"))),
            F.lit(0.0),
            lambda a, s: a + s["uu"] * s["uu"],
        ).alias("su2"),
    )
    cstats = folds.withColumn(
        "suu_c", F.expr("nn * su2 - su * su")
    ).withColumn("sux_c", F.expr("nn * sux - su * CAST(sx AS DOUBLE)"))
    lmr = cstats.withColumn("lm_stat", F.expr(f"nn * ({_Q371_R2})"))
    xt = lmr.withColumn("xv", F.expr("sqrt(lm_stat / 2e0)"))
    tt = xt.withColumn(
        "tv", F.expr("1e0 / (1e0 + 3.275911e-1 * xv)")
    ).withColumn("xa", F.expr("-(xv * xv)"))
    qe = _pexp_stage(tt, "xa", "ex", "qe")
    pv = F.expr(f"{_erfc_poly('tv')} * ex")
    return qe.select(
        F.col("n").alias("n_days"),
        "slope",
        F.expr(_Q371_R2).alias("aux_r2"),
        "lm_stat",
        pv.alias("p_value"),
        (pv <= F.lit(5e-2)).alias("heteroscedastic"),
    )


_Q372_NUM = (
    "CAST(sdd AS DOUBLE) - 2e0 * slope * CAST(sdxy AS DOUBLE)"
    " + slope * slope * CAST(sdx2 AS DOUBLE)"
)


@register(
    "q372_durbin_watson",
    oracle=f"""
    WITH {_reg_moments_oracle()},
    lagd AS (
        SELECT x, y, x - LAG(x) OVER (ORDER BY x) AS dx,
               y - LAG(y) OVER (ORDER BY x) AS dy
        FROM daily
    ), dsums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_diffs,
               CAST(SUM(dy * dy) AS BIGINT) AS sdd,
               CAST(SUM(dx * dx) AS BIGINT) AS sdx2,
               CAST(SUM(dx * dy) AS BIGINT) AS sdxy
        FROM lagd WHERE dx IS NOT NULL
    )
    SELECT s.n AS n_days, d.n_diffs, s.slope,
           ({_Q372_NUM}) / (s.ssr) AS dw,
           1e0 - (({_Q372_NUM}) / (s.ssr)) / 2e0 AS rho_hat,
           ({_Q372_NUM}) / (s.ssr) < 15e-1 AS positive_autocorr
    FROM dsums d CROSS JOIN st s
    """,
    survey_ref="extension: Durbin-Watson serial-correlation test on "
    "the q317/q371 daily-trend residuals — the intercept cancels in "
    "e_t − e_{{t-1}} = Δy − b·Δx, so the numerator Σ(Δy − bΔx)² "
    "expands into three exact BIGINT lag-difference moments and the "
    "whole statistic is closed-form: NO per-row residual "
    "materialization, no folds (unlike Breusch-Pagan, which needs "
    "residual LEVELS)",
)
def q372_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DW = Σ(e_t−e_{t−1})²/Σe_t² over the day-ordered residuals of
    the daily order-volume OLS. The first-difference identity kills
    the intercept, so the numerator needs only Σ(Δy)², Σ(Δx)², ΣΔxΔy —
    exact BIGINTs — and b from the base moments; the denominator is
    the closed-form SSR. rho_hat = 1 − DW/2 estimates the AR(1)
    coefficient of the residuals (companion to q364's raw-series ACF).
    Differences are taken between CONSECUTIVE OBSERVED days (calendar
    gaps documented — Δx carries the gap length into the b·Δx term).

    Scale: one map-side-combinable aggregate to day grain, one lag
    window over distinct days, two single-row cross joins."""
    daily = _reg_daily_spark(spark, sf_dir)
    st = _reg_stats_spark(daily)
    wd = Window.orderBy("x")
    lagd = daily.select(
        "x",
        "y",
        (F.col("x") - F.lag("x").over(wd)).alias("dx"),
        (F.col("y") - F.lag("y").over(wd)).alias("dy"),
    )
    dsums = lagd.filter(F.col("dx").isNotNull()).agg(
        F.count("*").cast("long").alias("n_diffs"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("sdd"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sdx2"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sdxy"),
    )
    dw = F.expr(f"({_Q372_NUM}) / (ssr)")
    return dsums.crossJoin(F.broadcast(st)).select(
        F.col("n").alias("n_days"),
        "n_diffs",
        "slope",
        dw.alias("dw"),
        (F.lit(1e0) - dw / F.lit(2e0)).alias("rho_hat"),
        (dw < F.lit(15e-1)).alias("positive_autocorr"),
    )


_Q374_H = "1e0 / nn + nn * (CAST(x AS DOUBLE) - mx) * (CAST(x AS DOUBLE) - mx) / cc"
_Q374_D = "(ee * ee) * hh / (2e0 * s2 * (1e0 - hh) * (1e0 - hh))"


@register(
    "q374_cooks_distance",
    oracle=f"""
    WITH {_reg_moments_oracle()},
    st2 AS (
        SELECT *, CAST(sx AS DOUBLE) / nn AS mx,
               ssr / (nn - 2e0) AS s2
        FROM st
    ), scored AS (
        SELECT d.day, d.x, d.y, {_Q371_E} AS ee, {_Q374_H} AS hh,
               s.s2
        FROM daily d CROSS JOIN st2 s
    ), dcol AS (
        SELECT day, x, y, ee, hh, {_Q374_D} AS cooks_d FROM scored
    ), ranked AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cooks_d DESC, day)
                       AS BIGINT) AS rk
        FROM dcol
    )
    SELECT rk, day, x AS day_offset, y AS n_orders, ee AS residual,
           hh AS leverage, cooks_d
    FROM ranked WHERE rk <= 10
    """,
    survey_ref="extension: Cook's-distance influence diagnostics for "
    "the daily-trend OLS — leverage h_i = 1/n + n(x_i−x̄)²/Sxx and "
    "D_i = e_i²h_i/(p·s²(1−h_i)²) are pure per-row double fragments "
    "from the broadcast closed-form fit; top-10 most influential days "
    "via rank (WindowGroupLimit, not a global sort of raw rows) — "
    "completes the q371/q372 residual-diagnostics trio with the "
    "which-rows-drive-the-fit view",
)
def q374_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which days most influence the fitted order-volume trend? The
    hat diagonal and Cook's D are closed-form per-row doubles from the
    single broadcast moment row (p = 2 parameters); ranking by D picks
    the days whose removal would move the fit most — the influence
    complement of q94/q128's pure-outlyingness views.

    Scale: per-row expressions over the day-grain frame + one rank;
    the rank's input is distinct days, never the fact table."""
    daily = _reg_daily_spark(spark, sf_dir)
    st2 = (
        _reg_stats_spark(daily)
        .withColumn("mx", F.expr("CAST(sx AS DOUBLE) / nn"))
        .withColumn("s2", F.expr("ssr / (nn - 2e0)"))
    )
    scored = daily.crossJoin(F.broadcast(st2)).select(
        "day",
        "x",
        "y",
        F.expr(_Q371_E).alias("ee"),
        F.expr(_Q374_H).alias("hh"),
        "s2",
    )
    dcol = scored.withColumn("cooks_d", F.expr(_Q374_D))
    ranked = dcol.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.col("cooks_d").desc(), "day"))
        .cast("long"),
    )
    return ranked.filter(F.col("rk") <= 10).select(
        "rk",
        "day",
        F.col("x").alias("day_offset"),
        F.col("y").alias("n_orders"),
        F.col("ee").alias("residual"),
        F.col("hh").alias("leverage"),
        "cooks_d",
    )


# n-scaled covariances formed in DOUBLES (n·Σzy ≈ 1e18 at sf0.1 —
# exact int64 today but 100× data overflows, so the guard is standing).
_Q373_STAGE = (
    ("nn", "CAST(n AS DOUBLE)"),
    ("czy", "nn * CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE)"),
    ("czx", "nn * CAST(szx AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sx AS DOUBLE)"),
    ("czz", "nn * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)"),
    ("cxy", "nn * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"),
    ("cxx", "nn * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"),
    ("r2_fs", "czx * czx / (czz * cxx)"),
)


@register(
    "q373_iv_2sls",
    oracle=f"""
    WITH perorder AS (
        SELECT o.o_orderkey,
               CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS z,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS y
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z * z) AS BIGINT) AS szz,
               CAST(SUM(z * x) AS BIGINT) AS szx,
               CAST(SUM(z * y) AS BIGINT) AS szy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM perorder
    ), st AS (
        SELECT *, {", ".join(f"{e} AS {c}" for c, e in _Q373_STAGE)}
        FROM (SELECT * FROM m) m0
    )
    SELECT n AS n_orders, cxy / cxx AS beta_ols, czy / czx AS beta_iv,
           czy / czx - cxy / cxx AS iv_ols_gap, r2_fs AS first_stage_r2,
           (nn - 2e0) * r2_fs / (1e0 - r2_fs) AS first_stage_f,
           (nn - 2e0) * r2_fs / (1e0 - r2_fs) > 1e1 AS instrument_strong
    FROM st
    """,
    survey_ref="extension: instrumental-variable two-stage least "
    "squares — revenue-cents-per-order on line-count, instrumented by "
    "the order-priority digit: beta_IV = cov(z,y)/cov(z,x) vs the "
    "plain OLS slope, plus the first-stage F (weak-instrument gate at "
    "the classic F>10) — the causal-inference companion to q288's "
    "DiD and q281's CUPED, entirely closed-form from ONE 9-sum exact "
    "moment aggregate",
)
def q373_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald/2SLS estimator with a single instrument: all nine moment
    sums are exact BIGINTs from one aggregate over the per-order frame
    (y = exact revenue cents); the n-scaled covariances and both betas
    are identical double fragments. A discrete 5-level instrument
    makes beta_IV the classic grouped-Wald slope.

    Scale: orders⋈lineitem is the co-partitioned fact join (orderkey
    both sides); the per-order GROUP BY is map-side combinable and
    everything downstream is one row."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    perorder = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            o["o_orderkey"],
            F.substring("o_orderpriority", 1, 1).cast("long").alias("z"),
        )
        .agg(
            F.count("*").cast("long").alias("x"),
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("y"),
        )
    )
    m = perorder.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("z").cast("long").alias("sz"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
        F.sum(F.col("z") * F.col("x")).cast("long").alias("szx"),
        F.sum(F.col("z") * F.col("y")).cast("long").alias("szy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    for c, e in _Q373_STAGE:
        m = m.withColumn(c, F.expr(e))
    ff = F.expr("(nn - 2e0) * r2_fs / (1e0 - r2_fs)")
    return m.select(
        F.col("n").alias("n_orders"),
        F.expr("cxy / cxx").alias("beta_ols"),
        F.expr("czy / czx").alias("beta_iv"),
        F.expr("czy / czx - cxy / cxx").alias("iv_ols_gap"),
        F.col("r2_fs").alias("first_stage_r2"),
        ff.alias("first_stage_f"),
        (ff > F.lit(1e1)).alias("instrument_strong"),
    )


# ---------------------------------------------------------------------------
# Batch 41 (round 5): portable cos/sin primitive + spectral analysis
# (periodogram, harmonic regression), corpus temporal novelty, and a
# deterministic RANSAC line fit.
# ---------------------------------------------------------------------------

# Portable cos/sin for x = 2π·r/p (integer phase r in [0,p)): Taylor
# about 0 after folding x ∈ [0,2π) to u ∈ (−π,π]. Truncation ≤ π²⁶/26!
# ≈ 1.5e-14 for cos, π²⁵/25! ≈ 1.3e-13 for sin — and as with _pexp,
# the POLYNOMIAL is the spec: both engines run the identical Horner
# text over identical doubles, so results are bit-equal even where
# they differ from true cos/sin in the last few ulps.
_PCOS_COEFFS = [
    (-1.0) ** k / _math.factorial(2 * k) for k in range(13, -1, -1)
]
_PSIN_COEFFS = [
    (-1.0) ** k / _math.factorial(2 * k + 1) for k in range(12, -1, -1)
]
_TWO_PI = 6.283185307179586
_PI = 3.141592653589793


def _ptrig_ctes(src: str, r: str, p: str, cosout: str, sinout: str,
                tag: str) -> str:
    """CTE chain computing cos/sin(2π·r/p) from integer columns."""
    cpoly = f"CAST('{_PCOS_COEFFS[0]!r}' AS DOUBLE)"
    for c in _PCOS_COEFFS[1:]:
        cpoly = f"(CAST('{c!r}' AS DOUBLE) + {tag}_s * {cpoly})"
    spoly = f"CAST('{_PSIN_COEFFS[0]!r}' AS DOUBLE)"
    for c in _PSIN_COEFFS[1:]:
        spoly = f"(CAST('{c!r}' AS DOUBLE) + {tag}_s * {spoly})"
    return f"""{tag}_a AS (
        SELECT *, {_TWO_PI!r}e0 * (CAST({r} AS DOUBLE) / CAST({p} AS DOUBLE))
                      AS {tag}_x
        FROM {src}
    ), {tag}_b AS (
        SELECT *, CASE WHEN {tag}_x > {_PI!r}e0
                       THEN {tag}_x - {_TWO_PI!r}e0 ELSE {tag}_x END AS {tag}_u
        FROM {tag}_a
    ), {tag}_c AS (
        SELECT *, {tag}_u * {tag}_u AS {tag}_s FROM {tag}_b
    ), {tag} AS (
        SELECT *, {cpoly} AS {cosout}, {tag}_u * {spoly} AS {sinout}
        FROM {tag}_c
    )"""


def _ptrig_stage(df: DataFrame, r: str, p: str, cosout: str, sinout: str,
                 tag: str) -> DataFrame:
    """Spark twin of _ptrig_ctes — same operand sequence."""
    x, u, s = f"{tag}_x", f"{tag}_u", f"{tag}_s"
    df = df.withColumn(
        x, F.lit(_TWO_PI) * (F.col(r).cast("double") / F.col(p).cast("double"))
    )
    df = df.withColumn(
        u,
        F.when(F.col(x) > F.lit(_PI), F.col(x) - F.lit(_TWO_PI)).otherwise(
            F.col(x)
        ),
    )
    df = df.withColumn(s, F.col(u) * F.col(u))
    cpoly = F.lit(_PCOS_COEFFS[0])
    for c in _PCOS_COEFFS[1:]:
        cpoly = F.lit(c) + F.col(s) * cpoly
    spoly = F.lit(_PSIN_COEFFS[0])
    for c in _PSIN_COEFFS[1:]:
        spoly = F.lit(c) + F.col(s) * spoly
    df = df.withColumn(cosout, cpoly).withColumn(sinout, F.col(u) * spoly)
    return df.drop(x, u, s)


_Q375_POWER = (
    "(ca - ybar * nc) * (ca - ybar * nc)"
    " + (cb - ybar * ns) * (cb - ybar * ns)"
)


@register(
    "q375_periodogram",
    headline=True,  # new plan family: phase-sum spectral
    oracle=f"""
    WITH daily AS ({_REG_DAILY}
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
        FROM daily
    ), phase AS (
        SELECT p, x % p AS r, CAST(SUM(y) AS BIGINT) AS syr,
               CAST(COUNT(*) AS BIGINT) AS nr
        FROM daily CROSS JOIN (SELECT UNNEST(range(2, 31)) AS p) pp
        GROUP BY 1, 2
    ), {_ptrig_ctes("phase", "r", "p", "cr", "sr", "tg")},
    terms AS (
        SELECT p, r, cr * CAST(syr AS DOUBLE) AS tc,
               sr * CAST(syr AS DOUBLE) AS ts,
               cr * CAST(nr AS DOUBLE) AS ncr,
               sr * CAST(nr AS DOUBLE) AS nsr
        FROM tg
    ), folded AS (
        SELECT p,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(tc ORDER BY r)), (a, v) -> a + v) AS ca,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(ts ORDER BY r)), (a, v) -> a + v) AS cb,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(ncr ORDER BY r)), (a, v) -> a + v) AS nc,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(nsr ORDER BY r)), (a, v) -> a + v) AS ns
        FROM terms GROUP BY 1
    ), powered AS (
        SELECT p, {_Q375_POWER} AS power
        FROM folded CROSS JOIN (
            SELECT CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar FROM tot
        ) yb
    ), total AS (
        SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(power ORDER BY p)), (a, v) -> a + v) AS total_power
        FROM powered
    )
    SELECT CAST(p AS BIGINT) AS period, power,
           power / total_power AS power_share,
           CAST(ROW_NUMBER() OVER (ORDER BY power DESC, p) AS BIGINT) AS rk
    FROM powered CROSS JOIN total
    """,
    survey_ref="extension: Lomb-lite periodogram of the daily order "
    "series at integer candidate periods 2..30 — the DFT sums "
    "collapse to exact-BIGINT PHASE sums (cos(2πt/p) depends only on "
    "t mod p), so the only double folds run over ≤30 phase cells per "
    "period, never the day axis; cos/sin are the new portable-trig "
    "primitive (Taylor Horner, bit-identical across engines)",
)
def q375_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral power of daily order volume at periods 2..30 days.
    Key identity: Σ_t y_t·cos(2πt/p) = Σ_r cos(2πr/p)·(Σ_{t≡r mod p}
    y_t) — the inner sums are exact BIGINTs from one grouped
    aggregate, the outer sum is a pinned fold over the p phase cells.
    Mean removal uses the same trick on the phase day-counts. Power =
    (ΣΔy·cos)² + (ΣΔy·sin)² per period, plus each period's share and
    rank.

    Scale: the explode is days×29 at day grain (bounded); phase
    aggregation is map-side combinable; no fold ever exceeds 30
    elements."""
    daily = _reg_daily_spark(spark, sf_dir)
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    phase = (
        daily.select("x", "y", F.explode(F.sequence(F.lit(2), F.lit(30))).alias("p"))
        .groupBy("p", F.pmod(F.col("x"), F.col("p")).cast("long").alias("r"))
        .agg(
            F.sum("y").cast("long").alias("syr"),
            F.count("*").cast("long").alias("nr"),
        )
    )
    tg = _ptrig_stage(phase, "r", "p", "cr", "sr", "tg")
    terms = tg.select(
        "p",
        "r",
        (F.col("cr") * F.col("syr").cast("double")).alias("tc"),
        (F.col("sr") * F.col("syr").cast("double")).alias("ts"),
        (F.col("cr") * F.col("nr").cast("double")).alias("ncr"),
        (F.col("sr") * F.col("nr").cast("double")).alias("nsr"),
    )
    arr = F.array_sort(
        F.collect_list(F.struct("r", "tc", "ts", "ncr", "nsr"))
    )
    folded = terms.groupBy("p").agg(arr.alias("arr")).select(
        "p",
        F.aggregate(F.col("arr"), F.lit(0.0), lambda a, s: a + s["tc"]).alias("ca"),
        F.aggregate(F.col("arr"), F.lit(0.0), lambda a, s: a + s["ts"]).alias("cb"),
        F.aggregate(F.col("arr"), F.lit(0.0), lambda a, s: a + s["ncr"]).alias("nc"),
        F.aggregate(F.col("arr"), F.lit(0.0), lambda a, s: a + s["nsr"]).alias("ns"),
    )
    yb = tot.select(
        F.expr("CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)").alias("ybar")
    )
    powered = folded.crossJoin(F.broadcast(yb)).select(
        "p", F.expr(_Q375_POWER).alias("power")
    )
    total = powered.groupBy().agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("p", "power"))),
            F.lit(0.0),
            lambda a, s: a + s["power"],
        ).alias("total_power")
    )
    return powered.crossJoin(F.broadcast(total)).select(
        F.col("p").cast("long").alias("period"),
        "power",
        (F.col("power") / F.col("total_power")).alias("power_share"),
        F.row_number()
        .over(Window.orderBy(F.col("power").desc(), "p"))
        .cast("long")
        .alias("rk"),
    )


# 3×3 Cramer fragments for the harmonic normal equations
# [n sc ss; sc scc scs; ss scs sss]·[a b c]' = [sy syc sys]'.
_Q376_DET = (
    "nn * (scc * sss - scs * scs) - sc * (sc * sss - scs * ss)"
    " + ss * (sc * scs - scc * ss)"
)
_Q376_DA = (
    "syd * (scc * sss - scs * scs) - sc * (syc * sss - scs * sys)"
    " + ss * (syc * scs - scc * sys)"
)
_Q376_DB = (
    "nn * (syc * sss - scs * sys) - syd * (sc * sss - scs * ss)"
    " + ss * (sc * sys - syc * ss)"
)
_Q376_DC = (
    "nn * (scc * sys - syc * scs) - sc * (sc * sys - syc * ss)"
    " + syd * (sc * scs - scc * ss)"
)


@register(
    "q376_harmonic_regression",
    oracle=f"""
    WITH daily AS ({_REG_DAILY}
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM daily
    ), phase AS (
        SELECT CAST(7 AS BIGINT) AS p, x % 7 AS r,
               CAST(SUM(y) AS BIGINT) AS syr, CAST(COUNT(*) AS BIGINT) AS nr
        FROM daily GROUP BY 2
    ), {_ptrig_ctes("phase", "r", "p", "cr", "sr", "tg")},
    terms AS (
        SELECT r, cr * CAST(nr AS DOUBLE) AS t_c, sr * CAST(nr AS DOUBLE) AS t_s,
               cr * cr * CAST(nr AS DOUBLE) AS t_cc,
               sr * sr * CAST(nr AS DOUBLE) AS t_ss,
               cr * sr * CAST(nr AS DOUBLE) AS t_cs,
               cr * CAST(syr AS DOUBLE) AS t_yc,
               sr * CAST(syr AS DOUBLE) AS t_ys
        FROM tg
    ), folded AS (
        SELECT
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_c ORDER BY r)), (a, v) -> a + v) AS sc,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_s ORDER BY r)), (a, v) -> a + v) AS ss,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_cc ORDER BY r)), (a, v) -> a + v) AS scc,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_ss ORDER BY r)), (a, v) -> a + v) AS sss,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_cs ORDER BY r)), (a, v) -> a + v) AS scs,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_yc ORDER BY r)), (a, v) -> a + v) AS syc,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list(t_ys ORDER BY r)), (a, v) -> a + v) AS sys
        FROM terms
    ), st AS (
        SELECT *, CAST(n AS DOUBLE) AS nn, CAST(sy AS DOUBLE) AS syd,
               CAST(syy AS DOUBLE) AS syyd
        FROM folded CROSS JOIN tot
    ), solved AS (
        SELECT *, ({_Q376_DA}) / ({_Q376_DET}) AS ca,
               ({_Q376_DB}) / ({_Q376_DET}) AS cb,
               ({_Q376_DC}) / ({_Q376_DET}) AS cg
        FROM st
    ), sse AS (
        SELECT *, syyd - (ca * syd + cb * syc + cg * sys) AS sse_full,
               syyd - syd * syd / nn AS sse_mean
        FROM solved
    )
    SELECT n AS n_days, ca AS intercept, cb AS cos_coef, cg AS sin_coef,
           sqrt(cb * cb + cg * cg) AS amplitude,
           ((sse_mean - sse_full) / 2e0) / (sse_full / (nn - 3e0)) AS f_stat,
           ((sse_mean - sse_full) / 2e0) / (sse_full / (nn - 3e0)) > 3e0
               AS seasonal
    FROM sse
    """,
    survey_ref="extension: weekly harmonic regression — y_t = a + "
    "b·cos(2πt/7) + c·sin(2πt/7) solved CLOSED-FORM by 3×3 Cramer "
    "over moments that collapse to 7 exact-BIGINT phase sums (q375's "
    "identity), F-tests the 2-df seasonality against the mean-only "
    "model; the portable-trig + pinned-fold discipline means zero "
    "engine transcendental calls and zero data-sized double sums",
)
def q376_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fits the weekly sinusoid to daily order counts. The design
    matrix columns cos/sin(2πt/7) take only 7 values, so ALL normal-
    equation moments are Σ over 7 phase cells of (day-count, y-sum)
    BIGINTs × trig doubles — folded in phase order, then a 3×3 Cramer
    solve and the classic F for the joint (cos,sin) restriction.

    Scale: one map-side-combinable aggregate to 7 cells; everything
    downstream is single-row algebra."""
    daily = _reg_daily_spark(spark, sf_dir)
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    phase = daily.groupBy(
        F.pmod(F.col("x"), F.lit(7)).cast("long").alias("r")
    ).agg(
        F.sum("y").cast("long").alias("syr"),
        F.count("*").cast("long").alias("nr"),
    ).withColumn("p", F.lit(7).cast("long"))
    tg = _ptrig_stage(phase, "r", "p", "cr", "sr", "tg")
    nrd = F.col("nr").cast("double")
    syrd = F.col("syr").cast("double")
    terms = tg.select(
        "r",
        (F.col("cr") * nrd).alias("t_c"),
        (F.col("sr") * nrd).alias("t_s"),
        (F.col("cr") * F.col("cr") * nrd).alias("t_cc"),
        (F.col("sr") * F.col("sr") * nrd).alias("t_ss"),
        (F.col("cr") * F.col("sr") * nrd).alias("t_cs"),
        (F.col("cr") * syrd).alias("t_yc"),
        (F.col("sr") * syrd).alias("t_ys"),
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct("r", "t_c", "t_s", "t_cc", "t_ss", "t_cs", "t_yc", "t_ys")
        )
    )
    fold = lambda f: F.aggregate(  # noqa: E731
        F.col("arr"), F.lit(0.0), lambda a, s: a + s[f]
    )
    folded = terms.groupBy().agg(arr.alias("arr")).select(
        fold("t_c").alias("sc"),
        fold("t_s").alias("ss"),
        fold("t_cc").alias("scc"),
        fold("t_ss").alias("sss"),
        fold("t_cs").alias("scs"),
        fold("t_yc").alias("syc"),
        fold("t_ys").alias("sys"),
    )
    st = (
        folded.crossJoin(F.broadcast(tot))
        .withColumn("nn", F.expr("CAST(n AS DOUBLE)"))
        .withColumn("syd", F.expr("CAST(sy AS DOUBLE)"))
        .withColumn("syyd", F.expr("CAST(syy AS DOUBLE)"))
    )
    solved = (
        st.withColumn("ca", F.expr(f"({_Q376_DA}) / ({_Q376_DET})"))
        .withColumn("cb", F.expr(f"({_Q376_DB}) / ({_Q376_DET})"))
        .withColumn("cg", F.expr(f"({_Q376_DC}) / ({_Q376_DET})"))
    )
    sse = solved.withColumn(
        "sse_full", F.expr("syyd - (ca * syd + cb * syc + cg * sys)")
    ).withColumn("sse_mean", F.expr("syyd - syd * syd / nn"))
    fexpr = F.expr("((sse_mean - sse_full) / 2e0) / (sse_full / (nn - 3e0))")
    return sse.select(
        F.col("n").alias("n_days"),
        F.col("ca").alias("intercept"),
        F.col("cb").alias("cos_coef"),
        F.col("cg").alias("sin_coef"),
        F.expr("sqrt(cb * cb + cg * cg)").alias("amplitude"),
        fexpr.alias("f_stat"),
        (fexpr > F.lit(3e0)).alias("seasonal"),
    )


@register(
    "q377_temporal_novelty",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_duck_tokens()} AS tk FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(tk) - 2),
                      i -> array_to_string(tk[i:i+2], ' '))) AS s
        FROM toks WHERE len(tk) >= 3
    ), first_seen AS (
        SELECT s, CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM sh GROUP BY 1
    ), perdoc AS (
        SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
               CAST(SUM(CASE WHEN f.first_doc = sh.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        FROM sh JOIN first_seen f ON sh.s = f.s
        GROUP BY 1
    ), deciled AS (
        SELECT *, CAST(NTILE(10) OVER (ORDER BY doc_id) AS BIGINT) AS decile
        FROM perdoc
    )
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE)
               AS novelty_rate
    FROM deciled GROUP BY 1
    """,
    survey_ref="extension: corpus saturation curve — per ingestion-"
    "order decile, the fraction of each document's distinct word-3-"
    "gram shingles FIRST seen in that document; the declining novelty "
    "rate is the collection-stopping signal that complements q279's "
    "Good-Turing unseen-mass estimate and q177's dedup-impact "
    "accounting",
)
def q377_temporal_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each new document is new text? Distinct (doc,
    shingle) postings → min doc_id per shingle (its first occurrence)
    → per-doc novel-shingle fraction → NTILE(10) deciles over doc_id
    (ingestion order). A young corpus scores near 1; saturation pulls
    later deciles down.

    Scale: the shingle groupBy/join is the standard postings shuffle
    (equi-join on shingle, the q25/q77 discipline — never all-pairs);
    the decile window runs at doc grain. Cites reference test
    coverage: stock-data pipeline has no corpus ops — this extends
    the LLM-pipeline surface mandated by the build brief."""
    from stock_data_pipeline_spark.llm.dedup import _doc_shingles

    doc = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(doc, "doc_id", "text", 3)
    first_seen = sh.groupBy("shingle").agg(
        F.min("doc_id").cast("long").alias("first_doc")
    )
    perdoc = (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sh"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    deciled = perdoc.withColumn(
        "decile", F.ntile(10).over(Window.orderBy("doc_id")).cast("long")
    )
    return deciled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_sh").cast("long").alias("n_shingles"),
        F.sum("n_novel").cast("long").alias("n_novel"),
        (
            F.sum("n_novel").cast("double") / F.sum("n_sh").cast("double")
        ).alias("novelty_rate"),
    )


_Q378_R1 = "1 + ((k * 2654435761 + 40503) % 4294967296) % n"
_Q378_R2 = "1 + ((k * 2654435761 + 81006) % 4294967296) % n"
# + 0e0 canonicalizes IEEE −0.0 (flat model sampled right-to-left) to
# +0.0: Spark normalizes negative zero in grouping keys (slope is one
# downstream), DuckDB does not — without this the engines disagree on
# the ZERO-slope winner's sign bit.
_Q378_SLOPE = "(CAST(y2 - y1 AS DOUBLE) / CAST(x2 - x1 AS DOUBLE) + 0e0)"


@register(
    "q378_ransac_line",
    oracle=f"""
    WITH daily AS ({_REG_DAILY}
    ), rn AS (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS rid
        FROM daily
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
        FROM daily
    ), cand AS (
        SELECT k, {_Q378_R1} AS r1, {_Q378_R2} AS r2, n,
               15e-2 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS tol
        FROM tot CROSS JOIN (SELECT UNNEST(range(0, 64)) AS k) kk
    ), models AS (
        SELECT c.k, c.n, c.tol, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
               {_Q378_SLOPE} AS slope,
               CAST(a.y AS DOUBLE) - ({_Q378_SLOPE}) * CAST(a.x AS DOUBLE)
                   AS icept
        FROM cand c
        JOIN rn a ON c.r1 = a.rid
        JOIN rn b ON c.r2 = b.rid
        WHERE c.r1 <> c.r2
    ), scored AS (
        SELECT m.k, m.n, m.slope, m.icept,
               CAST(SUM(CASE WHEN abs(CAST(d.y AS DOUBLE)
                        - (m.icept + m.slope * CAST(d.x AS DOUBLE))) <= m.tol
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
        FROM models m CROSS JOIN daily d
        GROUP BY 1, 2, 3, 4
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_inliers DESC, k) AS rk
        FROM scored
    )
    SELECT CAST(k AS BIGINT) AS cand_id, n AS n_days, slope, icept,
           n_inliers,
           CAST(n_inliers AS DOUBLE) / CAST(n AS DOUBLE) AS inlier_share
    FROM ranked WHERE rk = 1
    """,
    survey_ref="extension: deterministic RANSAC-lite robust line fit "
    "on the daily order trend — 64 candidate two-point models chosen "
    "by the portable multiplicative hash (no RNG), inlier band = 15% "
    "of the mean level, best consensus model wins (count tie → lowest "
    "candidate id); the outlier-immune complement to q256's Theil-Sen "
    "and q374's influence diagnostics",
)
def q378_ransac_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RANSAC with the randomness replaced by the portable
    hash: candidate k samples day-rows 1+h(k,1) mod n and 1+h(k,2)
    mod n (degenerate equal-row draws dropped), fits the exact
    two-point line, and counts days within the ±15%-of-mean band.
    The winner is the max-consensus model.

    Scale: candidate selection is two equi-joins on row-number over
    the day frame; scoring broadcasts ≤64 models against day-grain
    rows (map-side count, no extra shuffle of the fact table)."""
    daily = _reg_daily_spark(spark, sf_dir)
    rn = daily.withColumn(
        "rid", F.row_number().over(Window.orderBy("x")).cast("long")
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
    )
    cand = (
        tot.select(
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("k"), "n", "sy"
        )
        .withColumn("r1", F.expr(_Q378_R1))
        .withColumn("r2", F.expr(_Q378_R2))
        .withColumn(
            "tol", F.expr("15e-2 * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))")
        )
        .filter(F.col("r1") != F.col("r2"))
    )
    a = rn.select(
        F.col("rid").alias("r1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = rn.select(
        F.col("rid").alias("r2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    models = (
        cand.join(a, "r1")
        .join(b, "r2")
        .withColumn("slope", F.expr(_Q378_SLOPE))
        .withColumn(
            "icept",
            F.expr(f"CAST(y1 AS DOUBLE) - ({_Q378_SLOPE}) * CAST(x1 AS DOUBLE)"),
        )
        .select("k", "n", "tol", "slope", "icept")
    )
    scored = (
        daily.crossJoin(F.broadcast(models))
        .groupBy("k", "n", "slope", "icept")
        .agg(
            F.sum(
                (
                    F.expr(
                        "abs(CAST(y AS DOUBLE)"
                        " - (icept + slope * CAST(x AS DOUBLE))) <= tol"
                    )
                ).cast("int")
            )
            .cast("long")
            .alias("n_inliers")
        )
    )
    ranked = scored.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("n_inliers").desc(), "k"))
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("k").cast("long").alias("cand_id"),
        F.col("n").alias("n_days"),
        "slope",
        "icept",
        "n_inliers",
        F.expr("CAST(n_inliers AS DOUBLE) / CAST(n AS DOUBLE)").alias(
            "inlier_share"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 42 (round 5): Cox proportional hazards (unrolled Newton on
# risk-set aggregates), landmark harmonic closeness, classifier
# macro-F1, labeled retrieval eval (exact-rational MRR).
# ---------------------------------------------------------------------------

_Q379_CUTOFF = "DATE '2001-01-01'"


def _q379_terms(eb: str) -> tuple[str, str]:
    """Breslow partial-likelihood score/information terms for a single
    BINARY covariate: with x∈{0,1} the risk-set sums collapse to
    S0 = r0 + e^β·r1, S1 = S2 = e^β·r1 — so U and I per event time are
    pure closed-form doubles of the exact at-risk/event counts."""
    s0 = f"(CAST(r0 AS DOUBLE) + {eb} * CAST(r1 AS DOUBLE))"
    ut = (
        f"CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE)"
        f" * ({eb} * CAST(r1 AS DOUBLE)) / {s0}"
    )
    it = (
        f"CAST(d AS DOUBLE) * ({eb} * CAST(r1 AS DOUBLE)"
        f" * CAST(r0 AS DOUBLE)) / ({s0} * {s0})"
    )
    return ut, it


def _q379_oracle() -> str:
    rounds = []
    prev = "b0"
    for k in (1, 2, 3):
        ut, it = _q379_terms("eb")
        rounds.append(f"""{_pexp_ctes(prev, "beta", "eb", f"pe{k}")},
    t{k} AS (
        SELECT rf.t, {ut} AS ut, {it} AS it, p.n_customers, p.n_events,
               p.beta
        FROM rf CROSS JOIN pe{k} p
    ), f{k} AS (
        SELECT any_value(n_customers) AS n_customers,
               any_value(n_events) AS n_events, any_value(beta) AS beta,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(ut ORDER BY t)), (a, v) -> a + v) AS uu,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(it ORDER BY t)), (a, v) -> a + v) AS ii
        FROM t{k}
    ), b{k} AS (
        SELECT n_customers, n_events, beta + uu / ii AS beta FROM f{k}
    )""")
        prev = f"b{k}"
    ut4, it4 = _q379_terms("hr")
    return f"""
    WITH percust AS (
        SELECT o.o_custkey,
               CAST(date_diff('day', MIN(o.o_orderdate), MAX(o.o_orderdate))
                    AS BIGINT) AS dur,
               CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS x,
               CASE WHEN MAX(o.o_orderdate) <= {_Q379_CUTOFF}
                    THEN 1 ELSE 0 END AS ev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_mktsegment
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(ev) AS BIGINT) AS n_events
        FROM percust
    ), hist AS (
        SELECT dur, CAST(SUM(1 - x) AS BIGINT) AS r0inc,
               CAST(SUM(x) AS BIGINT) AS r1inc,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(ev * x) AS BIGINT) AS d1
        FROM percust GROUP BY 1
    ), risk AS (
        SELECT dur AS t, d, d1,
               CAST(SUM(r0inc) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS BIGINT) AS r0,
               CAST(SUM(r1inc) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING) AS BIGINT) AS r1
        FROM hist
    ), rf AS (
        SELECT * FROM risk WHERE d > 0
    ), b0 AS (
        SELECT n_customers, n_events, 0e0 AS beta FROM tot
    ), {", ".join(rounds)},
    {_pexp_ctes("b3", "beta", "hr", "pe4")},
    t4 AS (
        SELECT rf.t, {ut4} AS ut, {it4} AS it, p.n_customers, p.n_events,
               p.beta, p.hr
        FROM rf CROSS JOIN pe4 p
    ), f4 AS (
        SELECT any_value(n_customers) AS n_customers,
               any_value(n_events) AS n_events, any_value(beta) AS beta,
               any_value(hr) AS hr, CAST(COUNT(*) AS BIGINT) AS n_event_times,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(ut ORDER BY t)), (a, v) -> a + v) AS uu,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(it ORDER BY t)), (a, v) -> a + v) AS ii
        FROM t4
    )
    SELECT n_customers, n_events, n_event_times, beta,
           hr AS hazard_ratio, uu AS score_final, ii AS info_final
    FROM f4
    """


@register(
    "q379_cox_ph",
    headline=True,  # new plan family: risk-set Newton
    oracle=_q379_oracle(),
    survey_ref="extension: Cox proportional-hazards fit for a binary "
    "covariate (AUTOMOBILE-segment churn hazard) — Breslow partial "
    "likelihood maximized by THREE unrolled Newton rounds running "
    "entirely on per-event-time risk-set aggregates (exact BIGINT "
    "at-risk/event counts via suffix windows over the duration "
    "histogram); e^β is the portable-exp primitive, each round's "
    "score/information are pinned folds over event times — the "
    "regression capstone of the q341/q357/q298 survival family",
)
def q379_cox_ph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hazard-ratio estimate for segment-driven churn. With one binary
    covariate the partial-likelihood score and information at each
    event time are closed-form in (d, d1, r0, r1) — so Newton's method
    is three rounds of {one-row pexp → broadcast cross join → pinned
    fold}, all lazy, no driver-side convergence loop. score_final
    (≈0) is the in-plan convergence certificate; at β=0 the first
    score equals the q357 log-rank numerator (pinned by the replay
    test).

    Scale: the only fact-table work is the per-customer min/max
    aggregate; event-time frames are duration-grain (≤ days span),
    and every fold runs over event times only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    percust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", "c_mktsegment")
        .agg(
            F.min("o_orderdate").alias("first"),
            F.max("o_orderdate").alias("last"),
        )
        .select(
            F.datediff(F.col("last"), F.col("first")).cast("long").alias("dur"),
            (F.col("c_mktsegment") == "AUTOMOBILE").cast("int").alias("x"),
            (F.col("last") <= F.lit("2001-01-01").cast("date"))
            .cast("int")
            .alias("ev"),
        )
    )
    tot = percust.agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("ev").cast("long").alias("n_events"),
    )
    hist = percust.groupBy("dur").agg(
        F.sum(1 - F.col("x")).cast("long").alias("r0inc"),
        F.sum("x").cast("long").alias("r1inc"),
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.col("ev") * F.col("x")).cast("long").alias("d1"),
    )
    wsuf = Window.orderBy("dur").rowsBetween(0, Window.unboundedFollowing)
    risk = hist.select(
        F.col("dur").alias("t"),
        "d",
        "d1",
        F.sum("r0inc").over(wsuf).cast("long").alias("r0"),
        F.sum("r1inc").over(wsuf).cast("long").alias("r1"),
    )
    rf = risk.filter(F.col("d") > 0)
    b = tot.withColumn("beta", F.lit(0.0))
    fold = lambda fld: F.aggregate(  # noqa: E731
        F.col("arr"), F.lit(0.0), lambda a, s: a + s[fld]
    )
    for k in (1, 2, 3):
        b = _pexp_stage(b, "beta", "eb", f"pe{k}")
        ut, it = _q379_terms("eb")
        tk = rf.crossJoin(F.broadcast(b)).select(
            "t",
            F.expr(ut).alias("ut"),
            F.expr(it).alias("it"),
            "n_customers",
            "n_events",
            "beta",
        )
        fk = tk.groupBy().agg(
            F.any_value("n_customers").alias("n_customers"),
            F.any_value("n_events").alias("n_events"),
            F.any_value("beta").alias("beta"),
            F.array_sort(F.collect_list(F.struct("t", "ut", "it"))).alias(
                "arr"
            ),
        )
        b = fk.select(
            "n_customers",
            "n_events",
            (F.col("beta") + fold("ut") / fold("it")).alias("beta"),
        )
    b = _pexp_stage(b, "beta", "hr", "pe4")
    ut4, it4 = _q379_terms("hr")
    t4 = rf.crossJoin(F.broadcast(b)).select(
        "t",
        F.expr(ut4).alias("ut"),
        F.expr(it4).alias("it"),
        "n_customers",
        "n_events",
        "beta",
        "hr",
    )
    f4 = t4.groupBy().agg(
        F.any_value("n_customers").alias("n_customers"),
        F.any_value("n_events").alias("n_events"),
        F.any_value("beta").alias("beta"),
        F.any_value("hr").alias("hr"),
        F.count("*").cast("long").alias("n_event_times"),
        F.array_sort(F.collect_list(F.struct("t", "ut", "it"))).alias("arr"),
    )
    return f4.select(
        "n_customers",
        "n_events",
        "n_event_times",
        "beta",
        F.col("hr").alias("hazard_ratio"),
        fold("ut").alias("score_final"),
        fold("it").alias("info_final"),
    )


@register(
    "q380_landmark_closeness",
    oracle="""
    WITH RECURSIVE li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), land AS (
        SELECT UNNEST([1, 2, 3, 4, 5, 6, 7, 8]) AS lm
    ), bfs AS (
        SELECT lm, CAST(lm AS BIGINT) AS node, 0 AS hops FROM land
        UNION
        SELECT b.lm, e.v AS node, b.hops + 1 AS hops
        FROM bfs b JOIN e ON e.u = b.node
        WHERE b.hops < 3
    ), reached AS (
        SELECT lm, node, MIN(hops) AS dist FROM bfs GROUP BY 1, 2
    ), counts AS (
        SELECT lm,
               CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        FROM reached GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part
    )
    SELECT CAST(lm AS BIGINT) AS landmark, n1, n2, n3,
           1 + n1 + n2 + n3 AS n_reached,
           CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) / 2e0
               + CAST(n3 AS DOUBLE) / 3e0 AS harmonic_centrality,
           CAST(1 + n1 + n2 + n3 AS DOUBLE) / CAST(n_parts AS DOUBLE)
               AS coverage
    FROM counts CROSS JOIN tot
    """,
    survey_ref="extension: bounded harmonic-closeness centrality from "
    "8 landmark parts over the co-purchase graph — multi-source BFS "
    "as 3 unrolled frontier-join rounds with min-hop dedup (the q156 "
    "superstep carrying a landmark dimension); the harmonic sum "
    "Σ1/d needs NO double fold because d ≤ 3 collapses it to exact "
    "per-distance counts c1 + c2/2 + c3/3",
)
def q380_landmark_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How central are the landmark parts? Per landmark, the exact
    count of parts at hop distance 1/2/3 through shared orders, the
    truncated harmonic centrality (the standard distance-bounded
    variant — documented truncation, not an approximation of the
    unbounded walk), and graph coverage.

    Scale: the edge list is the q156 co-purchase self-join; each BFS
    round is one frontier⋈edges equi-join + a (landmark,node) min
    aggregate — 8 landmarks ride one plan; landmark count is the
    broadcast-side knob."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.alias("a")
    bb = li.alias("b")
    e = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    spark_ = li.sparkSession
    seen = spark_.createDataFrame(
        [(lm, lm, 0) for lm in range(1, 9)], "lm int, node long, hops int"
    )
    for hop in (1, 2, 3):
        nxt = (
            seen.filter(F.col("hops") == hop - 1)
            .join(e, F.col("node") == F.col("u"))
            .select("lm", F.col("v").alias("node"), F.lit(hop).alias("hops"))
            .distinct()
        )
        seen = (
            seen.unionByName(nxt)
            .groupBy("lm", "node")
            .agg(F.min("hops").alias("hops"))
        )
    counts = seen.groupBy("lm").agg(
        F.sum((F.col("hops") == 1).cast("int")).cast("long").alias("n1"),
        F.sum((F.col("hops") == 2).cast("int")).cast("long").alias("n2"),
        F.sum((F.col("hops") == 3).cast("int")).cast("long").alias("n3"),
    )
    tot = load_table(spark, sf_dir, "part").agg(
        F.count("*").cast("long").alias("n_parts")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        F.col("lm").cast("long").alias("landmark"),
        "n1",
        "n2",
        "n3",
        (1 + F.col("n1") + F.col("n2") + F.col("n3")).alias("n_reached"),
        F.expr(
            "CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) / 2e0"
            " + CAST(n3 AS DOUBLE) / 3e0"
        ).alias("harmonic_centrality"),
        F.expr(
            "CAST(1 + n1 + n2 + n3 AS DOUBLE) / CAST(n_parts AS DOUBLE)"
        ).alias("coverage"),
    )


_Q381_PREC = "CASE WHEN tp + fp = 0 THEN 0e0 ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END"
_Q381_REC = "CASE WHEN n_true = 0 THEN 0e0 ELSE CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE) END"
_Q381_F1 = (
    "CASE WHEN prec + rec = 0e0 THEN 0e0"
    " ELSE 2e0 * prec * rec / (prec + rec) END"
)


@register(
    "q381_macro_f1",
    oracle=f"""
    WITH scored AS (
        {_lang_oracle().strip()}
    ), conf AS (
        SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS c
        FROM scored GROUP BY 1, 2
    ), classes AS (
        SELECT lang AS class, CAST(SUM(c) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN lang_pred = lang THEN c ELSE 0 END)
                    AS BIGINT) AS tp
        FROM conf GROUP BY 1
    ), predmass AS (
        SELECT lang_pred AS class, CAST(SUM(c) AS BIGINT) AS n_pred
        FROM conf GROUP BY 1
    ), perclass AS (
        SELECT c.class, c.n_true, COALESCE(p.n_pred, 0) AS n_pred, c.tp,
               COALESCE(p.n_pred, 0) - c.tp AS fp
        FROM classes c LEFT JOIN predmass p ON c.class = p.class
    ), scoredclass AS (
        SELECT *, {_Q381_PREC} AS prec, {_Q381_REC} AS rec
        FROM perclass
    ), f1class AS (
        SELECT *, {_Q381_F1} AS f1 FROM scoredclass
    ), macro AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(f1 ORDER BY class)), (a, v) -> a + v)
                   / CAST(COUNT(*) AS DOUBLE) AS macro_f1,
               CAST(SUM(tp) AS DOUBLE) / CAST(SUM(n_true) AS DOUBLE)
                   AS micro_accuracy
        FROM f1class
    )
    SELECT class, n_true, n_pred, tp, fp, prec AS precision, rec AS recall,
           f1, n_classes, macro_f1, micro_accuracy
    FROM f1class CROSS JOIN macro
    """,
    survey_ref="extension: multi-class classifier evaluation — full "
    "per-class precision/recall/F1 of the q30 language-ID heuristic "
    "against gold labels from one confusion-matrix aggregate, plus "
    "macro-F1 (class-ordered pinned fold — never an unordered AVG of "
    "doubles) and micro accuracy; completes the eval family beside "
    "q321's kappa and q223's AUC",
)
def q381_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scores lang-ID predictions: per-class one-vs-rest counts come
    from the (truth, pred) confusion aggregate; classes are the GOLD
    label set (stray predictions like 'und' count as errors but get no
    row). Macro-F1 folds per-class F1 in class order; micro accuracy
    is exact integer tp-mass over docs.

    Scale: prediction is per-row expression work; the confusion
    matrix is a tiny two-column aggregate — map-side combinable."""
    doc = load_table(spark, sf_dir, "documents")
    scored = doc.select(
        "doc_id", "lang", text.lang_id("text").alias("lang_pred")
    )
    conf = scored.groupBy("lang", "lang_pred").agg(
        F.count("*").cast("long").alias("c")
    )
    classes = conf.groupBy(F.col("lang").alias("class")).agg(
        F.sum("c").cast("long").alias("n_true"),
        F.sum(F.when(F.col("lang_pred") == F.col("lang"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("tp"),
    )
    predmass = conf.groupBy(F.col("lang_pred").alias("class")).agg(
        F.sum("c").cast("long").alias("n_pred")
    )
    perclass = (
        classes.join(predmass, "class", "left")
        .withColumn("n_pred", F.coalesce(F.col("n_pred"), F.lit(0)).cast("long"))
        .withColumn("fp", F.col("n_pred") - F.col("tp"))
    )
    scoredclass = perclass.withColumn("prec", F.expr(_Q381_PREC)).withColumn(
        "rec", F.expr(_Q381_REC)
    )
    f1class = scoredclass.withColumn("f1", F.expr(_Q381_F1))
    macro = f1class.groupBy().agg(
        F.count("*").cast("long").alias("n_classes"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("class", "f1"))),
            F.lit(0.0),
            lambda a, s: a + s["f1"],
        ).alias("f1sum"),
        F.sum("tp").cast("long").alias("tpsum"),
        F.sum("n_true").cast("long").alias("ntsum"),
    ).select(
        "n_classes",
        (F.col("f1sum") / F.col("n_classes").cast("double")).alias("macro_f1"),
        (
            F.col("tpsum").cast("double") / F.col("ntsum").cast("double")
        ).alias("micro_accuracy"),
    )
    return f1class.crossJoin(F.broadcast(macro)).select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        "fp",
        F.col("prec").alias("precision"),
        F.col("rec").alias("recall"),
        "f1",
        "n_classes",
        "macro_f1",
        "micro_accuracy",
    )


# MRR from exact first-relevant-rank counts: Σ c_r/r is a LITERAL
# 10-term expression — no double fold, no order sensitivity.
_Q382_MRR = (
    "("
    + " + ".join(f"CAST(c{r} AS DOUBLE) / {r}e0" for r in range(1, 11))
    + ") / CAST(nq AS DOUBLE)"
)


@register(
    "q382_retrieval_eval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 20 = 0
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               q.label AS qlab, c.label AS clab,
               {_duck_cos("q.embedding", "c.embedding")} AS score
        FROM q JOIN embeddings c ON c.vec_id <> q.vec_id
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, match_id) AS rank
        FROM scored
    ), top10 AS (
        SELECT * FROM ranked WHERE rank <= 10
    ), perq AS (
        SELECT query_id,
               MIN(CASE WHEN clab = qlab THEN rank END) AS first_rel,
               CAST(SUM(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rel,
               CAST(MAX(CASE WHEN rank = 1 AND clab = qlab
                             THEN 1 ELSE 0 END) AS BIGINT) AS hit1
        FROM top10 GROUP BY 1
    ), counts AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nq,
               {", ".join(
                   f"CAST(SUM(CASE WHEN first_rel = {r} THEN 1 ELSE 0 END)"
                   f" AS BIGINT) AS c{r}" for r in range(1, 11))},
               CAST(SUM(hit1) AS BIGINT) AS nhit1,
               CAST(SUM(CASE WHEN first_rel IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS nhit10,
               CAST(SUM(n_rel) AS BIGINT) AS nrel10
        FROM perq
    )
    SELECT nq AS n_queries, {_Q382_MRR} AS mrr_at_10,
           CAST(nhit1 AS DOUBLE) / CAST(nq AS DOUBLE) AS hit_rate_at_1,
           CAST(nhit10 AS DOUBLE) / CAST(nq AS DOUBLE) AS hit_rate_at_10,
           CAST(nrel10 AS DOUBLE) / CAST(nq * 10 AS DOUBLE)
               AS precision_at_10
    FROM counts
    """,
    survey_ref="extension: labeled similarity-search evaluation — "
    "MRR@10, hit@1/10 and precision@10 of exact brute-cosine "
    "retrieval against the embeddings' class labels; MRR avoids "
    "double-sum order entirely by counting first-relevant-rank "
    "occurrences (BIGINT c_1..c_10) and evaluating the literal "
    "Σc_r/r — the metric layer for the q28/q53/q74/q194 ANN stack "
    "(swap the retrieval CTE to score any of them)",
)
def q382_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scores cosine retrieval with same-label relevance: every 20th
    vector queries the full corpus (self excluded), the top-10 list
    per query comes from the q28 broadcast top-k, and all four
    metrics reduce to exact integer counts — the only doubles are
    final literal divisions.

    Scale: corpus-side scoring is one scan with the query block
    broadcast (q28's plan); per-query state is a 10-row group."""
    from stock_data_pipeline_spark.llm import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    top10 = similarity.cosine_topk(emb, queries, k=10)
    qlab = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlab")
    )
    clab = emb.select(
        F.col("vec_id").alias("match_id"), F.col("label").alias("clab")
    )
    labeled = top10.join(F.broadcast(qlab), "query_id").join(
        F.broadcast(clab), "match_id"
    )
    rel = F.col("clab") == F.col("qlab")
    perq = labeled.groupBy("query_id").agg(
        F.min(F.when(rel, F.col("rank"))).alias("first_rel"),
        F.sum(rel.cast("int")).cast("long").alias("n_rel"),
        F.max(((F.col("rank") == 1) & rel).cast("int"))
        .cast("long")
        .alias("hit1"),
    )
    counts = perq.agg(
        F.count("*").cast("long").alias("nq"),
        *[
            F.sum((F.col("first_rel") == r).cast("int"))
            .cast("long")
            .alias(f"c{r}")
            for r in range(1, 11)
        ],
        F.sum("hit1").cast("long").alias("nhit1"),
        F.sum(F.col("first_rel").isNotNull().cast("int"))
        .cast("long")
        .alias("nhit10"),
        F.sum("n_rel").cast("long").alias("nrel10"),
    )
    return counts.select(
        F.col("nq").alias("n_queries"),
        F.expr(_Q382_MRR).alias("mrr_at_10"),
        F.expr("CAST(nhit1 AS DOUBLE) / CAST(nq AS DOUBLE)").alias(
            "hit_rate_at_1"
        ),
        F.expr("CAST(nhit10 AS DOUBLE) / CAST(nq AS DOUBLE)").alias(
            "hit_rate_at_10"
        ),
        F.expr("CAST(nrel10 AS DOUBLE) / CAST(nq * 10 AS DOUBLE)").alias(
            "precision_at_10"
        ),
    )


# ---------------------------------------------------------------------------
# Batch 43 (round 5): binary-segmentation changepoints, ANOVA post-hoc
# pairwise z-tests, Shapley channel attribution, EM record-linkage.
# ---------------------------------------------------------------------------


def _q383_sse(n: str, sy: str, syy: str) -> str:
    """Segment SSE closed-form: Σ(y−ȳ)² = (n·Σy² − (Σy)²)/n — the
    BIGINT numerator is exact (≈2e12 at sf0.1's day grain)."""
    return f"CAST({n} * {syy} - {sy} * {sy} AS DOUBLE) / CAST({n} AS DOUBLE)"


_Q383_COST1 = (
    f"{_q383_sse('cn', 'cy', 'cyy')}"
    f" + {_q383_sse('(n - cn)', '(ty - cy)', '(tyy - cyy)')}"
)
_Q383_COSTL = (
    f"{_q383_sse('cn', 'cy', 'cyy')}"
    f" + {_q383_sse('(c1n - cn)', '(c1y - cy)', '(c1yy - cyy)')}"
)
_Q383_COSTR = (
    f"{_q383_sse('(cn - c1n)', '(cy - c1y)', '(cyy - c1yy)')}"
    f" + {_q383_sse('(n - cn)', '(ty - cy)', '(tyy - cyy)')}"
)


@register(
    "q383_binary_segmentation",
    oracle=f"""
    WITH daily AS ({_REG_DAILY}
    ), cum AS (
        SELECT day,
               CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT) AS cn,
               CAST(SUM(y) OVER (ORDER BY x) AS BIGINT) AS cy,
               CAST(SUM(y * y) OVER (ORDER BY x) AS BIGINT) AS cyy
        FROM daily
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS ty,
               CAST(SUM(y * y) AS BIGINT) AS tyy
        FROM daily
    ), lvl1 AS (
        SELECT c.*, t.n, t.ty, t.tyy, {_Q383_COST1} AS cost,
               ROW_NUMBER() OVER (ORDER BY {_Q383_COST1}, c.day) AS rk
        FROM cum c CROSS JOIN tot t
        WHERE c.cn >= 1 AND c.cn <= t.n - 1
    ), s1 AS (
        SELECT day AS d1, cn AS c1n, cy AS c1y, cyy AS c1yy, n, ty, tyy,
               cost AS sse_2seg,
               {_q383_sse('cn', 'cy', 'cyy')} AS sseL,
               {_q383_sse('(n - cn)', '(ty - cy)', '(tyy - cyy)')} AS sseR
        FROM lvl1 WHERE rk = 1
    ), sub AS (
        SELECT c.day, 'L' AS side,
               s.sseL - ({_Q383_COSTL}) AS gain, {_Q383_COSTL} AS subcost,
               s.*
        FROM cum c CROSS JOIN s1 s
        WHERE c.cn >= 1 AND c.cn <= s.c1n - 1
        UNION ALL
        SELECT c.day, 'R' AS side,
               s.sseR - ({_Q383_COSTR}) AS gain, {_Q383_COSTR} AS subcost,
               s.*
        FROM cum c CROSS JOIN s1 s
        WHERE c.cn >= s.c1n + 1 AND c.cn <= s.n - 1
    ), s2 AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY gain DESC, side, day) AS rk
        FROM sub
    ), best AS (
        SELECT day AS d2, side, gain, d1, c1n, c1y, c1yy, n, ty, tyy,
               sse_2seg, sseL, sseR, subcost
        FROM s2 WHERE rk = 1
    ), bounds AS (
        SELECT *, LEAST(d1, d2) AS da, GREATEST(d1, d2) AS db FROM best
    ), staged AS (
        SELECT b.*, pa.cn AS an, pa.cy AS ay, pa.cyy AS ayy,
               pb.cn AS bn, pb.cy AS by_, pb.cyy AS byy
        FROM bounds b
        JOIN cum pa ON pa.day = b.da
        JOIN cum pb ON pb.day = b.db
    )
    SELECT d1 AS cp1_day, d2 AS cp2_day, da AS seg1_end, db AS seg2_end,
           n AS n_days,
           CAST(ay AS DOUBLE) / CAST(an AS DOUBLE) AS mean1,
           CAST(by_ - ay AS DOUBLE) / CAST(bn - an AS DOUBLE) AS mean2,
           CAST(ty - by_ AS DOUBLE) / CAST(n - bn AS DOUBLE) AS mean3,
           {_q383_sse('n', 'ty', 'tyy')} AS sse_1seg,
           sse_2seg,
           {_q383_sse('an', 'ay', 'ayy')}
               + {_q383_sse('(bn - an)', '(by_ - ay)', '(byy - ayy)')}
               + {_q383_sse('(n - bn)', '(ty - by_)', '(tyy - byy)')}
               AS sse_3seg,
           ({_q383_sse('n', 'ty', 'tyy')} - ({_q383_sse('an', 'ay', 'ayy')}
               + {_q383_sse('(bn - an)', '(by_ - ay)', '(byy - ayy)')}
               + {_q383_sse('(n - bn)', '(ty - by_)', '(tyy - byy)')}))
               / ({_q383_sse('n', 'ty', 'tyy')}) AS gain_ratio
    FROM staged
    """,
    survey_ref="extension: two-changepoint binary segmentation of the "
    "daily order-volume MEAN — the recursive extension of q210's "
    "single CUSUM shift and the mean-model sibling of q317's slope "
    "break: best first split by closed-form prefix-sum SSE, then the "
    "better sub-split of either side (gain tiebreak L-then-day); "
    "every candidate cost is exact-BIGINT algebra, no per-split refit",
)
def q383_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-down binary segmentation: scan all first splits via prefix
    sums (cn, Σy, Σy²), take the SSE-argmin, then scan both sides for
    the best second split and keep the larger-gain side. Reports the
    three segment means, the 1/2/3-segment SSEs and the variance-
    explained gain — all closed-form doubles over exact integers.

    Scale: the q317 discipline — day-grain prefix windows (bucket-
    partitionable), broadcast single-row splits, rank argmins instead
    of global sorts."""
    daily = _reg_daily_spark(spark, sf_dir)
    wx = Window.orderBy("x")
    wcum = wx.rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day",
        F.row_number().over(wx).cast("long").alias("cn"),
        F.sum("y").over(wcum).cast("long").alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wcum).cast("long").alias("cyy"),
    )
    tot = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("ty"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("tyy"),
    )
    lvl1 = (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("cn") >= 1) & (F.col("cn") <= F.col("n") - 1))
        .withColumn("cost", F.expr(_Q383_COST1))
        .withColumn(
            "rk", F.row_number().over(Window.orderBy(F.col("cost"), "day"))
        )
    )
    s1 = lvl1.filter(F.col("rk") == 1).select(
        F.col("day").alias("d1"),
        F.col("cn").alias("c1n"),
        F.col("cy").alias("c1y"),
        F.col("cyy").alias("c1yy"),
        "n",
        "ty",
        "tyy",
        F.col("cost").alias("sse_2seg"),
        F.expr(_q383_sse("cn", "cy", "cyy")).alias("sseL"),
        F.expr(_q383_sse("(n - cn)", "(ty - cy)", "(tyy - cyy)")).alias(
            "sseR"
        ),
    )
    cl = cum.crossJoin(F.broadcast(s1))
    left = (
        cl.filter((F.col("cn") >= 1) & (F.col("cn") <= F.col("c1n") - 1))
        .withColumn("side", F.lit("L"))
        .withColumn("subcost", F.expr(_Q383_COSTL))
        .withColumn("gain", F.col("sseL") - F.col("subcost"))
    )
    right = (
        cl.filter(
            (F.col("cn") >= F.col("c1n") + 1) & (F.col("cn") <= F.col("n") - 1)
        )
        .withColumn("side", F.lit("R"))
        .withColumn("subcost", F.expr(_Q383_COSTR))
        .withColumn("gain", F.col("sseR") - F.col("subcost"))
    )
    sub = left.unionByName(right)
    best = (
        sub.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("gain").desc(), "side", "day")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(
            F.col("day").alias("d2"),
            "side",
            "gain",
            "d1",
            "c1n",
            "c1y",
            "c1yy",
            "n",
            "ty",
            "tyy",
            "sse_2seg",
            "sseL",
            "sseR",
            "subcost",
        )
    )
    bounds = best.withColumn("da", F.least("d1", "d2")).withColumn(
        "db", F.greatest("d1", "d2")
    )
    pa = cum.select(
        F.col("day").alias("da"),
        F.col("cn").alias("an"),
        F.col("cy").alias("ay"),
        F.col("cyy").alias("ayy"),
    )
    pb = cum.select(
        F.col("day").alias("db"),
        F.col("cn").alias("bn"),
        F.col("cy").alias("by_"),
        F.col("cyy").alias("byy"),
    )
    staged = bounds.join(F.broadcast(pa), "da").join(F.broadcast(pb), "db")
    sse3 = (
        f"{_q383_sse('an', 'ay', 'ayy')}"
        f" + {_q383_sse('(bn - an)', '(by_ - ay)', '(byy - ayy)')}"
        f" + {_q383_sse('(n - bn)', '(ty - by_)', '(tyy - byy)')}"
    )
    sse1 = _q383_sse("n", "ty", "tyy")
    return staged.select(
        F.col("d1").alias("cp1_day"),
        F.col("d2").alias("cp2_day"),
        F.col("da").alias("seg1_end"),
        F.col("db").alias("seg2_end"),
        F.col("n").alias("n_days"),
        F.expr("CAST(ay AS DOUBLE) / CAST(an AS DOUBLE)").alias("mean1"),
        F.expr("CAST(by_ - ay AS DOUBLE) / CAST(bn - an AS DOUBLE)").alias(
            "mean2"
        ),
        F.expr("CAST(ty - by_ AS DOUBLE) / CAST(n - bn AS DOUBLE)").alias(
            "mean3"
        ),
        F.expr(sse1).alias("sse_1seg"),
        "sse_2seg",
        F.expr(sse3).alias("sse_3seg"),
        F.expr(f"(({sse1}) - ({sse3})) / ({sse1})").alias("gain_ratio"),
    )


_Q384_Z = (
    "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))"
    " / sqrt(s2 * (1e0 / CAST(na AS DOUBLE) + 1e0 / CAST(nb AS DOUBLE)))"
)


@register(
    "q384_posthoc_pairwise",
    oracle=f"""
    WITH grp AS (
        SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) // 1000000) AS BIGINT) AS s_g,
               CAST(SUM((CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) // 1000000)
                        * (CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT) // 1000000)) AS BIGINT) AS ss_g
        FROM orders GROUP BY 1
    ), pooled AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
               CAST(COUNT(*) AS BIGINT) AS k,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(CAST(n_g * ss_g - s_g * s_g AS DOUBLE)
                        / CAST(n_g AS DOUBLE) ORDER BY g)),
                   (a, v) -> a + v) AS ssw
        FROM grp
    ), s2t AS (
        SELECT *, ssw / CAST(n_tot - k AS DOUBLE) AS s2 FROM pooled
    ), pairs AS (
        SELECT a.g AS g_a, b.g AS g_b, a.n_g AS na, a.s_g AS sa,
               b.n_g AS nb, b.s_g AS sb, p.s2, p.k,
               CAST(p.k * (p.k - 1) / 2 AS BIGINT) AS m
        FROM grp a JOIN grp b ON a.g < b.g CROSS JOIN s2t p
    ), zt AS (
        SELECT g_a, g_b, na, nb, m, {_Q384_Z} AS z FROM pairs
    ), xt AS (
        SELECT *, abs(z) / 1.4142135623730951e0 AS xv FROM zt
    ), tt AS (
        SELECT *, 1e0 / (1e0 + 3.275911e-1 * xv) AS tv, -(xv * xv) AS xa
        FROM xt
    ), {_pexp_ctes("tt", "xa", "ex", "qe")}
    SELECT g_a, g_b, na AS n_a, nb AS n_b, z,
           {_erfc_poly("tv")} * ex AS p_raw,
           LEAST(CAST(m AS DOUBLE) * ({_erfc_poly("tv")} * ex), 1e0)
               AS p_bonferroni,
           LEAST(CAST(m AS DOUBLE) * ({_erfc_poly("tv")} * ex), 1e0) <= 5e-2
               AS significant
    FROM qe
    """,
    survey_ref="extension: post-hoc pairwise comparisons after q333's "
    "ANOVA — all C(5,2) order-priority pairs of mean order value "
    "(in $10k units, exact BIGINT moments), z with the POOLED "
    "within-group variance, two-sided p via portable erfc and "
    "Bonferroni control at the pair count; the which-groups-differ "
    "layer q333's omnibus F cannot answer",
)
def q384_posthoc_pairwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which priority classes actually differ in mean order value?
    Per-group exact (n, Σ, Σ²) in $10k integer units → pooled s²
    (group-ordered pinned fold of the per-group SS) → pairwise z and
    Bonferroni-adjusted two-sided p per pair. The total-price floor
    division to $10k units keeps every moment integer-exact.

    Scale: one map-side-combinable aggregate to 5 groups; the
    5×5/2-row pair frame is driver-free broadcast algebra."""
    o = load_table(spark, sf_dir, "orders")
    # $10k units from exact cents (positive values: div == floor-div)
    v = F.expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        " div 1000000"
    )
    grp = o.groupBy(F.col("o_orderpriority").alias("g")).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(v).cast("long").alias("s_g"),
        F.sum(v * v).cast("long").alias("ss_g"),
    )
    pooled = grp.groupBy().agg(
        F.sum("n_g").cast("long").alias("n_tot"),
        F.count("*").cast("long").alias("k"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "g",
                        F.expr(
                            "CAST(n_g * ss_g - s_g * s_g AS DOUBLE)"
                            " / CAST(n_g AS DOUBLE)"
                        ).alias("ssw_g"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, s: a + s["ssw_g"],
        ).alias("ssw"),
    )
    s2t = pooled.withColumn("s2", F.expr("ssw / CAST(n_tot - k AS DOUBLE)"))
    a, b = grp.alias("a"), grp.alias("b")
    pairs = (
        a.join(b, F.col("a.g") < F.col("b.g"))
        .crossJoin(F.broadcast(s2t))
        .select(
            F.col("a.g").alias("g_a"),
            F.col("b.g").alias("g_b"),
            F.col("a.n_g").alias("na"),
            F.col("a.s_g").alias("sa"),
            F.col("b.n_g").alias("nb"),
            F.col("b.s_g").alias("sb"),
            "s2",
            "k",
            (F.col("k") * (F.col("k") - 1) / 2).cast("long").alias("m"),
        )
    )
    zt = pairs.select(
        "g_a", "g_b", "na", "nb", "m", F.expr(_Q384_Z).alias("z")
    )
    xt = zt.withColumn("xv", F.expr("abs(z) / 1.4142135623730951e0"))
    tt = xt.withColumn(
        "tv", F.expr("1e0 / (1e0 + 3.275911e-1 * xv)")
    ).withColumn("xa", F.expr("-(xv * xv)"))
    qe = _pexp_stage(tt, "xa", "ex", "qe")
    praw = F.expr(f"{_erfc_poly('tv')} * ex")
    pbon = F.least(F.col("m").cast("double") * praw, F.lit(1e0))
    return qe.select(
        "g_a",
        "g_b",
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "z",
        praw.alias("p_raw"),
        pbon.alias("p_bonferroni"),
        (pbon <= F.lit(5e-2)).alias("significant"),
    )


# Shapley weights for 3 players: |S|=0 → 1/3, |S|=1 → 1/6, |S|=2 → 1/3.
_Q385_CHANNELS = ("click", "view", "signup")


def _q385_vexpr(s: int) -> str:
    """v(S) = conv rate among users whose touchset ⊆ S — subset mass
    from the 8 exact pattern counts via bitmask containment."""
    return (
        f"CASE WHEN n{s} = 0 THEN 0e0"
        f" ELSE CAST(k{s} AS DOUBLE) / CAST(n{s} AS DOUBLE) END"
    )


def _q385_phi(ch_bit: int) -> str:
    """φ_i = Σ_S⊆N∖{{i}} w(|S|)·(v(S∪i) − v(S)) expanded literally."""
    others = [b for b in (4, 2, 1) if b != ch_bit]
    terms = []
    for s_bits, w in (
        (0, "3e0"),
        (others[0], "6e0"),
        (others[1], "6e0"),
        (others[0] | others[1], "3e0"),
    ):
        terms.append(f"(v{s_bits | ch_bit} - v{s_bits}) / {w}")
    return "(" + " + ".join(terms) + ")"


@register(
    "q385_shapley_attribution",
    oracle=f"""
    WITH touch AS (
        SELECT user_id,
               CAST(CASE WHEN 5 * SUM(CASE WHEN event_type = 'click'
                              THEN 1 ELSE 0 END) >= COUNT(*)
                         THEN 4 ELSE 0 END
                  + CASE WHEN 5 * SUM(CASE WHEN event_type = 'view'
                              THEN 1 ELSE 0 END) >= COUNT(*)
                         THEN 2 ELSE 0 END
                  + CASE WHEN 5 * SUM(CASE WHEN event_type = 'signup'
                              THEN 1 ELSE 0 END) >= COUNT(*)
                         THEN 1 ELSE 0 END AS BIGINT) AS t,
               CAST(CASE WHEN 5 * SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) >= COUNT(*)
                         THEN 1 ELSE 0 END AS BIGINT) AS conv
        FROM events GROUP BY 1
    ), pat AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n_t,
               CAST(SUM(conv) AS BIGINT) AS k_t
        FROM touch GROUP BY 1
    ), coal AS (
        SELECT {", ".join(
            f"CAST(SUM(CASE WHEN (t & {s}) = t THEN n_t ELSE 0 END)"
            f" AS BIGINT) AS n{s},"
            f" CAST(SUM(CASE WHEN (t & {s}) = t THEN k_t ELSE 0 END)"
            f" AS BIGINT) AS k{s}" for s in range(8))}
        FROM pat
    ), vs AS (
        SELECT *, {", ".join(f"{_q385_vexpr(s)} AS v{s}" for s in range(8))}
        FROM coal
    ), phis AS (
        SELECT v0, v7, n7,
               {_q385_phi(4)} AS phi_click,
               {_q385_phi(2)} AS phi_view,
               {_q385_phi(1)} AS phi_signup
        FROM vs
    )
    SELECT 'click' AS channel, phi_click AS phi,
           CASE WHEN v7 - v0 = 0e0 THEN 0e0
                ELSE phi_click / (v7 - v0) END AS phi_share,
           v7 AS v_full, v0 AS v_empty, n7 AS n_users
    FROM phis
    UNION ALL
    SELECT 'view', phi_view,
           CASE WHEN v7 - v0 = 0e0 THEN 0e0
                ELSE phi_view / (v7 - v0) END,
           v7, v0, n7
    FROM phis
    UNION ALL
    SELECT 'signup', phi_signup,
           CASE WHEN v7 - v0 = 0e0 THEN 0e0
                ELSE phi_signup / (v7 - v0) END,
           v7, v0, n7
    FROM phis
    """,
    survey_ref="extension: Shapley-value channel attribution — the "
    "axiomatic companion to q348's Markov removal effect: the player "
    "set is above-par exposure to click/view/signup (5·count ≥ total, "
    "an exact integer test), payoff is above-par purchasing; v(S) = "
    "conversion rate over the ⊆-S touchset mass from 8 exact pattern "
    "counts via bitmask containment, φ_i expanded literally with the "
    "3-player weights 1/3,1/6,1/3; efficiency Σφ = v(full)−v(∅) is "
    "the test invariant",
)
def q385_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley credit for channel affinity toward heavy purchasing:
    each user reduces to a 3-bit touchset (above-par share of clicks/
    views/signups — integer cross-multiplication, no rate division)
    plus an above-par-purchaser flag; the whole game then lives on 8
    coalition aggregates — v(S) uses ⊆-containment so supersets
    include their subsets' users. All doubles are single divisions of
    exact integers.

    Scale: one user-grain aggregate + one 8-row aggregate;
    attribution math is constant-size regardless of corpus."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type")
    cnt = lambda et: F.sum(  # noqa: E731
        F.when(F.col("event_type") == et, 1).otherwise(0)
    )
    touch = ev.groupBy("user_id").agg(
        (
            F.when(5 * cnt("click") >= F.count("*"), 4).otherwise(0)
            + F.when(5 * cnt("view") >= F.count("*"), 2).otherwise(0)
            + F.when(5 * cnt("signup") >= F.count("*"), 1).otherwise(0)
        )
        .cast("long")
        .alias("t"),
        F.when(5 * cnt("purchase") >= F.count("*"), 1)
        .otherwise(0)
        .cast("long")
        .alias("conv"),
    )
    pat = touch.groupBy("t").agg(
        F.count("*").cast("long").alias("n_t"),
        F.sum("conv").cast("long").alias("k_t"),
    )
    coal_aggs = []
    for s in range(8):
        cond = F.expr(f"(t & {s}) = t")
        coal_aggs.append(
            F.sum(F.when(cond, F.col("n_t")).otherwise(0))
            .cast("long")
            .alias(f"n{s}")
        )
        coal_aggs.append(
            F.sum(F.when(cond, F.col("k_t")).otherwise(0))
            .cast("long")
            .alias(f"k{s}")
        )
    coal = pat.groupBy().agg(*coal_aggs)
    vs = coal
    for s in range(8):
        vs = vs.withColumn(f"v{s}", F.expr(_q385_vexpr(s)))
    phis = vs.select(
        "v0",
        "v7",
        "n7",
        F.expr(_q385_phi(4)).alias("phi_click"),
        F.expr(_q385_phi(2)).alias("phi_view"),
        F.expr(_q385_phi(1)).alias("phi_signup"),
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(ch).alias("channel"),
                F.col(f"phi_{ch}").alias("phi"),
            )
            for ch in _Q385_CHANNELS
        ]
    )
    exploded = phis.select(
        "v0", "v7", "n7", F.explode(rows).alias("s")
    ).select("v0", "v7", "n7", "s.channel", "s.phi")
    return exploded.select(
        "channel",
        "phi",
        F.expr(
            "CASE WHEN v7 - v0 = 0e0 THEN 0e0 ELSE phi / (v7 - v0) END"
        ).alias("phi_share"),
        F.col("v7").alias("v_full"),
        F.col("v0").alias("v_empty"),
        F.col("n7").alias("n_users"),
    )


def _q386_estep(pi: str) -> str:
    """Posterior match weight per agreement pattern g (3 binary
    fields): w_g = π·Πm' / (π·Πm' + (1−π)·Πu') with the field factors
    chosen by g's bits — expanded literally for both engines."""
    mprod = " * ".join(
        f"(CASE WHEN (g & {b}) = {b} THEN m{j} ELSE 1e0 - m{j} END)"
        for j, b in ((1, 4), (2, 2), (3, 1))
    )
    uprod = " * ".join(
        f"(CASE WHEN (g & {b}) = {b} THEN u{j} ELSE 1e0 - u{j} END)"
        for j, b in ((1, 4), (2, 2), (3, 1))
    )
    return (
        f"({pi} * ({mprod}))"
        f" / ({pi} * ({mprod}) + (1e0 - {pi}) * ({uprod}))"
    )


def _q386_oracle() -> str:
    rounds = []
    prev = "p0"
    for k in (1, 2, 3):
        w = _q386_estep("pi")
        msums = ", ".join(
            f"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(CASE WHEN (g & {b}) = {b}
                        THEN CAST(n_g AS DOUBLE) * wg ELSE 0e0 END
                        ORDER BY g)), (a, v) -> a + v) AS mm{j},
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(CASE WHEN (g & {b}) = {b}
                        THEN CAST(n_g AS DOUBLE) * (1e0 - wg) ELSE 0e0 END
                        ORDER BY g)), (a, v) -> a + v) AS uu{j}"""
            for j, b in ((1, 4), (2, 2), (3, 1))
        )
        rounds.append(f"""e{k} AS (
        SELECT pat.g, pat.n_g, {w} AS wg, p.*
        FROM pat CROSS JOIN {prev} p
    ), s{k} AS (
        SELECT any_value(n_pairs) AS n_pairs,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(CAST(n_g AS DOUBLE) * wg ORDER BY g)),
                   (a, v) -> a + v) AS wsum,
               {msums}
        FROM e{k}
    ), p{k} AS (
        SELECT n_pairs, wsum / CAST(n_pairs AS DOUBLE) AS pi,
               mm1 / wsum AS m1, mm2 / wsum AS m2, mm3 / wsum AS m3,
               uu1 / (CAST(n_pairs AS DOUBLE) - wsum) AS u1,
               uu2 / (CAST(n_pairs AS DOUBLE) - wsum) AS u2,
               uu3 / (CAST(n_pairs AS DOUBLE) - wsum) AS u3
        FROM s{k}
    )""")
        prev = f"p{k}"
    return f"""
    WITH feats AS (
        SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
               (CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                - ((CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    % 10000) + 10000) % 10000) // 10000 AS bal_bucket,
               CASE WHEN c.c_acctbal >= 0 THEN 1 ELSE 0 END AS pos,
               CAST(COUNT(o.o_orderkey) AS BIGINT) // 5 AS ord_bucket
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3, 4, 5
    ), pairs AS (
        SELECT CAST(CASE WHEN a.bal_bucket = b.bal_bucket THEN 4 ELSE 0 END
                  + CASE WHEN a.pos = b.pos THEN 2 ELSE 0 END
                  + CASE WHEN a.ord_bucket = b.ord_bucket THEN 1 ELSE 0 END
                    AS BIGINT) AS g
        FROM feats a JOIN feats b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_custkey < b.c_custkey
    ), pat AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g FROM pairs GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n_pairs FROM pat
    ), p0 AS (
        SELECT n_pairs, 5e-2 AS pi, 9e-1 AS m1, 9e-1 AS m2, 9e-1 AS m3,
               3e-1 AS u1, 3e-1 AS u2, 3e-1 AS u3
        FROM tot
    ), {", ".join(rounds)}
    SELECT n_pairs, pi, m1, m2, m3, u1, u2, u3,
           m1 / u1 AS agreement_ratio_1,
           m2 / u2 AS agreement_ratio_2,
           m3 / u3 AS agreement_ratio_3
    FROM p3
    """


@register(
    "q386_em_linkage",
    oracle=_q386_oracle(),
    survey_ref="extension: EM-estimated Fellegi-Sunter parameters — "
    "upgrades q257's FIXED m-priors by fitting (π, m_j, u_j) with "
    "three unrolled EM rounds of a two-component product-Bernoulli "
    "mixture; the whole algorithm runs on the 8 exact agreement-"
    "pattern counts (E-step literal per pattern, M-step "
    "pattern-ordered pinned folds), so iteration cost is O(8) "
    "regardless of pair volume",
)
def q386_em_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learns linkage weights instead of assuming them: blocked pairs
    (q257's blocking and fingerprints) reduce to 8 agreement-pattern
    counts; EM alternates closed-form posteriors per pattern with
    count-weighted parameter updates — all lazy, three rounds
    unrolled, no driver loop. agreement_ratio_j = m_j/u_j is the
    field's evidential weight (the log of it is q257's score).

    Scale: the only pair-volume work is the blocked self-join feeding
    ONE 8-row aggregate; EM never touches pairs again."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cents = (_dec("c_acctbal") * 100).cast("long")
    bucket = (
        (cents - F.pmod(F.pmod(cents, 10000) + 10000, 10000)) / 10000
    ).cast("long")
    feats = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            bucket.alias("bal_bucket"),
            (F.col("c_acctbal") >= 0).cast("long").alias("pos"),
        )
        .agg(
            ((F.count("o_orderkey") - F.pmod(F.count("o_orderkey"), 5)) / 5)
            .cast("long")
            .alias("ord_bucket")
        )
    )
    a, b = feats.alias("a"), feats.alias("b")
    pairs = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        (
            F.when(F.col("a.bal_bucket") == F.col("b.bal_bucket"), 4).otherwise(0)
            + F.when(F.col("a.pos") == F.col("b.pos"), 2).otherwise(0)
            + F.when(F.col("a.ord_bucket") == F.col("b.ord_bucket"), 1).otherwise(0)
        )
        .cast("long")
        .alias("g")
    )
    pat = pairs.groupBy("g").agg(F.count("*").cast("long").alias("n_g"))
    p = pat.agg(F.sum("n_g").cast("long").alias("n_pairs")).select(
        "n_pairs",
        F.lit(5e-2).alias("pi"),
        F.lit(9e-1).alias("m1"),
        F.lit(9e-1).alias("m2"),
        F.lit(9e-1).alias("m3"),
        F.lit(3e-1).alias("u1"),
        F.lit(3e-1).alias("u2"),
        F.lit(3e-1).alias("u3"),
    )
    fold = lambda fld: F.aggregate(  # noqa: E731
        F.col("arr"), F.lit(0.0), lambda acc, s: acc + s[fld]
    )
    for _ in (1, 2, 3):
        ek = pat.crossJoin(F.broadcast(p)).withColumn(
            "wg", F.expr(_q386_estep("pi"))
        )
        struct_fields = [
            F.col("g"),
            (F.col("n_g").cast("double") * F.col("wg")).alias("nw"),
        ]
        for j, bit in ((1, 4), (2, 2), (3, 1)):
            struct_fields.append(
                F.expr(
                    f"CASE WHEN (g & {bit}) = {bit}"
                    f" THEN CAST(n_g AS DOUBLE) * wg ELSE 0e0 END"
                ).alias(f"mm{j}")
            )
            struct_fields.append(
                F.expr(
                    f"CASE WHEN (g & {bit}) = {bit}"
                    f" THEN CAST(n_g AS DOUBLE) * (1e0 - wg) ELSE 0e0 END"
                ).alias(f"uu{j}")
            )
        sk = ek.groupBy().agg(
            F.any_value("n_pairs").alias("n_pairs"),
            F.array_sort(F.collect_list(F.struct(*struct_fields))).alias(
                "arr"
            ),
        ).select(
            "n_pairs",
            fold("nw").alias("wsum"),
            *[fold(f"mm{j}").alias(f"mm{j}") for j in (1, 2, 3)],
            *[fold(f"uu{j}").alias(f"uu{j}") for j in (1, 2, 3)],
        )
        p = sk.select(
            "n_pairs",
            F.expr("wsum / CAST(n_pairs AS DOUBLE)").alias("pi"),
            *[F.expr(f"mm{j} / wsum").alias(f"m{j}") for j in (1, 2, 3)],
            *[
                F.expr(f"uu{j} / (CAST(n_pairs AS DOUBLE) - wsum)").alias(
                    f"u{j}"
                )
                for j in (1, 2, 3)
            ],
        )
    return p.select(
        "n_pairs",
        "pi",
        "m1",
        "m2",
        "m3",
        "u1",
        "u2",
        "u3",
        F.expr("m1 / u1").alias("agreement_ratio_1"),
        F.expr("m2 / u2").alias("agreement_ratio_2"),
        F.expr("m3 / u3").alias("agreement_ratio_3"),
    )


# ---------------------------------------------------------------------------
# Batch 44 (round 5): AR(2) Yule-Walker, clustering coefficients,
# Holt-Winters additive seasonal smoothing, decision-stump info gain.
# ---------------------------------------------------------------------------

_Q387_R = {
    k: (
        f"CAST(n * n * sxy{k} - n * sy * (sh{k} + st{k})"
        f" + (n - {k}) * sy * sy AS DOUBLE)"
        f" / CAST(n * (n * syy - sy * sy) AS DOUBLE)"
    )
    for k in (1, 2)
}
_Q387_PHI1 = "r1 * (1e0 - r2) / (1e0 - r1 * r1)"
_Q387_PHI2 = "(r2 - r1 * r1) / (1e0 - r1 * r1)"


@register(
    "q387_yule_walker_ar2",
    oracle=f"""
    WITH daily AS ({_REG_DAILY}
    ), led AS (
        SELECT x, y, LEAD(y, 1) OVER (ORDER BY x) AS y1,
               LEAD(y, 2) OVER (ORDER BY x) AS y2
        FROM daily
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y * y1 END)
                    AS BIGINT) AS sxy1,
               CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT) AS sh1,
               CAST(SUM(y1) AS BIGINT) AS st1,
               CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y * y2 END)
                    AS BIGINT) AS sxy2,
               CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT) AS sh2,
               CAST(SUM(y2) AS BIGINT) AS st2
        FROM led
    ), rs AS (
        SELECT n, {_Q387_R[1]} AS r1, {_Q387_R[2]} AS r2,
               CAST(n * syy - sy * sy AS DOUBLE)
                   / CAST(n * n AS DOUBLE) AS c0
        FROM agg
    ), fit AS (
        SELECT *, {_Q387_PHI1} AS phi1, {_Q387_PHI2} AS phi2 FROM rs
    )
    SELECT n AS n_days, c0 AS variance, r1 AS acf1, r2 AS acf2, phi1, phi2,
           c0 * (1e0 - (phi1 * r1 + phi2 * r2)) AS noise_variance,
           phi2 + phi1 < 1e0 AND phi2 - phi1 < 1e0 AND abs(phi2) < 1e0
               AS stationary
    FROM fit
    """,
    survey_ref="extension: AR(2) fit by Yule-Walker — closed-form "
    "from the lag-1/2 autocorrelations (q364's exact n²-scaled "
    "BIGINT autocovariance trick), innovation variance "
    "σ² = c0(1 − φ1r1 − φ2r2), and the stationarity-triangle check; "
    "the generative counterpart of q364's diagnostics and the "
    "model behind q372's residual-AR(1) estimate",
)
def q387_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fits y_t = φ1·y_{t−1} + φ2·y_{t−2} + ε to the daily order
    series: one pass builds the two lead columns, one aggregate the
    exact moment sums, and the Yule-Walker solve is two double
    fragments shared verbatim by both engines. Consecutive OBSERVED
    days define the lags (q364's convention).

    Scale: one map-side-combinable day aggregate + a 2-lead window
    over distinct days; constant-size algebra after."""
    daily = _reg_daily_spark(spark, sf_dir)
    wd = Window.orderBy("x")
    led = daily.select(
        "x",
        "y",
        F.lead("y", 1).over(wd).alias("y1"),
        F.lead("y", 2).over(wd).alias("y2"),
    )
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    ]
    for k in (1, 2):
        yk = F.col(f"y{k}")
        aggs += [
            F.sum(F.when(yk.isNotNull(), F.col("y") * yk))
            .cast("long")
            .alias(f"sxy{k}"),
            F.sum(F.when(yk.isNotNull(), F.col("y")))
            .cast("long")
            .alias(f"sh{k}"),
            F.sum(yk).cast("long").alias(f"st{k}"),
        ]
    agg = led.agg(*aggs)
    rs = agg.select(
        "n",
        F.expr(_Q387_R[1]).alias("r1"),
        F.expr(_Q387_R[2]).alias("r2"),
        F.expr(
            "CAST(n * syy - sy * sy AS DOUBLE) / CAST(n * n AS DOUBLE)"
        ).alias("c0"),
    )
    fit = rs.withColumn("phi1", F.expr(_Q387_PHI1)).withColumn(
        "phi2", F.expr(_Q387_PHI2)
    )
    return fit.select(
        F.col("n").alias("n_days"),
        F.col("c0").alias("variance"),
        F.col("r1").alias("acf1"),
        F.col("r2").alias("acf2"),
        "phi1",
        "phi2",
        F.expr("c0 * (1e0 - (phi1 * r1 + phi2 * r2))").alias(
            "noise_variance"
        ),
        F.expr(
            "phi2 + phi1 < 1e0 AND phi2 - phi1 < 1e0 AND abs(phi2) < 1e0"
        ).alias("stationary"),
    )


@register(
    "q388_clustering_coefficient",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1
    ), wed AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d) AS BIGINT) // 2 AS n_edges,
               CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        FROM deg
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges = 0 THEN 0e0
                ELSE 3e0 * CAST(n_triangles AS DOUBLE)
                     / CAST(n_wedges AS DOUBLE) END AS global_cc
    FROM wed CROSS JOIN tri
    """,
    survey_ref="extension: global clustering coefficient (graph "
    "transitivity) — 3·triangles/wedges on the co-purchase graph, "
    "the normalization q155's raw triangle count lacks: wedge mass "
    "comes from the degree distribution (Σd(d−1)/2, exact BIGINT), "
    "triangles from q155's oriented two-join count; the triadic "
    "closure summary beside q294's modularity and q270's "
    "assortativity",
)
def q388_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity of the co-purchase graph: what fraction of open
    wedges close into triangles? Degrees from the oriented edge list
    doubled back to undirected; wedge and triangle masses are exact
    integers, the ratio one double division.

    Scale: q155's wedge-join discipline for triangles; the degree
    aggregate is one shuffle of the edge list — hub-degree caps
    (q154) bound the wedge-join skew."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.alias("a")
    bb = li.alias("b")
    e = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    # integer division BEFORE the sum on both engines: d*(d-1) is
    # always even, so `div 2` is exact and the wedge mass stays a
    # BIGINT sum — a double-precision SUM would silently lose
    # exactness past 2^53 total wedge mass (r05 advisory fix)
    wed = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.expr("SUM(d) div 2").cast("long").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges"),
    )
    return wed.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CASE WHEN n_wedges = 0 THEN 0e0"
            " ELSE 3e0 * CAST(n_triangles AS DOUBLE)"
            " / CAST(n_wedges AS DOUBLE) END"
        ).alias("global_cc"),
    )


# Holt-Winters additive state machine: α=0.2, β=0.1, γ=0.3 over the
# weekly (period-7) phase. The one-step error is scored BEFORE the
# update (out-of-sample at every step). No SQL lambda lets exist, so
# lnew is textually expanded everywhere it appears — recomputing the
# identical expression yields the identical double.
#
# The state is a LIST of 15 doubles, NOT a struct: DuckDB evaluates
# struct_pack fields in a list_reduce lambda SEQUENTIALLY and mutates
# the accumulator in place, so a field assigned early (l) corrupts
# every later field that reads acc.l — the second confirmed instance
# of the q363 struct-accumulator bug class (caught by the q389 replay
# test; list_value accumulators evaluate correctly). Layout
# (0-indexed): [tx, rr, yy, fl, l, b, s0..s6, se, lx]; rr is stored
# as a double (the list is homogeneous) and compared via CAST.
def _hw_sr_sql(r: str, a: str) -> str:
    whens = " ".join(
        f"WHEN {j} THEN {a}[{6 + j + 1}]" for j in range(6)
    )
    return f"(CASE CAST({r} AS BIGINT) {whens} ELSE {a}[13] END)"


def _hw_lambda_sql() -> str:
    sr = _hw_sr_sql("e[2]", "acc")
    lnew = f"(2e-1 * (e[3] - {sr}) + 8e-1 * (acc[5] + acc[6]))"
    err = f"(e[3] - (acc[5] + acc[6] + {sr}))"
    supd = ", ".join(
        f"CASE WHEN CAST(e[2] AS BIGINT) = {j}"
        f" THEN 3e-1 * (e[3] - {lnew}) + 7e-1 * acc[{6 + j + 1}]"
        f" ELSE acc[{6 + j + 1}] END"
        for j in range(7)
    )
    first = (
        "list_value(e[1], e[2], e[3], 1e0, e[3], 0e0, "
        + ", ".join(["0e0"] * 7)
        + ", 0e0, e[1])"
    )
    rest = (
        f"list_value(e[1], e[2], e[3], 1e0, {lnew},"
        f" 1e-1 * ({lnew} - acc[5]) + 9e-1 * acc[6], {supd},"
        f" acc[14] + {err} * {err}, e[1])"
    )
    return f"(acc, e) -> CASE WHEN acc[4] < 0e0 THEN {first} ELSE {rest} END"


def _q389_oracle() -> str:
    seed = (
        "list_value(0e0, 0e0, 0e0, -1e0, "
        + ", ".join(["0e0"] * 10)
        + ", 0e0)"
    )
    elem = (
        "list_value(CAST(x AS DOUBLE), CAST(x % 7 AS DOUBLE),"
        " CAST(y AS DOUBLE), "
        + ", ".join(["0e0"] * 12)
        + ")"
    )
    fc = _hw_sr_sql("(CAST(st[15] AS BIGINT) + 1) % 7", "st")
    return f"""
    WITH daily AS ({_REG_DAILY}
    ), folded AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               list_reduce(list_prepend({seed},
                   list({elem} ORDER BY x)),
                   {_hw_lambda_sql()}) AS st
        FROM daily
    )
    SELECT n_days, st[5] AS level, st[6] AS trend,
           {", ".join(f"st[{6 + j + 1}] AS s{j}" for j in range(7))},
           st[14] AS sse_1step,
           sqrt(st[14] / CAST(n_days - 1 AS DOUBLE)) AS rmse_1step,
           st[5] + st[6] + {fc} AS forecast_next
    FROM folded
    """


@register(
    "q389_holt_winters",
    headline=True,  # new plan family: sequential array-state fold
    oracle=_q389_oracle(),
    survey_ref="extension: Holt-Winters additive triple exponential "
    "smoothing (α=.2, β=.1, γ=.3, period 7) over the daily order "
    "series — level+trend+7 seasonal states fold sequentially in day "
    "order through ONE 15-slot list accumulator (NOT a struct: "
    "DuckDB mutates struct_pack accumulators field-by-field mid-"
    "lambda — the second confirmed q363-class instance, caught by "
    "this query's replay test); one-step errors are scored pre-update, "
    "giving an honest in-sample-sequential RMSE; completes the "
    "forecasting ladder q212 (regression) → q238 (Holt) → q350 "
    "(Croston) → q282/q351 (seasonal decomposition)",
)
def q389_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple exponential smoothing with weekly seasonality. The
    recurrence is inherently sequential, so the day-grain series
    folds through a 15-slot double-array state (tx, rr, yy, init
    flag, level, trend, s0..s6, running squared error, last day) —
    an ARRAY, not a struct, because DuckDB's list_reduce mutates
    struct accumulators field-by-field so later fields read already-
    updated values (q363's bug class; this query's replay test
    caught it). Both engines execute the identical update text —
    lnew is expanded wherever referenced because SQL lambdas have no
    lets, and recomputation is bit-stable. Output: final state,
    sequential one-step RMSE, and the next-day forecast
    l + b + s_{(t+1) mod 7}.

    Scale: one map-side-combinable aggregate to day grain; the fold
    is a single ~2.4k-element array on one executor — bounded by the
    calendar, not the data (a decade is 3.7k steps)."""
    daily = _reg_daily_spark(spark, sf_dir)
    # array<double> state, 0-indexed twin of the oracle's 1-indexed
    # list: [tx, rr, yy, fl, l, b, s0..s6, se, lx]
    seed = F.array(
        F.lit(0e0), F.lit(0e0), F.lit(0e0), F.lit(-1e0),
        *[F.lit(0e0) for _ in range(11)],
    )
    elems = F.array_sort(
        F.collect_list(
            F.array(
                F.col("x").cast("double"),
                F.pmod(F.col("x"), F.lit(7)).cast("double"),
                F.col("y").cast("double"),
                *[F.lit(0e0) for _ in range(12)],
            )
        )
    )

    def _sr(acc, r):
        c = F.when(r == 0, acc[6])
        for j in range(1, 7):
            c = c.when(r == j, acc[6 + j])
        return c.otherwise(acc[12])

    def step(acc, e):
        rr = e[1].cast("long")
        sr = _sr(acc, rr)
        lnew = F.lit(2e-1) * (e[2] - sr) + F.lit(8e-1) * (acc[4] + acc[5])
        err = e[2] - (acc[4] + acc[5] + sr)
        first = F.array(
            e[0], e[1], e[2], F.lit(1e0), e[2], F.lit(0e0),
            *[F.lit(0e0) for _ in range(7)],
            F.lit(0e0), e[0],
        )
        rest = F.array(
            e[0], e[1], e[2], F.lit(1e0), lnew,
            F.lit(1e-1) * (lnew - acc[4]) + F.lit(9e-1) * acc[5],
            *[
                F.when(
                    rr == j,
                    F.lit(3e-1) * (e[2] - lnew) + F.lit(7e-1) * acc[6 + j],
                ).otherwise(acc[6 + j])
                for j in range(7)
            ],
            acc[13] + err * err,
            e[0],
        )
        return F.when(acc[3] < 0e0, first).otherwise(rest)

    folded = daily.groupBy().agg(
        F.count("*").cast("long").alias("n_days"),
        F.aggregate(elems, seed, step).alias("st"),
    )
    nxt = F.pmod(F.col("st")[14].cast("long") + 1, F.lit(7))
    fcase = F.when(nxt == 0, F.col("st")[6])
    for j in range(1, 7):
        fcase = fcase.when(nxt == j, F.col("st")[6 + j])
    fcase = fcase.otherwise(F.col("st")[12])
    return folded.select(
        "n_days",
        F.col("st")[4].alias("level"),
        F.col("st")[5].alias("trend"),
        *[F.col("st")[6 + j].alias(f"s{j}") for j in range(7)],
        F.col("st")[13].alias("sse_1step"),
        F.sqrt(
            F.col("st")[13] / (F.col("n_days") - 1).cast("double")
        ).alias("rmse_1step"),
        (F.col("st")[4] + F.col("st")[5] + fcase).alias("forecast_next"),
    )


# Weighted child entropy in nats from exact counts, pln-backed; the
# k∈{0,n} degenerate ends contribute exactly 0.
def _q390_hterm(k: str, n: str, ln: str) -> str:
    return (
        f"CASE WHEN {k} = 0 OR {k} = {n} THEN 0e0"
        f" ELSE CAST({k} AS DOUBLE) / CAST({n} AS DOUBLE) * {ln} END"
    )


@register(
    "q390_stump_info_gain",
    oracle=f"""
    WITH feat AS (
        SELECT c.c_custkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS bal,
               MAX(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS tgt
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ), lv AS (
        SELECT bal, CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(tgt) AS BIGINT) AS k_v
        FROM feat GROUP BY 1
    ), cum AS (
        SELECT bal,
               CAST(SUM(n_v) OVER (ORDER BY bal) AS BIGINT) AS nl,
               CAST(SUM(k_v) OVER (ORDER BY bal) AS BIGINT) AS kl
        FROM lv
    ), tot AS (
        SELECT CAST(SUM(n_v) AS BIGINT) AS n, CAST(SUM(k_v) AS BIGINT) AS k
        FROM lv
    ), cand AS (
        SELECT c.bal, c.nl, c.kl, t.n, t.k, t.n - c.nl AS nr,
               t.k - c.kl AS kr
        FROM cum c CROSS JOIN tot t
        WHERE c.nl < t.n
    ), {_pln_ctes("cand", "nl", "greatest(kl, 1)", "ln_l1", "pa")},
    {_pln_ctes("pa", "nl", "greatest(nl - kl, 1)", "ln_l0", "pb")},
    {_pln_ctes("pb", "nr", "greatest(kr, 1)", "ln_r1", "pc")},
    {_pln_ctes("pc", "nr", "greatest(nr - kr, 1)", "ln_r0", "pd")},
    {_pln_ctes("pd", "n", "greatest(k, 1)", "ln_p1", "pe")},
    {_pln_ctes("pe", "n", "greatest(n - k, 1)", "ln_p0", "pf")},
    scored AS (
        SELECT bal, nl, nr, kl, kr,
               {_q390_hterm("k", "n", "ln_p1")}
                   + {_q390_hterm("(n - k)", "n", "ln_p0")} AS h_parent,
               CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)
                   * ({_q390_hterm("kl", "nl", "ln_l1")}
                      + {_q390_hterm("(nl - kl)", "nl", "ln_l0")})
                 + CAST(nr AS DOUBLE) / CAST(n AS DOUBLE)
                   * ({_q390_hterm("kr", "nr", "ln_r1")}
                      + {_q390_hterm("(nr - kr)", "nr", "ln_r0")})
                   AS h_children
        FROM pf
    ), ranked AS (
        SELECT bal, nl, nr, kl, kr, h_parent,
               h_parent - h_children AS info_gain,
               ROW_NUMBER() OVER (ORDER BY h_parent - h_children DESC, bal)
                   AS rk
        FROM scored
    )
    SELECT CAST(rk AS BIGINT) AS rk, bal AS threshold_cents,
           nl AS n_left, nr AS n_right, kl AS k_left, kr AS k_right,
           h_parent, info_gain
    FROM ranked WHERE rk <= 5
    """,
    survey_ref="extension: decision-stump split search — the best "
    "account-balance threshold for predicting has-urgent-order by exact "
    "information gain: candidate splits are a prefix scan over "
    "distinct balance values, each split's entropies come from SIX "
    "portable-ln stages over exact integer class counts (degenerate "
    "ends contribute exactly 0), top-5 thresholds by gain; the "
    "supervised counterpart of q136's unsupervised equi-frequency "
    "binning and the 1-node core of every tree learner",
)
def q390_stump_info_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scans every distinct balance as a ≤-threshold for the
    has-urgent-order target and scores the split by H(parent) − Σ(n_child/n)·H(child) in nats. The prefix
    sums make the scan one window pass; all six logs are portable-ln
    on exact BIGINTs with GREATEST guards (the CASE zeroes those
    terms, so the guard value never leaks).

    Scale: distinct-value grain after one map-side aggregate; the
    pln stages are per-row expression work (no shuffle); the argmin
    is a rank, not a sort of raw customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    feat = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", (_dec("c_acctbal") * 100).cast("long").alias("bal"))
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("tgt")
        )
    )
    lv = feat.groupBy("bal").agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum("tgt").cast("long").alias("k_v"),
    )
    wb = Window.orderBy("bal").rowsBetween(Window.unboundedPreceding, 0)
    cum = lv.select(
        "bal",
        F.sum("n_v").over(wb).cast("long").alias("nl"),
        F.sum("k_v").over(wb).cast("long").alias("kl"),
    )
    tot = lv.agg(
        F.sum("n_v").cast("long").alias("n"),
        F.sum("k_v").cast("long").alias("k"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
        .withColumn("nr", F.col("n") - F.col("nl"))
        .withColumn("kr", F.col("k") - F.col("kl"))
    )
    # _pln_stage takes column NAMES; the guards are staged first (the
    # oracle inlines the same greatest() expressions — equal values)
    cand = (
        cand.withColumn("gl1", F.expr("greatest(kl, 1)"))
        .withColumn("gl0", F.expr("greatest(nl - kl, 1)"))
        .withColumn("gr1", F.expr("greatest(kr, 1)"))
        .withColumn("gr0", F.expr("greatest(nr - kr, 1)"))
        .withColumn("gp1", F.expr("greatest(k, 1)"))
        .withColumn("gp0", F.expr("greatest(n - k, 1)"))
    )
    st = _pln_stage(cand, "nl", "gl1", "ln_l1", "pa")
    st = _pln_stage(st, "nl", "gl0", "ln_l0", "pb")
    st = _pln_stage(st, "nr", "gr1", "ln_r1", "pc")
    st = _pln_stage(st, "nr", "gr0", "ln_r0", "pd")
    st = _pln_stage(st, "n", "gp1", "ln_p1", "pe")
    st = _pln_stage(st, "n", "gp0", "ln_p0", "pf")
    scored = st.select(
        "bal",
        "nl",
        "nr",
        "kl",
        "kr",
        F.expr(
            f"{_q390_hterm('k', 'n', 'ln_p1')}"
            f" + {_q390_hterm('(n - k)', 'n', 'ln_p0')}"
        ).alias("h_parent"),
        F.expr(
            f"CAST(nl AS DOUBLE) / CAST(n AS DOUBLE)"
            f" * ({_q390_hterm('kl', 'nl', 'ln_l1')}"
            f" + {_q390_hterm('(nl - kl)', 'nl', 'ln_l0')})"
            f" + CAST(nr AS DOUBLE) / CAST(n AS DOUBLE)"
            f" * ({_q390_hterm('kr', 'nr', 'ln_r1')}"
            f" + {_q390_hterm('(nr - kr)', 'nr', 'ln_r0')})"
        ).alias("h_children"),
    )
    ranked = scored.select(
        "bal",
        "nl",
        "nr",
        "kl",
        "kr",
        "h_parent",
        (F.col("h_parent") - F.col("h_children")).alias("info_gain"),
    ).withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.col("info_gain").desc(), "bal"))
        .cast("long"),
    )
    return ranked.filter(F.col("rk") <= 5).select(
        "rk",
        F.col("bal").alias("threshold_cents"),
        F.col("nl").alias("n_left"),
        F.col("nr").alias("n_right"),
        F.col("kl").alias("k_left"),
        F.col("kr").alias("k_right"),
        "h_parent",
        "info_gain",
    )


# ---------------------------------------------------------------------------
# TPC-H partsupp family (r05 verdict item 5). The driver ships no
# partsupp fixture, so the table is SYNTHESIZED deterministically as a
# pure integer function of the part x supplier key spaces — identical
# rows on both engines with zero new parquet (the testdata directory is
# read-only). Reference parity: the supplier-side enrichment joins the
# reference runs per ticker table (stock_data_pipeline/ticker.py:23-31)
# are the same shape as TPC-H's partsupp joins (Q11/Q16/Q20), which is
# why these three shapes close the last "missing" SURVEY item.
#
# Key formula: 4 replicas per part; ps_suppkey = (p + i*(S div 4) +
# p div S) mod S. The fixed S div 4 stride makes the four suppliers of
# a part provably distinct for every S >= 4 (k*(S div 4) mod S != 0 for
# k=1..3), unlike dbgen's p-dependent stride which degenerates for
# small S. qty/cost use the portable affine hashes; domain bound: the
# p*2654435761 product stays under int64 through sf~150 part keys
# (SCALE.md §11 — beyond that the xxhash64 twin pattern applies).

_PARTSUPP_CTE = """
    __sc AS (SELECT COUNT(*) AS s FROM supplier),
    partsupp AS (
        SELECT p_partkey AS ps_partkey,
               (p_partkey + i * (s // 4) + p_partkey // s) % s AS ps_suppkey,
               1 + (p_partkey * 40503 + i * 2654435761) % 9999 AS ps_availqty,
               100 + (p_partkey * 2654435761 + i * 40503) % 99901
                   AS ps_supplycost_cents
        FROM part, __sc, (SELECT unnest(range(4)) AS i)
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp synthesis (see the block comment above —
    the DuckDB oracle CTE _PARTSUPP_CTE is the same arithmetic). The
    supplier count arrives as a broadcast one-row aggregate, the 4-row
    replica table as a broadcast range: partsupp is a narrow map over
    the part table, never a shuffle."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    sc = load_table(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("__s"))
    reps = spark.range(4).select(F.col("id").alias("__i"))
    return (
        part.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(sc))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.pmod(
                F.col("p_partkey")
                + F.col("__i") * F.expr("__s div 4")
                + F.expr("p_partkey div __s"),
                F.col("__s"),
            )
            .cast("long")
            .alias("ps_suppkey"),
            (1 + F.pmod(F.col("p_partkey") * 40503 + F.col("__i") * 2654435761, F.lit(9999)))
            .cast("long")
            .alias("ps_availqty"),
            (
                100
                + F.pmod(F.col("p_partkey") * 2654435761 + F.col("__i") * 40503, F.lit(99901))
            )
            .cast("long")
            .alias("ps_supplycost_cents"),
        )
    )


@register(
    "q391_tpch_q11_important_stock",
    headline=True,
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    nsupp AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
    ),
    v AS (
        SELECT ps_partkey,
               SUM(ps_supplycost_cents * ps_availqty) AS value_cents
        FROM partsupp JOIN nsupp ON ps_suppkey = s_suppkey
        GROUP BY 1
    ),
    t AS (SELECT SUM(value_cents) AS total_cents FROM v)
    SELECT ps_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS value_dollars
    FROM v, t
    WHERE value_cents * 2000 > total_cents
    """,
    survey_ref="TPC-H Q11 shape over the synthesized partsupp (r05 "
    "verdict item 5): per-part inventory value held by one nation's "
    "suppliers, kept where it exceeds 1/2000 of that nation's total — "
    "exact integer cents until the final display division",
)
def q391_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): which parts concentrate a nation's
    inventory value? The value sum is exact BIGINT cents*qty; the
    1/2000-of-total threshold compares integers (value*2000 > total —
    the Spark side stays under int64 because per-part value is bounded
    by 4 replicas x 1e9 cents).

    Scale: nation->supplier is a broadcast dim chain; partsupp is a
    narrow map over part (no shuffle to build); the only data-sized
    exchange is the per-part aggregate, and the grand total is a
    broadcast one-row reduction of the already-aggregated values."""
    ps = _partsupp(spark, sf_dir)
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    v = (
        ps.join(F.broadcast(supp), ps["ps_suppkey"] == supp["s_suppkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_cents")
        )
    )
    t = v.agg(F.sum("value_cents").cast("long").alias("total_cents"))
    return (
        v.crossJoin(F.broadcast(t))
        .filter(F.col("value_cents") * 2000 > F.col("total_cents"))
        .select(
            "ps_partkey",
            (F.col("value_cents").cast("double") / 100.0).alias("value_dollars"),
        )
    )


@register(
    "q392_tpch_q16_supplier_counts",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    ok_supp AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0),
    px AS (
        SELECT p_partkey, p_brand, p_type, p_size FROM part
        WHERE p_brand <> 'Brand#17' AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    JOIN px ON ps_partkey = p_partkey
    JOIN ok_supp ON ps_suppkey = s_suppkey
    GROUP BY 1, 2, 3
    """,
    survey_ref="TPC-H Q16 shape over the synthesized partsupp: distinct "
    "supplier census per (brand, type, size) with brand/type/size "
    "exclusions and a distressed-supplier (negative acctbal) filter "
    "standing in for Q16's complaint exclusion (no comment column in "
    "the fixture)",
)
def q392_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many qualified
    suppliers stock each surviving (brand, type, size) bucket. The
    complaint exclusion becomes s_acctbal >= 0 (the fixture carries no
    comment text); everything else is the classic shape.

    Scale: part and supplier filters are broadcast dims; the distinct
    count shuffles once on the (brand, type, size) grain with
    partial_count map-side."""
    ps = _partsupp(spark, sf_dir)
    oks = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    px = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#17")
            & (~F.col("p_type").startswith("PROMO"))
            & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(F.broadcast(px), ps["ps_partkey"] == px["p_partkey"])
        .join(F.broadcast(oks), ps["ps_suppkey"] == oks["s_suppkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q393_tpch_q20_promotion_stock",
    oracle=f"""
    WITH {_PARTSUPP_CTE},
    small_parts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small %'),
    shipped AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT DISTINCT ps_suppkey
        FROM partsupp
        JOIN small_parts ON ps_partkey = p_partkey
        JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        WHERE CAST(ps_availqty AS DOUBLE) * 2.0 > qty
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN cand ON s_suppkey = ps_suppkey
    """,
    survey_ref="TPC-H Q20 shape over the synthesized partsupp: "
    "suppliers of 'small' parts whose stock exceeds half the quantity "
    "they shipped in 1995 (pairs with no 1995 shipments drop out, the "
    "standard correlated-subquery NULL semantics, expressed as the "
    "equi-join both engines run)",
)
def q393_tpch_q20_promotion_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): suppliers holding excess
    stock of small parts relative to what they actually shipped in
    1995. availqty doubling stays exact (integers in doubles);
    l_quantity sums are integral doubles on both engines.

    Scale: small_parts broadcasts into both the partsupp filter and
    nothing else; the one data-sized exchange is the per-(part,
    supplier) shipped aggregate, which then equi-joins the filtered
    partsupp on the composite key — no correlated per-row subquery
    ever executes."""
    ps = _partsupp(spark, sf_dir)
    small = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small %"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    shipped = (
        li.filter(
            (F.col("l_shipdate").cast("date") >= F.to_date(F.lit("1995-01-01")))
            & (F.col("l_shipdate").cast("date") < F.to_date(F.lit("1996-01-01")))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    cand = (
        ps.join(F.broadcast(small), ps["ps_partkey"] == small["p_partkey"])
        .join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .filter(F.col("ps_availqty").cast("double") * 2.0 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        F.broadcast(cand), supp["s_suppkey"] == cand["ps_suppkey"]
    ).select("s_suppkey", "s_name")


@register(
    "q395_ann_ivf_bucketed",
    oracle=_ivf_oracle(nlist=16, nprobe=4, k=8, query_pred="vec_id % 7 = 0"),
    survey_ref="extension: corpus-scale IVF-flat ANN (r07 VERDICT item "
    "3) — the salted/bucketed probe-join shape that replaces "
    "ivf_flat_topk's mandatory query-side broadcast when the query "
    "batch is data-sized; row-identical semantics, so it shares the "
    "IVF value oracle (the salt never changes the candidate set)",
)
def q395_ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-k with a CORPUS-SCALE query batch (~1/7 of the
    corpus — far past any broadcastability assumption): exercises
    ``ivf_flat_topk_bucketed``, whose probe join salts the
    nlist-valued list id and shuffle-joins both sides behind explicit
    REPARTITION_BY_NUM exchanges — no broadcast anywhere on the probe
    path, no corpus shuffle keyed on bare list_id (nlist distinct
    values = nlist reducers = built-in straggler), AQE-coalesce-proof
    ahead of the rerank fan-out. Plan shape pinned by
    tests/test_fanout_guard.py; equality with ivf_flat_topk pinned by
    tests/test_llm.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    return similarity.ivf_flat_topk_bucketed(
        emb, queries, k=8, nlist=16, nprobe=4
    )


def _q396_oracle() -> str:
    # identical rows to q198 at equal params (the salt/bucketing never
    # changes the candidate set — see ivf_pq_topk_bucketed's docstring),
    # so the bucketed twin shares the generated IVF-PQ value oracle
    from ._p4_rankings_linkage import _ivf_pq_oracle

    return _ivf_pq_oracle(
        n_lists=8, nprobe=2, m=16, sub_dim=4, k=256, rounds=2, bits=10,
        query_mod=97, topk=10, train_mod=16,
    )


@register(
    "q396_ivfpq_bucketed",
    oracle=_q396_oracle(),
    survey_ref="extension: corpus-scale IVF-PQ (r08 VERDICT item 3) — "
    "the salted/bucketed shape ported from q395 to the PQ rerank path: "
    "probe join salted on (list_id, __salt), per-query ADC LUTs moved "
    "through a query_id shuffle join, NOTHING corpus-proportional "
    "broadcast; row-identical to q198, so it shares the generated "
    "IVF-PQ value oracle",
)
def q396_ivfpq_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k with the corpus-scale join shapes: exercises
    ``ivf_pq_topk_bucketed`` at q198's exact params — the driver oracle
    certifies the bucketed twin computes bit-identical (query, vec,
    adc_dist, rank) rows while its static plan broadcasts nothing
    corpus-proportional (plan pins in tests/test_fanout_guard.py,
    equality pin in tests/test_llm.py)."""
    from stock_data_pipeline_spark.llm.clustering import ivf_pq_topk_bucketed

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk_bucketed(
        emb, "vec_id", "embedding", query_mod=97,
        n_lists=8, nprobe=2, m=16, sub_dim=4, k=256, rounds=2,
        quant_bits=10, topk=10, train_mod=16,
    )


def _q397_oracle() -> str:
    # same generator as q54's full value oracle (portable polynomial
    # shingle hash + integer band folds, every intermediate ANSI-SQL
    # exact) with the star tail: MIN(doc_id) OVER the band bucket in
    # place of the bucket self-join
    from ._p1_parity_corpus import _minhash_oracle

    return _minhash_oracle(n=3, num_perm=64, bands=16, star=True)


@register(
    "q397_minhash_lsh_star",
    oracle=_q397_oracle(),
    headline=True,  # the skew-robust dedup shape must stay perf-visible
    # next to its all-pairs twin q54
    survey_ref="extension: MinHash+LSH candidates as bucket-star edges "
    "(r09, SCALE.md §17) — the skewed-fixture byte curve measured the "
    "all-pairs candidate set at beta ≈ 1.35 because a hot bucket's "
    "clique is quadratic IN THE DATA; the star reduction (every member "
    "× bucket MIN — the doc–bucket bipartite collapse) bounds "
    "candidates at docs × bands under any key distribution while "
    "spanning the same connected components, i.e. the same dup "
    "clusters (equivalence pinned in tests/test_llm.py)",
)
def q397_minhash_lsh_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-linear MinHash-LSH: q54's exact banding (n=3, 64
    perms, 16 bands, portable hash — full value oracle) through
    ``dedup.minhash_lsh_star_edges``. One window over the banding's
    own band-key exchange replaces the bucket self-join entirely; the
    hot-sentence fixture that drives q54's bytes quadratic collapses
    to one star per band here (measured beta ≈ 1 on the skewed byte
    curve, SHUFFLE_SKEW_r09.json)."""
    from stock_data_pipeline_spark.llm import dedup

    doc = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_star_edges(
        doc, "doc_id", "text", n=3, num_perm=64, bands=16, portable_hash=True
    )
