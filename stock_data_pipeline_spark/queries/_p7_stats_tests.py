"""Queries: statistical-test and drift queries (q333-q365).

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
    load_events,
    load_table,
    register,
)
from ._p4_rankings_linkage import _mix31_col, _mix31_sql
from ._p6_llm_eval import (
    _PLN_LN2,
    _Z_ALPHA_HALF,
    _fold_col,
    _fold_sql,
    _math,
    _pln_ctes,
    _pln_stage,
)




@register(
    "q333_anova_f",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS g, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS sxx
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS tsx,
               CAST(SUM(sxx) AS BIGINT) AS tsxx, CAST(COUNT(*) AS BIGINT) AS k
        FROM cells
    ), folded AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                        / CAST(n_g AS DOUBLE) ORDER BY g)),
                   (a, b) -> a + b) AS abetween
        FROM cells
    ), stats AS (
        SELECT t.n, t.k,
               f.abetween - CAST(t.tsx AS DOUBLE) * CAST(t.tsx AS DOUBLE)
                            / CAST(t.n AS DOUBLE) AS ssb,
               CAST(t.tsxx AS DOUBLE) - f.abetween AS ssw,
               CAST(t.tsxx AS DOUBLE) - CAST(t.tsx AS DOUBLE)
                   * CAST(t.tsx AS DOUBLE) / CAST(t.n AS DOUBLE) AS sst
        FROM folded f CROSS JOIN tot t
    )
    SELECT c.g AS returnflag, c.n_g, c.sx AS sum_qty,
           CAST(c.sx AS DOUBLE) / CAST(c.n_g AS DOUBLE) AS mean_qty,
           s.n AS n_total, s.k AS k_groups, s.ssb AS ss_between,
           s.ssw AS ss_within,
           (s.ssb / CAST(s.k - 1 AS DOUBLE))
               / (s.ssw / CAST(s.n - s.k AS DOUBLE)) AS f_stat,
           s.ssb / s.sst AS eta_squared
    FROM cells c CROSS JOIN stats s
    """,
    survey_ref="extension: one-way ANOVA F over the return-flag "
    "populations — the parametric complement of q316's Kruskal–Wallis "
    "on the same design; all sums of squares form from exact BIGINT "
    "moment sums (quantity is integral), the only cross-group double "
    "sum is the pinned-order fold",
)
def q333_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order quantity differ across the three
    return-flag populations? Per-group (n, Σx, Σx²) are exact BIGINTs
    (quantity ∈ 1..50 is integral); SS_between folds Σ (Σx_g)²/n_g in
    group order (the q178 pinned-fold discipline), SS_within/SS_total
    derive from the exact totals. (Σx)² is formed in DOUBLES — at 100 TB
    Σx ~ 2.5e13 and its square overflows int64, the q312-class fix.

    Scale: one map-side-combinable aggregate over lineitem, then
    G-row arithmetic. Zero extra shuffles beyond the groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    cells = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(q).cast("long").alias("sx"),
        F.sum(q * q).cast("long").alias("sxx"),
    ).cache()  # 3 rows; without it every branch re-scans lineitem
    tot = cells.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("sx").cast("long").alias("tsx"),
        F.sum("sxx").cast("long").alias("tsxx"),
        F.count("*").cast("long").alias("k"),
    )
    folded = cells.agg(
        _fold_col(
            ["g"],
            F.col("sx").cast("double")
            * F.col("sx").cast("double")
            / F.col("n_g").cast("double"),
        ).alias("abetween")
    )
    tsx_d = F.col("tsx").cast("double")
    n_d = F.col("n").cast("double")
    stats = folded.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        (F.col("abetween") - tsx_d * tsx_d / n_d).alias("ssb"),
        (F.col("tsxx").cast("double") - F.col("abetween")).alias("ssw"),
        (F.col("tsxx").cast("double") - tsx_d * tsx_d / n_d).alias("sst"),
    )
    return cells.crossJoin(F.broadcast(stats)).select(
        F.col("g").alias("returnflag"),
        "n_g",
        F.col("sx").alias("sum_qty"),
        (F.col("sx").cast("double") / F.col("n_g").cast("double")).alias(
            "mean_qty"
        ),
        F.col("n").alias("n_total"),
        F.col("k").alias("k_groups"),
        F.col("ssb").alias("ss_between"),
        F.col("ssw").alias("ss_within"),
        (
            (F.col("ssb") / (F.col("k") - 1).cast("double"))
            / (F.col("ssw") / (F.col("n") - F.col("k")).cast("double"))
        ).alias("f_stat"),
        (F.col("ssb") / F.col("sst")).alias("eta_squared"),
    )


@register(
    "q334_mutual_information",
    headline=True,
    oracle=f"""
    WITH j AS (
        SELECT c.c_mktsegment AS x, o.o_orderpriority AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells0 AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n_xy FROM j GROUP BY 1, 2
    ), mx AS (
        SELECT x, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM cells0 GROUP BY 1
    ), my AS (
        SELECT y, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM cells0 GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n_xy) AS BIGINT) AS nn FROM cells0
    ), cj AS (
        SELECT c.x, c.y, c.n_xy, m1.n_x, m2.n_y, t.nn
        FROM cells0 c JOIN mx m1 ON c.x = m1.x JOIN my m2 ON c.y = m2.y
        CROSS JOIN tot t
    ), {_pln_ctes("cj", "n_xy", "n_x", "lp_xy", "pa")},
    {_pln_ctes("pa", "n_y", "nn", "lp_y", "pb")},
    {_pln_ctes("pb", "n_x", "nn", "lp_x", "pc")},
    cl AS (
        SELECT x, y, n_xy, nn, lp_xy - lp_y AS pmi, lp_x, lp_y FROM pc
    ), agg AS (
        SELECT {_fold_sql("CAST(n_xy AS DOUBLE) / CAST(nn AS DOUBLE) * pmi", "x, y")}
                   AS mi_nats,
               -{_fold_sql("CAST(n_xy AS DOUBLE) / CAST(nn AS DOUBLE) * lp_x", "x, y")}
                   AS h_x,
               -{_fold_sql("CAST(n_xy AS DOUBLE) / CAST(nn AS DOUBLE) * lp_y", "x, y")}
                   AS h_y
        FROM cl
    )
    SELECT cl.x AS segment, cl.y AS priority, cl.n_xy, cl.pmi AS pmi_nats,
           a.mi_nats, a.h_x AS h_segment, a.h_y AS h_priority,
           a.mi_nats / sqrt(a.h_x * a.h_y) AS nmi
    FROM cl CROSS JOIN agg a
    """,
    survey_ref="extension: mutual information / NMI between two "
    "categorical columns — the feature-relevance measure chi²-style "
    "tests (q205/q327) can't give; first user of the portable-ln "
    "primitive (bit-identical atanh-series ln, no engine log() call)",
)
def q334_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between customer market segment and order
    priority, with per-cell PMI and normalized MI. Every probability is
    an exact BIGINT ratio; every ln goes through the portable-ln
    primitive (_pln_stage — see _pln_ctes for the construction proof);
    pmi = ln(n_xy/n_x) − ln(n_y/N) keeps both ln arguments ≤ max(count)
    so NO integer product ever forms (n_xy·N would overflow int64 at
    100 TB row counts). MI and the two marginal entropies fold over the
    SAME 25-cell relation in one aggregation (Σ_y n_xy = n_x), in
    pinned (x, y) order.

    Scale: one shuffle for the (x,y) cells; margins re-aggregate the
    cached 25-cell table; the fact join broadcasts the 5-row margins."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = o.join(F.broadcast(c), "o_custkey").select(
        F.col("c_mktsegment").alias("x"), F.col("o_orderpriority").alias("y")
    )
    # ≤25 rows; caching collapses the fact scan to ONE — margins,
    # total and the fold all re-derive from the cached cells
    cells = (
        j.groupBy("x", "y").agg(F.count("*").cast("long").alias("n_xy")).cache()
    )
    mx = cells.groupBy("x").agg(F.sum("n_xy").cast("long").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").cast("long").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").cast("long").alias("nn"))
    cj = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    cj = _pln_stage(cj, "n_xy", "n_x", "lp_xy", "pa")
    cj = _pln_stage(cj, "n_y", "nn", "lp_y", "pb")
    cj = _pln_stage(cj, "n_x", "nn", "lp_x", "pc")
    cl = cj.select(
        "x",
        "y",
        "n_xy",
        "nn",
        (F.col("lp_xy") - F.col("lp_y")).alias("pmi"),
        "lp_x",
        "lp_y",
    ).cache()  # 25 rows; the pln codegen compiles once, not per branch
    share = F.col("n_xy").cast("double") / F.col("nn").cast("double")
    # MI and BOTH entropies fold over the same 25-cell relation in one
    # aggregation pass: Σ_y n_xy = n_x makes Σ_cells (n_xy/N)·ln(n_x/N)
    # equal the marginal entropy sum, so no separate margin branches
    agg = cl.agg(
        _fold_col(["x", "y"], share * F.col("pmi")).alias("mi_nats"),
        (-_fold_col(["x", "y"], share * F.col("lp_x"))).alias("h_x"),
        (-_fold_col(["x", "y"], share * F.col("lp_y"))).alias("h_y"),
    )
    return cl.crossJoin(F.broadcast(agg)).select(
        F.col("x").alias("segment"),
        F.col("y").alias("priority"),
        "n_xy",
        F.col("pmi").alias("pmi_nats"),
        "mi_nats",
        F.col("h_x").alias("h_segment"),
        F.col("h_y").alias("h_priority"),
        (F.col("mi_nats") / F.sqrt(F.col("h_x") * F.col("h_y"))).alias("nmi"),
    )


@register(
    "q335_psi_drift",
    oracle=f"""
    WITH o AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END
                   AS is_ref
        FROM orders
    ), cnt AS (
        SELECT least(cents // 5000000, 9) AS bucket,
               CAST(SUM(is_ref) AS BIGINT) AS nr,
               CAST(SUM(1 - is_ref) AS BIGINT) AS nc
        FROM o GROUP BY 1
    ), dense AS (
        SELECT g.bucket, CAST(COALESCE(c.nr, 0) + 1 AS BIGINT) AS np,
               CAST(COALESCE(c.nc, 0) + 1 AS BIGINT) AS mp
        FROM generate_series(0, 9) AS g(bucket)
        LEFT JOIN cnt c ON g.bucket = c.bucket
    ), tot AS (
        SELECT CAST(SUM(np) AS BIGINT) AS np_tot, CAST(SUM(mp) AS BIGINT) AS mp_tot
        FROM dense
    ), dj AS (
        SELECT d.bucket, d.np, d.mp, t.np_tot, t.mp_tot
        FROM dense d CROSS JOIN tot t
    ), {_pln_ctes("dj", "np", "np_tot", "lpr", "pa")},
    {_pln_ctes("pa", "mp", "mp_tot", "lpc", "pb")},
    terms AS (
        SELECT bucket, np, mp,
               CAST(np AS DOUBLE) / CAST(np_tot AS DOUBLE) AS ref_share,
               CAST(mp AS DOUBLE) / CAST(mp_tot AS DOUBLE) AS cur_share,
               (CAST(np AS DOUBLE) / CAST(np_tot AS DOUBLE)
                - CAST(mp AS DOUBLE) / CAST(mp_tot AS DOUBLE)) * (lpr - lpc)
                   AS psi_term
        FROM pb
    ), psi AS (
        SELECT {_fold_sql("psi_term", "bucket")} AS psi_total FROM terms
    )
    SELECT t.bucket, CAST(t.np - 1 AS BIGINT) AS n_ref,
           CAST(t.mp - 1 AS BIGINT) AS n_cur, t.ref_share, t.cur_share,
           t.psi_term, p.psi_total
    FROM terms t CROSS JOIN psi p
    """,
    survey_ref="extension: population-stability-index drift between "
    "the pre-1999 and post-1999 order-value distributions — the "
    "standard ML-ops drift score alongside q205 (chi²), q245 (KS) and "
    "q275 (Wasserstein); add-one smoothing makes empty buckets "
    "well-defined; both lns are portable-ln",
)
def q335_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the reference (pre-1999) and current (1999+) order
    totals over ten fixed $50k buckets: Σ (p−q)·ln(p/q) with add-one
    smoothing, ln(p/q) = pln(n+1, N+10) − pln(m+1, M+10) so no integer
    cross-products form. The bucket list densifies from a literal
    range, so a period missing a bucket entirely still contributes.

    Scale: one 10-cell aggregate over orders (map-side combinable),
    then constant-size arithmetic; the fold is over 10 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        (_dec("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    cnt = (
        o.select(
            F.least(F.expr("cents div 5000000"), F.lit(9).cast("long")).alias(
                "bucket"
            ),
            "is_ref",
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").cast("long").alias("nr"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("nc"),
        )
        .cache()  # ≤10 rows; one orders scan feeds dense/tot/dj
    )
    dense = (
        spark.range(10)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(cnt), "bucket", "left")
        .select(
            "bucket",
            (F.coalesce(F.col("nr"), F.lit(0)) + 1).cast("long").alias("np"),
            (F.coalesce(F.col("nc"), F.lit(0)) + 1).cast("long").alias("mp"),
        )
    )
    tot = dense.agg(
        F.sum("np").cast("long").alias("np_tot"),
        F.sum("mp").cast("long").alias("mp_tot"),
    )
    dj = dense.crossJoin(F.broadcast(tot))
    dj = _pln_stage(dj, "np", "np_tot", "lpr", "pa")
    dj = _pln_stage(dj, "mp", "mp_tot", "lpc", "pb")
    ref_share = F.col("np").cast("double") / F.col("np_tot").cast("double")
    cur_share = F.col("mp").cast("double") / F.col("mp_tot").cast("double")
    terms = dj.select(
        "bucket",
        "np",
        "mp",
        ref_share.alias("ref_share"),
        cur_share.alias("cur_share"),
        ((ref_share - cur_share) * (F.col("lpr") - F.col("lpc"))).alias(
            "psi_term"
        ),
    ).cache()  # 10 rows; shared by the psi fold and the output
    psi = terms.agg(_fold_col(["bucket"], F.col("psi_term")).alias("psi_total"))
    return terms.crossJoin(F.broadcast(psi)).select(
        "bucket",
        (F.col("np") - 1).cast("long").alias("n_ref"),
        (F.col("mp") - 1).cast("long").alias("n_cur"),
        "ref_share",
        "cur_share",
        "psi_term",
        "psi_total",
    )


@register(
    "q336_t_closeness",
    oracle="""
    WITH cust AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment,
               (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000)
                   // 110000 AS bucket
        FROM customer
    ), cellcnt AS (
        SELECT nationkey, segment, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cust GROUP BY 1, 2, 3
    ), groups AS (
        SELECT nationkey, segment, CAST(SUM(cnt) AS BIGINT) AS n_g
        FROM cellcnt GROUP BY 1, 2
    ), ghist AS (
        SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS c_all FROM cellcnt GROUP BY 1
    ), gdense AS (
        SELECT g.bucket, CAST(COALESCE(h.c_all, 0) AS BIGINT) AS c_all
        FROM generate_series(0, 9) AS g(bucket)
        LEFT JOIN ghist h ON g.bucket = h.bucket
    ), gcum AS (
        SELECT bucket, CAST(SUM(c_all) OVER (ORDER BY bucket) AS BIGINT) AS cum_all
        FROM gdense
    ), tot AS (
        SELECT CAST(SUM(c_all) AS BIGINT) AS n FROM gdense
    ), dense AS (
        SELECT gr.nationkey, gr.segment, gr.n_g, gb.bucket,
               CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
        FROM groups gr CROSS JOIN generate_series(0, 9) AS gb(bucket)
        LEFT JOIN cellcnt c ON gr.nationkey = c.nationkey
             AND gr.segment = c.segment AND gb.bucket = c.bucket
    ), gcumg AS (
        SELECT nationkey, segment, n_g, bucket,
               CAST(SUM(cnt) OVER (PARTITION BY nationkey, segment
                    ORDER BY bucket) AS BIGINT) AS cum_g
        FROM dense
    ), emd AS (
        SELECT g.nationkey, g.segment, g.n_g,
               CAST(SUM(abs(g.cum_g * t.n - u.cum_all * g.n_g)) AS BIGINT)
                   AS emd_num
        FROM gcumg g JOIN gcum u ON g.bucket = u.bucket CROSS JOIN tot t
        WHERE g.bucket < 9
        GROUP BY 1, 2, 3
    )
    SELECT e.nationkey, e.segment, e.n_g, e.emd_num,
           CAST(e.emd_num AS DOUBLE)
               / (CAST(e.n_g AS DOUBLE) * CAST(t.n AS DOUBLE) * 9e0) AS t_emd,
           CAST(e.emd_num AS DOUBLE)
               / (CAST(e.n_g AS DOUBLE) * CAST(t.n AS DOUBLE) * 9e0) <= 2e-1
               AS t_close
    FROM emd e CROSS JOIN tot t
    """,
    survey_ref="extension: t-closeness — completes the anonymization "
    "triad with q236 (k-anonymity bounds group size) and q314 "
    "(l-diversity bounds categorical disclosure): for the ORDERED "
    "sensitive attribute (account balance) it bounds the earth-mover "
    "distance between each QI group's distribution and the global one; "
    "EMD numerators stay exact BIGINTs",
)
def q336_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness over the (nation, market segment) quasi-identifier:
    the sensitive attribute is account balance in ten fixed $1,100-wide
    buckets; for ordered attributes with unit ground distance, EMD =
    Σ_j |cumP_j − cumQ_j| / (B−1). Each |…| term is the exact integer
    |cum_g·N − cum_all·n_g| (≤ n_g·N ≈ 2e8 at sf0.1 — at 100 TB group
    counts this would move to the q312-class double formation), summed
    as BIGINT, with ONE double division at the end — no folds needed.

    Scale: customer-grain aggregates only; the densify cross-join is
    |QI|×10 rows; the global histogram broadcasts."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_mktsegment").alias("segment"),
        ((_dec("c_acctbal") * 100).cast("long") + 100000).alias("cents_off"),
    )
    cellcnt = (
        cust.select(
            "nationkey", "segment", F.expr("cents_off div 110000").alias("bucket")
        )
        .groupBy("nationkey", "segment", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
        .cache()  # ≤|QI|·10 rows; one customer scan feeds all branches
    )
    groups = cellcnt.groupBy("nationkey", "segment").agg(
        F.sum("cnt").cast("long").alias("n_g")
    )
    ghist = cellcnt.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("c_all"))
    gdense = (
        spark.range(10)
        .select(F.col("id").alias("bucket"))
        .join(F.broadcast(ghist), "bucket", "left")
        .select("bucket", F.coalesce(F.col("c_all"), F.lit(0)).cast("long").alias("c_all"))
    )
    wall = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    gcum = gdense.select(
        "bucket", F.sum("c_all").over(wall).cast("long").alias("cum_all")
    )
    tot = gdense.agg(F.sum("c_all").cast("long").alias("n"))
    dense = (
        groups.crossJoin(spark.range(10).select(F.col("id").alias("bucket")))
        .join(F.broadcast(cellcnt), ["nationkey", "segment", "bucket"], "left")
        .select(
            "nationkey",
            "segment",
            "n_g",
            "bucket",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
    )
    wg = (
        Window.partitionBy("nationkey", "segment")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    gcumg = dense.select(
        "nationkey",
        "segment",
        "n_g",
        "bucket",
        F.sum("cnt").over(wg).cast("long").alias("cum_g"),
    )
    emd = (
        gcumg.filter(F.col("bucket") < 9)
        .join(F.broadcast(gcum), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("nationkey", "segment", "n_g")
        .agg(
            F.sum(
                F.abs(F.col("cum_g") * F.col("n") - F.col("cum_all") * F.col("n_g"))
            )
            .cast("long")
            .alias("emd_num")
        )
    )
    t_emd = F.col("emd_num").cast("double") / (
        F.col("n_g").cast("double") * F.col("n").cast("double") * F.lit(9.0)
    )
    return emd.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        "segment",
        "n_g",
        "emd_num",
        t_emd.alias("t_emd"),
        (t_emd <= F.lit(0.2)).alias("t_close"),
    )


@register(
    "q337_average_precision",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment AS segment, c_custkey,
               CASE WHEN c_nationkey < 5 THEN 1 ELSE 0 END AS rel,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS r
        FROM customer
    ), tot AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM ranked GROUP BY 1
    ), pos AS (
        SELECT segment, r,
               CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY r)
                    AS BIGINT) AS k
        FROM ranked WHERE rel = 1
    ), ap0 AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_pos,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(k AS DOUBLE) / CAST(r AS DOUBLE) ORDER BY r)),
                   (a, b) -> a + b) AS ap_sum
        FROM pos GROUP BY 1
    ), ap AS (
        SELECT t.segment, t.n_total, CAST(COALESCE(a.n_pos, 0) AS BIGINT) AS n_pos,
               CASE WHEN COALESCE(a.n_pos, 0) = 0 THEN 0e0
                    ELSE a.ap_sum / CAST(a.n_pos AS DOUBLE) END AS avg_precision
        FROM tot t LEFT JOIN ap0 a ON t.segment = a.segment
    ), mp AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(avg_precision ORDER BY segment)), (a, b) -> a + b)
               / CAST(COUNT(*) AS DOUBLE) AS mean_ap
        FROM ap
    )
    SELECT a.segment, a.n_total, a.n_pos, a.avg_precision, m.mean_ap
    FROM ap a CROSS JOIN mp m
    """,
    survey_ref="extension: average precision / mean AP — the "
    "threshold-free PR-side ranking metric complementing q223 (exact "
    "ROC AUC) and q303 (NDCG): per segment, customers ranked by "
    "balance, relevance = low-nation membership; AP folds k/r over the "
    "positive ranks in rank order",
)
def q337_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision per market segment (rank by account balance
    descending, custkey tie-break; 'relevant' = nation < 5) plus the
    mean AP across segments. AP = (1/P)·Σ_hits precision@hit where
    precision@hit_k = k/r_k — each term one exact-operand division,
    folded in rank order; a segment with zero relevant rows yields AP
    0 by definition rather than NULL.

    Scale: one window per segment (rank), one per positives (hit
    index) — both single-shuffle on the segment key; the per-segment
    fold collects only the POSITIVE ranks."""
    cust = load_table(spark, sf_dir, "customer")
    wr = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    # the ranking window is the expensive shared stage — cache it so
    # the totals branch and the positives branch pay for it once
    ranked = cust.select(
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_nationkey") < 5).cast("int").alias("rel"),
        F.row_number().over(wr).cast("long").alias("r"),
    ).cache()
    tot = ranked.groupBy("segment").agg(F.count("*").cast("long").alias("n_total"))
    wp = Window.partitionBy("segment").orderBy("r")
    pos = ranked.filter(F.col("rel") == 1).select(
        "segment", "r", F.row_number().over(wp).cast("long").alias("k")
    )
    ap0 = pos.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_pos"),
        _fold_col(["r"], F.col("k").cast("double") / F.col("r").cast("double")).alias(
            "ap_sum"
        ),
    )
    ap = tot.join(ap0, "segment", "left").select(
        "segment",
        "n_total",
        F.coalesce(F.col("n_pos"), F.lit(0)).cast("long").alias("n_pos"),
        F.when(F.coalesce(F.col("n_pos"), F.lit(0)) == 0, F.lit(0.0))
        .otherwise(F.col("ap_sum") / F.col("n_pos").cast("double"))
        .alias("avg_precision"),
    ).cache()  # 5 rows; reused by the mean-AP fold and the output
    mp = ap.agg(
        (
            _fold_col(["segment"], F.col("avg_precision"))
            / F.count("*").cast("double")
        ).alias("mean_ap")
    )
    return ap.crossJoin(F.broadcast(mp)).select(
        "segment", "n_total", "n_pos", "avg_precision", "mean_ap"
    )


# ---------------------------------------------------------------------------
# Batch 32 (round 5): paired-model testing, distribution-shape audit,
# empirical-Bayes shrinkage, survival curves, AMS frequency-moment sketch
# ---------------------------------------------------------------------------


@register(
    "q338_mcnemar",
    oracle="""
    WITH scored AS (
        SELECT l_linestatus AS linestatus,
               CASE WHEN (l_quantity >= 25) = (l_returnflag = 'R')
                    THEN 1 ELSE 0 END AS a_ok,
               CASE WHEN (l_discount >= 0.05) = (l_returnflag = 'R')
                    THEN 1 ELSE 0 END AS b_ok
        FROM lineitem
    ), cells AS (
        SELECT linestatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a_ok) AS BIGINT) AS n_a_correct,
               CAST(SUM(b_ok) AS BIGINT) AS n_b_correct,
               CAST(SUM(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS only_a,
               CAST(SUM(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS only_b
        FROM scored GROUP BY 1
    )
    SELECT linestatus, n, n_a_correct, n_b_correct, only_a, only_b,
           CASE WHEN only_a + only_b > 0
                THEN CAST(only_a - only_b AS DOUBLE)
                     * CAST(only_a - only_b AS DOUBLE)
                     / CAST(only_a + only_b AS DOUBLE)
                ELSE 0e0 END AS mcnemar_chi2
    FROM cells
    """,
    survey_ref="extension: McNemar's test — the PAIRED-classifier "
    "comparison the unpaired tests (q141 A/B z, q205 chi²) get wrong "
    "when two models score the same examples: only the discordant "
    "counts carry information; (b−c)²/(b+c) ~ χ²₁ under H0",
)
def q338_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test per line status: two rule 'models' predict
    returns on the SAME line items (A: quantity ≥ 25, B: discount ≥
    0.05); the statistic uses only the discordant pairs — items exactly
    one model gets right. All counts are exact BIGINTs from one
    aggregate; (b−c)² forms in doubles (the q312-class at-scale fix).

    Scale: a single map-side-combinable aggregate over lineitem —
    adding a model is one more SUM column, never another scan."""
    li = load_table(spark, sf_dir, "lineitem")
    truth = F.col("l_returnflag") == "R"
    a_ok = ((F.col("l_quantity") >= 25) == truth).cast("int")
    b_ok = ((F.col("l_discount") >= 0.05) == truth).cast("int")
    cells = (
        li.select(
            F.col("l_linestatus").alias("linestatus"),
            a_ok.alias("a_ok"),
            b_ok.alias("b_ok"),
        )
        .groupBy("linestatus")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("a_ok").cast("long").alias("n_a_correct"),
            F.sum("b_ok").cast("long").alias("n_b_correct"),
            F.sum(((F.col("a_ok") == 1) & (F.col("b_ok") == 0)).cast("int"))
            .cast("long")
            .alias("only_a"),
            F.sum(((F.col("a_ok") == 0) & (F.col("b_ok") == 1)).cast("int"))
            .cast("long")
            .alias("only_b"),
        )
    )
    diff = (F.col("only_a") - F.col("only_b")).cast("double")
    return cells.select(
        "linestatus",
        "n",
        "n_a_correct",
        "n_b_correct",
        "only_a",
        "only_b",
        F.when(
            F.col("only_a") + F.col("only_b") > 0,
            diff * diff / (F.col("only_a") + F.col("only_b")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mcnemar_chi2"),
    )


@register(
    "q339_jarque_bera",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS s2,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS s4
        FROM lineitem GROUP BY 1, 2
    ), e AS (
        SELECT returnflag, linestatus, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS e2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS e3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS e4
        FROM cells
    ), m AS (
        SELECT returnflag, linestatus, n, e1,
               e2 - e1 * e1 AS m2,
               e3 - 3e0 * e1 * e2 + 2e0 * e1 * e1 * e1 AS m3,
               e4 - 4e0 * e1 * e3 + 6e0 * e1 * e1 * e2
                  - 3e0 * e1 * e1 * e1 * e1 AS m4
        FROM e
    ), shape AS (
        SELECT returnflag, linestatus, n, e1, m2,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) - 3e0 AS kurtosis_excess
        FROM m
    )
    SELECT returnflag, linestatus, n, e1 AS mean_qty, m2 AS variance_pop,
           skewness, kurtosis_excess,
           (CAST(n AS DOUBLE) / 6e0)
               * (skewness * skewness
                  + kurtosis_excess * kurtosis_excess / 4e0) AS jarque_bera
    FROM shape
    """,
    survey_ref="extension: distribution-shape audit — per-population "
    "skewness, excess kurtosis and the Jarque–Bera normality statistic "
    "from exact BIGINT raw moments (quantity ≤ 50 keeps Σx⁴ inside "
    "int64 to ~1e12 rows); complements the location tests (q308/q316) "
    "with the shape dimension",
)
def q339_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness, excess kurtosis and Jarque–Bera per (returnflag,
    linestatus) population of order quantities. The four raw moment
    sums are exact BIGINTs; central moments form in doubles through
    NAMED intermediate columns (e1..e4 → m2..m4 → shape) so the Spark
    and SQL operand sequences mirror term for term; skewness divides by
    m2·√m2 instead of calling pow(x, 1.5) (no transcendental calls).

    Scale: one map-side-combinable aggregate, constant-size arithmetic
    after; JB = n/6·(g1² + g2²/4) flags non-normal populations before
    anyone fits a Gaussian to them."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    cells = li.groupBy(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s1"),
        F.sum(q * q).cast("long").alias("s2"),
        F.sum(q * q * q).cast("long").alias("s3"),
        F.sum(q * q * q * q).cast("long").alias("s4"),
    )
    n_d = F.col("n").cast("double")
    e = cells.select(
        "returnflag",
        "linestatus",
        "n",
        (F.col("s1").cast("double") / n_d).alias("e1"),
        (F.col("s2").cast("double") / n_d).alias("e2"),
        (F.col("s3").cast("double") / n_d).alias("e3"),
        (F.col("s4").cast("double") / n_d).alias("e4"),
    )
    e1 = F.col("e1")
    m = e.select(
        "returnflag",
        "linestatus",
        "n",
        "e1",
        (F.col("e2") - e1 * e1).alias("m2"),
        (F.col("e3") - F.lit(3.0) * e1 * F.col("e2") + F.lit(2.0) * e1 * e1 * e1).alias(
            "m3"
        ),
        (
            F.col("e4")
            - F.lit(4.0) * e1 * F.col("e3")
            + F.lit(6.0) * e1 * e1 * F.col("e2")
            - F.lit(3.0) * e1 * e1 * e1 * e1
        ).alias("m4"),
    )
    shape = m.select(
        "returnflag",
        "linestatus",
        "n",
        "e1",
        "m2",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias("skewness"),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0)).alias(
            "kurtosis_excess"
        ),
    )
    return shape.select(
        "returnflag",
        "linestatus",
        "n",
        F.col("e1").alias("mean_qty"),
        F.col("m2").alias("variance_pop"),
        "skewness",
        "kurtosis_excess",
        (
            (F.col("n").cast("double") / F.lit(6.0))
            * (
                F.col("skewness") * F.col("skewness")
                + F.col("kurtosis_excess") * F.col("kurtosis_excess") / F.lit(4.0)
            )
        ).alias("jarque_bera"),
    )


@register(
    "q340_eb_shrinkage",
    oracle="""
    WITH cells AS (
        SELECT p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    ), s1 AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY brand)),
                   (a, b) -> a + b) AS sp,
               CAST(COUNT(*) AS BIGINT) AS g
        FROM cells
    ), s1m AS (
        SELECT sp / CAST(g AS DOUBLE) AS mean_p, g FROM s1
    ), s2 AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list((CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE) - m.mean_p)
                        * (CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE) - m.mean_p)
                        ORDER BY c.brand)),
                   (a, b) -> a + b) AS sv
        FROM cells c CROSS JOIN s1m m
    ), prior AS (
        SELECT m.mean_p, s2.sv / CAST(m.g AS DOUBLE) AS var_p,
               CASE WHEN s2.sv > 0e0
                         AND m.mean_p * (1e0 - m.mean_p)
                             / (s2.sv / CAST(m.g AS DOUBLE)) - 1e0 > 0e0
                    THEN m.mean_p * (1e0 - m.mean_p)
                         / (s2.sv / CAST(m.g AS DOUBLE)) - 1e0
                    ELSE 1e0 END AS m_strength
        FROM s1m m CROSS JOIN s2
    )
    SELECT c.brand, c.n, c.x,
           CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE) AS raw_rate,
           (CAST(c.x AS DOUBLE) + p.mean_p * p.m_strength)
               / (CAST(c.n AS DOUBLE) + p.m_strength) AS shrunk_rate,
           p.mean_p AS prior_mean, p.var_p AS prior_var,
           p.m_strength AS prior_strength
    FROM cells c CROSS JOIN prior p
    """,
    survey_ref="extension: empirical-Bayes beta-binomial shrinkage — "
    "per-brand return rates pulled toward the cross-brand prior with "
    "strength M from the method of moments (M = p̄(1−p̄)/var(p) − 1); "
    "the multi-group generalization of q228's leave-one-out target "
    "encoding: small brands shrink hard, big brands barely move",
)
def q340_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-brand return rates: the prior
    Beta(α, β) is fitted by method of moments from the observed spread
    of group rates (α+β = M = p̄(1−p̄)/var − 1, floored at 1 when the
    between-group variance is degenerate), then every brand's rate is
    re-estimated as (x + p̄·M)/(n + M). Group moments fold in pinned
    brand order; everything after is per-row arithmetic.

    Scale: one aggregate over the lineitem⋈part join (part broadcasts),
    then G-row folds — the prior fit costs nothing extra at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("int"))
            .cast("long")
            .alias("x"),
        )
        .cache()  # ≤25 rows; the folds and the output reuse one scan
    )
    rate = F.col("x").cast("double") / F.col("n").cast("double")
    s1 = cells.agg(
        _fold_col(["brand"], rate).alias("sp"),
        F.count("*").cast("long").alias("g"),
    )
    s1m = s1.select((F.col("sp") / F.col("g").cast("double")).alias("mean_p"), "g")
    dev = rate - F.col("mean_p")
    s2 = cells.crossJoin(F.broadcast(s1m)).agg(
        _fold_col(["brand"], dev * dev).alias("sv")
    )
    m_raw = (
        F.col("mean_p")
        * (F.lit(1.0) - F.col("mean_p"))
        / (F.col("sv") / F.col("g").cast("double"))
        - F.lit(1.0)
    )
    prior = s1m.crossJoin(F.broadcast(s2)).select(
        "mean_p",
        (F.col("sv") / F.col("g").cast("double")).alias("var_p"),
        F.when((F.col("sv") > 0.0) & (m_raw > 0.0), m_raw)
        .otherwise(F.lit(1.0))
        .alias("m_strength"),
    )
    return cells.crossJoin(F.broadcast(prior)).select(
        "brand",
        "n",
        "x",
        rate.alias("raw_rate"),
        (
            (F.col("x").cast("double") + F.col("mean_p") * F.col("m_strength"))
            / (F.col("n").cast("double") + F.col("m_strength"))
        ).alias("shrunk_rate"),
        F.col("mean_p").alias("prior_mean"),
        F.col("var_p").alias("prior_var"),
        F.col("m_strength").alias("prior_strength"),
    )


@register(
    "q341_kaplan_meier",
    oracle=f"""
    WITH cust AS (
        SELECT o_custkey,
               CAST((year(max(o_orderdate)) - year(min(o_orderdate))) * 4
                    + (quarter(max(o_orderdate)) - quarter(min(o_orderdate)))
                    AS BIGINT) AS t,
               CASE WHEN max(o_orderdate) >= TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END AS censored
        FROM orders GROUP BY 1
    ), hist AS (
        SELECT t, CAST(SUM(1 - censored) AS BIGINT) AS d,
               CAST(SUM(censored) AS BIGINT) AS c
        FROM cust GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(d + c) AS BIGINT) AS total FROM hist
    ), risk AS (
        SELECT h.t, h.d, h.c,
               CAST(tt.total - COALESCE(SUM(h.d + h.c) OVER (ORDER BY h.t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS n
        FROM hist h CROSS JOIN tot tt
    ), arr AS (
        SELECT list(struct_pack(t := t, d := d, n := n) ORDER BY t) AS a
        FROM risk
    ), km AS (
        SELECT r.t, r.d, r.c, r.n,
               list_reduce(list_prepend(CAST(1e0 AS DOUBLE),
                   list_transform(list_filter(ar.a, x -> x.t <= r.t),
                       x -> 1e0 - CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
                   (p, q) -> p * q) AS s_km,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list_transform(list_filter(ar.a, x -> x.t <= r.t),
                       x -> CASE WHEN x.n > x.d
                                 THEN CAST(x.d AS DOUBLE)
                                      / CAST(x.n * (x.n - x.d) AS DOUBLE)
                                 ELSE 0e0 END)),
                   (p, q) -> p + q) AS gw
        FROM risk r CROSS JOIN arr ar
    )
    SELECT t AS tenure_q, n AS n_risk, d AS d_churned, c AS c_censored, s_km,
           s_km * s_km * gw AS greenwood_var,
           s_km - {_Z_ALPHA_HALF} * sqrt(s_km * s_km * gw) AS ci_lo,
           s_km + {_Z_ALPHA_HALF} * sqrt(s_km * s_km * gw) AS ci_hi
    FROM km
    """,
    survey_ref="extension: Kaplan–Meier survival curve with Greenwood "
    "variance and 95% CI — the censoring-aware upgrade of q298's "
    "discrete hazard (q298 forces every customer to churn; here "
    "customers still active in 2001 are right-censored): S(t) = "
    "Π(1−d/n), var = S²·Σ d/(n(n−d))",
)
def q341_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier over customer tenure (quarters between first and
    last order); customers whose last order falls in 2001 are
    right-censored rather than counted as churned. The tenure histogram
    reduces everything to ≤~30 rows first (the q298 count-of-counts
    discipline); at-risk counts are one exact prefix-sum window; the
    survival product and the Greenwood sum evaluate per row by folding
    the FILTERED (u ≤ t) slice of one broadcast (t, d, n) array — both
    folds run in ascending-t order with exact seeds, so the doubles are
    bit-identical across engines.

    Scale: one customer-grain aggregate, then constant-size array work
    — the curve costs the same at 100 TB as at sf0.001."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (
            (F.year(F.max("o_orderdate")) - F.year(F.min("o_orderdate"))) * 4
            + (F.quarter(F.max("o_orderdate")) - F.quarter(F.min("o_orderdate")))
        )
        .cast("long")
        .alias("t"),
        F.when(
            F.max("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"), 1
        )
        .otherwise(0)
        .alias("censored"),
    )
    hist = cust.groupBy("t").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
    ).cache()  # ≤~30 rows; risk/arr/output all reuse one orders scan
    tot = hist.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("total"))
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = hist.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "c",
        (
            F.col("total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wt), F.lit(0))
        )
        .cast("long")
        .alias("n"),
    )
    arr = risk.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t").alias("t"), F.col("d").alias("d"), F.col("n").alias("n")
                )
            )
        ).alias("a")
    )
    km = risk.crossJoin(F.broadcast(arr))
    upto = F.filter(F.col("a"), lambda x: x["t"] <= F.col("t"))
    s_km = F.aggregate(
        F.transform(
            upto, lambda x: F.lit(1.0) - x["d"].cast("double") / x["n"].cast("double")
        ),
        F.lit(1.0),
        lambda p, q: p * q,
    )
    gw = F.aggregate(
        F.transform(
            upto,
            lambda x: F.when(
                x["n"] > x["d"],
                x["d"].cast("double")
                / (x["n"] * (x["n"] - x["d"])).cast("double"),
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda p, q: p + q,
    )
    z = F.lit(float(_Z_ALPHA_HALF))
    km2 = km.select("t", "d", "c", "n", s_km.alias("s_km"), gw.alias("gw"))
    return km2.select(
        F.col("t").alias("tenure_q"),
        F.col("n").alias("n_risk"),
        F.col("d").alias("d_churned"),
        F.col("c").alias("c_censored"),
        "s_km",
        (F.col("s_km") * F.col("s_km") * F.col("gw")).alias("greenwood_var"),
        (
            F.col("s_km")
            - z * F.sqrt(F.col("s_km") * F.col("s_km") * F.col("gw"))
        ).alias("ci_lo"),
        (
            F.col("s_km")
            + z * F.sqrt(F.col("s_km") * F.col("s_km") * F.col("gw"))
        ).alias("ci_hi"),
    )


_AMS_ROWS = [
    (48271, 11213),
    (69621, 28411),
    (40692, 52711),
    (16807, 7919),
    (39373, 104729),
    (65539, 131071),
    (22695477, 3),
    (134775813, 7),
]


@register(
    "q342_ams_f2",
    oracle=f"""
    WITH sk0 AS (
        SELECT {", ".join(
            f"CAST(SUM(1 - 2 * (({_mix31_sql(f'l_partkey * {a} + {b}')}) % 2)) AS BIGINT) AS s{i}"
            for i, (a, b) in enumerate(_AMS_ROWS)
        )}
        FROM lineitem
    ), sk AS (
        {" UNION ALL ".join(
            f"SELECT CAST({i} AS BIGINT) AS sketch_id, s{i} AS sketch_sum, s{i} * s{i} AS estimate FROM sk0"
            for i in range(len(_AMS_ROWS))
        )}
    ), exact AS (
        SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_partkey
        )
    ), med AS (
        SELECT list_sort(list(estimate)) AS es,
               CAST(SUM(estimate) AS BIGINT) AS tot
        FROM sk
    ), stats AS (
        SELECT CAST(m.tot AS DOUBLE) / 8e0 AS est_mean,
               CAST(m.es[4] + m.es[5] AS DOUBLE) / 2e0 AS est_median,
               e.f2_exact
        FROM med m CROSS JOIN exact e
    )
    SELECT s.sketch_id, s.sketch_sum, s.estimate, st.f2_exact, st.est_mean,
           st.est_median,
           (st.est_median - CAST(st.f2_exact AS DOUBLE))
               / CAST(st.f2_exact AS DOUBLE) AS rel_error_median
    FROM sk s CROSS JOIN stats st
    """,
    survey_ref="extension: AMS (Alon–Matias–Szegedy) F2 sketch — the "
    "second frequency moment Σf² (= self-join size) of the part-key "
    "stream from 8 constant-space ±1-sign counters, median-of-sketches "
    "vs the exact value; complements q207's coordinated-sample join "
    "estimator with the classic streaming-sketch answer",
)
def q342_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2: eight independent sketches each keep ONE counter,
    Σ_rows sign_j(key), where sign_j = 1 − 2·(mix31(key·a_j + b_j) mod
    2) is a deterministic ±1 from the q224 portable mixer; sketch² is
    an unbiased F2 estimate, the median of eight tames the variance.
    Every counter is an exact BIGINT (order-independent integer sums —
    no folds needed); the exact Σf² rides along for the audit.

    Scale: the 8 sketch sums are ONE map-side-combinable aggregate with
    zero keys — constant state per executor regardless of key
    cardinality; only the audit column pays a key shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    sums = li.agg(
        *[
            F.sum(
                F.lit(1)
                - 2 * F.pmod(_mix31_col(F.col("l_partkey") * a + b), F.lit(2))
            )
            .cast("long")
            .alias(f"s{i}")
            for i, (a, b) in enumerate(_AMS_ROWS)
        ]
    )
    sk = sums.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("sketch_id"),
                        F.col(f"s{i}").alias("sketch_sum"),
                        (F.col(f"s{i}") * F.col(f"s{i}")).alias("estimate"),
                    )
                    for i in range(len(_AMS_ROWS))
                ]
            )
        ).alias("r")
    ).select("r.sketch_id", "r.sketch_sum", "r.estimate")
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("cnt"))
        .agg(F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2_exact"))
    )
    med = sk.agg(
        F.array_sort(F.collect_list("estimate")).alias("es"),
        F.sum("estimate").cast("long").alias("tot"),
    )
    stats = med.crossJoin(F.broadcast(exact)).select(
        (F.col("tot").cast("double") / F.lit(8.0)).alias("est_mean"),
        (
            (F.element_at(F.col("es"), 4) + F.element_at(F.col("es"), 5)).cast(
                "double"
            )
            / F.lit(2.0)
        ).alias("est_median"),
        "f2_exact",
    )
    return sk.crossJoin(F.broadcast(stats)).select(
        "sketch_id",
        "sketch_sum",
        "estimate",
        "f2_exact",
        "est_mean",
        "est_median",
        (
            (F.col("est_median") - F.col("f2_exact").cast("double"))
            / F.col("f2_exact").cast("double")
        ).alias("rel_error_median"),
    )


# ---------------------------------------------------------------------------
# Batch 33 (round 5): rank correlation, inequality decomposition, corpus
# divergence, Zipf fit, ordered-trend testing
# ---------------------------------------------------------------------------


@register(
    "q343_kendall_tau",
    oracle="""
    WITH cust AS (
        SELECT c.c_custkey AS ck, CAST(c.c_nationkey AS BIGINT) AS nationkey,
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS y,
               CAST(COALESCE(o.cnt, 0) AS BIGINT) AS x
        FROM customer c LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1
        ) o ON c.c_custkey = o.o_custkey
    ), pairs AS (
        SELECT a.nationkey,
               CAST(COUNT(*) AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nd,
               CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM cust a JOIN cust b
          ON a.nationkey = b.nationkey AND a.ck < b.ck
        GROUP BY 1
    )
    SELECT nationkey, n0 AS n_pairs, nc AS concordant, nd AS discordant,
           n1 AS tied_x, n2 AS tied_y,
           CAST(nc - nd AS DOUBLE)
               / sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
               AS tau_b
    FROM pairs
    """,
    survey_ref="extension: Kendall tau-b rank correlation (order-count "
    "vs account balance per nation) — the pairwise complement of q241's "
    "Spearman rho, with full tie handling; every pair statistic is an "
    "exact BIGINT from one within-group self-join",
)
def q343_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b per nation between a customer's order count and
    account balance: concordant/discordant/tied pair counts from the
    within-nation self-join (a.ck < b.ck visits each pair once), then
    τ_b = (nc − nd)/√((n0−t_x)(n0−t_y)) — one double expression over
    exact integers.

    Scale: the join shuffles both sides on nationkey and blows up
    O(Σ m_g²) INSIDE each group — fine for dimension-sized groups
    (~640² here); at fact scale you'd bound m per group first (q230's
    PPS sample or q59's hash slice) and this plan is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count("*").alias("cnt")
    )
    cust = c.join(o, c.c_custkey == o.o_custkey, "left").select(
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        (_dec("c_acctbal") * 100).cast("long").alias("y"),
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("x"),
    )
    a, b = cust.alias("a"), cust.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.nationkey") == F.col("b.nationkey"))
            & (F.col("a.ck") < F.col("b.ck")),
        )
        .groupBy(F.col("a.nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("long").alias("n0"),
            F.sum((prod > 0).cast("int")).cast("long").alias("nc"),
            F.sum((prod < 0).cast("int")).cast("long").alias("nd"),
            F.sum((F.col("a.x") == F.col("b.x")).cast("int"))
            .cast("long")
            .alias("n1"),
            F.sum((F.col("a.y") == F.col("b.y")).cast("int"))
            .cast("long")
            .alias("n2"),
        )
    )
    return pairs.select(
        "nationkey",
        F.col("n0").alias("n_pairs"),
        F.col("nc").alias("concordant"),
        F.col("nd").alias("discordant"),
        F.col("n1").alias("tied_x"),
        F.col("n2").alias("tied_y"),
        (
            (F.col("nc") - F.col("nd")).cast("double")
            / F.sqrt(
                (F.col("n0") - F.col("n1")).cast("double")
                * (F.col("n0") - F.col("n2")).cast("double")
            )
        ).alias("tau_b"),
    )


@register(
    "q344_theil_index",
    oracle=f"""
    WITH cells0 AS (
        SELECT p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(rev) AS BIGINT) AS xx
        FROM cells0
    ), cj AS (
        SELECT c.brand, c.n, c.rev, t.nn, t.xx FROM cells0 c CROSS JOIN tot t
    ), {_pln_ctes("cj", "rev", "xx", "lp_rev", "pa")},
    {_pln_ctes("pa", "n", "nn", "lp_pop", "pb")},
    terms AS (
        SELECT brand, n, rev, nn, xx,
               CAST(rev AS DOUBLE) / CAST(xx AS DOUBLE) AS rev_share,
               CAST(n AS DOUBLE) / CAST(nn AS DOUBLE) AS pop_share,
               CAST(rev AS DOUBLE) / CAST(xx AS DOUBLE) * (lp_rev - lp_pop)
                   AS theil_term
        FROM pb
    ), theil AS (
        SELECT {_fold_sql("theil_term", "brand")} AS theil_between FROM terms
    )
    SELECT t.brand, t.n, t.rev AS revenue_cents, t.rev_share, t.pop_share,
           t.theil_term, h.theil_between
    FROM terms t CROSS JOIN theil h
    """,
    survey_ref="extension: between-group Theil T inequality index of "
    "revenue concentration across brands — the DECOMPOSABLE complement "
    "of q174's Gini (Theil splits exactly into between + within); "
    "Σ (X_g/X)·ln((X_g/X)/(n_g/N)) with both lns portable",
)
def q344_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-brand Theil T index: how unequally is revenue
    distributed across brands relative to their line-item counts? Each
    term is (revenue share)·(ln rev_share − ln pop_share) with both lns
    through the portable primitive on exact integer cent sums (revenue
    cents ≤ ~2.4e11 per brand at sf0.1; at 100 TB the shares would form
    from DECIMAL(38) sums rendered to BIGINT buckets). Zero-revenue
    groups can't occur (every line item has a positive price), so the
    ln arguments stay positive by construction.

    Scale: one aggregate over lineitem⋈part (part broadcasts), then a
    25-row pinned fold; T = 0 iff every brand's revenue share equals
    its population share."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum((_dec("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("rev"),
        )
        .cache()  # ≤25 rows; fold and output reuse one fact scan
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("rev").cast("long").alias("xx")
    )
    cj = cells.crossJoin(F.broadcast(tot))
    cj = _pln_stage(cj, "rev", "xx", "lp_rev", "pa")
    cj = _pln_stage(cj, "n", "nn", "lp_pop", "pb")
    rev_share = F.col("rev").cast("double") / F.col("xx").cast("double")
    terms = cj.select(
        "brand",
        "n",
        "rev",
        "nn",
        "xx",
        rev_share.alias("rev_share"),
        (F.col("n").cast("double") / F.col("nn").cast("double")).alias("pop_share"),
        (rev_share * (F.col("lp_rev") - F.col("lp_pop"))).alias("theil_term"),
    )
    theil = terms.agg(_fold_col(["brand"], F.col("theil_term")).alias("theil_between"))
    return terms.crossJoin(F.broadcast(theil)).select(
        "brand",
        "n",
        F.col("rev").alias("revenue_cents"),
        "rev_share",
        "pop_share",
        "theil_term",
        "theil_between",
    )


@register(
    "q345_js_divergence",
    oracle=f"""
    WITH d AS (
        SELECT source, lang FROM documents
    ), cell AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS a FROM d GROUP BY 1, 2
    ), langs AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS g FROM d GROUP BY 1
    ), srcs AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS aa FROM d GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS gg FROM d
    ), grid AS (
        SELECT s.source, s.aa, l.lang, l.g, t.gg,
               CAST(COALESCE(c.a, 0) AS BIGINT) AS a
        FROM srcs s CROSS JOIN langs l CROSS JOIN tot t
        LEFT JOIN cell c ON s.source = c.source AND l.lang = c.lang
    ), parts AS (
        SELECT source, lang, aa, gg, a,
               g - a AS b, aa AS ca, gg - aa AS cb,
               a * (gg - aa) AS pn, (g - a) * aa AS qn
        FROM grid
    ), pos AS (
        SELECT source, lang, aa, a, b, ca, cb,
               CASE WHEN pn > 0 THEN pn ELSE 1 END AS pn1,
               CASE WHEN qn > 0 THEN qn ELSE 1 END AS qn1,
               pn > 0 AS has_p, qn > 0 AS has_q,
               pn + qn AS mn
        FROM parts
    ), {_pln_ctes("pos", "pn1", "mn", "lp_p", "pa")},
    {_pln_ctes("pa", "qn1", "mn", "lp_q", "pb")},
    terms AS (
        SELECT source, lang, aa, a, b,
               (CASE WHEN has_p
                     THEN CAST(a AS DOUBLE) / CAST(ca AS DOUBLE)
                          * ({_PLN_LN2!r}e0 + lp_p)
                     ELSE 0e0 END
                + CASE WHEN has_q
                       THEN CAST(b AS DOUBLE) / CAST(cb AS DOUBLE)
                            * ({_PLN_LN2!r}e0 + lp_q)
                       ELSE 0e0 END) / 2e0 AS js_term
        FROM pb
    ), js AS (
        SELECT source, CAST(SUM(a) AS BIGINT) AS n_docs,
               {_fold_sql("js_term", "lang")} AS js_nats
        FROM terms GROUP BY 1
    )
    SELECT source, n_docs, js_nats, js_nats / {_PLN_LN2!r}e0 AS js_bits
    FROM js
    """,
    survey_ref="extension: Jensen-Shannon divergence between each "
    "source's language distribution and the REST of the corpus — the "
    "bounded, symmetric drift measure for corpus mixing (q79/q191) "
    "that KL alone can't give (KL blows up on zero cells; JS is finite "
    "by construction); ln(p/m) arguments reduce to exact integer "
    "ratios a(G−A) : (aB+bA)-style products",
)
def q345_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source JS divergence against the rest of the corpus over the
    language distribution. With P = a_i/A and Q = b_i/B (B = rest),
    p/m = 2aB/(aB+bA) — an exact integer ratio, so ln(p/m) = ln2 +
    pln(aB, aB+bA); zero cells contribute exactly 0 from their side
    (guarded CASE, the 0·ln0 convention), which is why JS works where
    KL is undefined. The per-source fold runs in language order.

    Scale: document-grain aggregates only; the (source × lang) grid
    densifies via a cross join of two dimension-sized relations.
    Products a·B stay under 2^52 to ~10^8 docs per cell — past that the
    ratio splits as pln(a,1)+pln(B,1)−pln(aB+bA,1) on bucketed counts."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    cell = d.groupBy("source", "lang").agg(F.count("*").cast("long").alias("a"))
    langs = d.groupBy("lang").agg(F.count("*").cast("long").alias("g"))
    srcs = d.groupBy("source").agg(F.count("*").cast("long").alias("aa"))
    tot = d.agg(F.count("*").cast("long").alias("gg"))
    grid = (
        srcs.crossJoin(F.broadcast(langs))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(cell), ["source", "lang"], "left")
        .select(
            "source",
            "aa",
            "lang",
            "g",
            "gg",
            F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a"),
        )
    )
    parts = grid.select(
        "source",
        "lang",
        "aa",
        "gg",
        "a",
        (F.col("g") - F.col("a")).alias("b"),
        F.col("aa").alias("ca"),
        (F.col("gg") - F.col("aa")).alias("cb"),
        (F.col("a") * (F.col("gg") - F.col("aa"))).alias("pn"),
        ((F.col("g") - F.col("a")) * F.col("aa")).alias("qn"),
    )
    pos = parts.select(
        "source",
        "lang",
        "aa",
        "a",
        "b",
        "ca",
        "cb",
        F.when(F.col("pn") > 0, F.col("pn")).otherwise(F.lit(1)).alias("pn1"),
        F.when(F.col("qn") > 0, F.col("qn")).otherwise(F.lit(1)).alias("qn1"),
        (F.col("pn") > 0).alias("has_p"),
        (F.col("qn") > 0).alias("has_q"),
        (F.col("pn") + F.col("qn")).alias("mn"),
    )
    pos = _pln_stage(pos, "pn1", "mn", "lp_p", "pa")
    pos = _pln_stage(pos, "qn1", "mn", "lp_q", "pb")
    ln2 = F.lit(_PLN_LN2)
    terms = pos.select(
        "source",
        "lang",
        "aa",
        "a",
        "b",
        (
            (
                F.when(
                    F.col("has_p"),
                    F.col("a").cast("double")
                    / F.col("ca").cast("double")
                    * (ln2 + F.col("lp_p")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("has_q"),
                    F.col("b").cast("double")
                    / F.col("cb").cast("double")
                    * (ln2 + F.col("lp_q")),
                ).otherwise(F.lit(0.0))
            )
            / F.lit(2.0)
        ).alias("js_term"),
    )
    js = terms.groupBy("source").agg(
        F.sum("a").cast("long").alias("n_docs"),
        _fold_col(["lang"], F.col("js_term")).alias("js_nats"),
    )
    return js.select(
        "source", "n_docs", "js_nats", (F.col("js_nats") / ln2).alias("js_bits")
    )


@register(
    "q346_zipf_slope",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  t -> t <> '')) AS tok
        FROM documents
    ), freq AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY 1
    ), topk AS (
        SELECT tok, f,
               CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS BIGINT) AS r
        FROM freq QUALIFY r <= 100
    ), one AS (
        SELECT tok, f, r, CAST(1 AS BIGINT) AS uno FROM topk
    ), {_pln_ctes("one", "r", "uno", "ln_rank", "pa")},
    {_pln_ctes("pa", "f", "uno", "ln_freq", "pb")},
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               {_fold_sql("ln_rank", "r")} AS sx,
               {_fold_sql("ln_freq", "r")} AS sy,
               {_fold_sql("ln_rank * ln_freq", "r")} AS sxy,
               {_fold_sql("ln_rank * ln_rank", "r")} AS sxx,
               {_fold_sql("ln_freq * ln_freq", "r")} AS syy
        FROM pb
    ), fit AS (
        SELECT k,
               (CAST(k AS DOUBLE) * sxy - sx * sy)
                   / (CAST(k AS DOUBLE) * sxx - sx * sx) AS slope,
               (sy - (CAST(k AS DOUBLE) * sxy - sx * sy)
                     / (CAST(k AS DOUBLE) * sxx - sx * sx) * sx)
                   / CAST(k AS DOUBLE) AS intercept,
               (CAST(k AS DOUBLE) * sxy - sx * sy)
                   * (CAST(k AS DOUBLE) * sxy - sx * sy)
                   / ((CAST(k AS DOUBLE) * sxx - sx * sx)
                      * (CAST(k AS DOUBLE) * syy - sy * sy)) AS r2
        FROM sums
    )
    SELECT t.r AS rank, t.tok AS token, t.f AS freq, p.ln_rank, p.ln_freq,
           f.slope, f.intercept, f.r2
    FROM pb p JOIN topk t ON p.r = t.r CROSS JOIN fit f
    """,
    survey_ref="extension: Zipf's-law fit — OLS of ln(freq) on "
    "ln(rank) over the top-100 corpus tokens, slope ≈ −1 for natural "
    "text; the quantitative summary of q50's token frequencies and a "
    "quality signal for synthetic/templated corpora (which flatten or "
    "steepen the tail); both lns portable, sums pinned-order folds",
)
def q346_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf slope of the corpus: rank the top-100 whitespace tokens by
    frequency (token tie-break), regress ln f on ln r. ln of a plain
    BIGINT is pln(v, 1); the five OLS sums fold over 100 rows in rank
    order; slope/intercept/r² are per-row arithmetic mirrored term for
    term in the oracle.

    Scale: the token-frequency aggregate is the only fact-sized stage
    (shuffle on token); the top-100 window, plns and folds touch 100
    rows. A natural corpus gives slope ≈ −1; r² far below ~0.9 or a
    slope near 0 flags templated text."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("f"))
    # global top-k via sort+limit (TakeOrderedAndProject — per-partition
    # heaps, no single-partition window over the whole vocabulary);
    # the rank window then runs over exactly 100 rows
    wr = Window.orderBy(F.desc("f"), F.col("tok"))
    topk = (
        freq.orderBy(F.desc("f"), F.col("tok"))
        .limit(100)
        .select("tok", "f", F.row_number().over(wr).cast("long").alias("r"))
        .withColumn("uno", F.lit(1).cast("long"))
        .cache()  # 100 rows; plns, folds and output reuse one token scan
    )
    pb = _pln_stage(_pln_stage(topk, "r", "uno", "ln_rank", "pa"), "f", "uno", "ln_freq", "pb")
    sums = pb.agg(
        F.count("*").cast("long").alias("k"),
        _fold_col(["r"], F.col("ln_rank")).alias("sx"),
        _fold_col(["r"], F.col("ln_freq")).alias("sy"),
        _fold_col(["r"], F.col("ln_rank") * F.col("ln_freq")).alias("sxy"),
        _fold_col(["r"], F.col("ln_rank") * F.col("ln_rank")).alias("sxx"),
        _fold_col(["r"], F.col("ln_freq") * F.col("ln_freq")).alias("syy"),
    )
    k_d = F.col("k").cast("double")
    num = k_d * F.col("sxy") - F.col("sx") * F.col("sy")
    den = k_d * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = sums.select(
        "k",
        (num / den).alias("slope"),
        ((F.col("sy") - num / den * F.col("sx")) / k_d).alias("intercept"),
        (
            num * num / (den * (k_d * F.col("syy") - F.col("sy") * F.col("sy")))
        ).alias("r2"),
    )
    return pb.crossJoin(F.broadcast(fit)).select(
        F.col("r").alias("rank"),
        F.col("tok").alias("token"),
        F.col("f").alias("freq"),
        "ln_rank",
        "ln_freq",
        "slope",
        "intercept",
        "r2",
    )


@register(
    "q347_cochran_armitage",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS priority,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM orders GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(x) AS BIGINT) AS xx,
               CAST(SUM(s * x) AS BIGINT) AS sx,
               CAST(SUM(s * n) AS BIGINT) AS sn,
               CAST(SUM(s * s * n) AS BIGINT) AS ssn
        FROM cells
    ), stat AS (
        SELECT nn, xx,
               CAST(sx AS DOUBLE)
                   - CAST(xx AS DOUBLE) * CAST(sn AS DOUBLE)
                     / CAST(nn AS DOUBLE) AS tnum,
               CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)
                   * (1e0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE))
                   * (CAST(ssn AS DOUBLE)
                      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                        / CAST(nn AS DOUBLE)) AS tvar
        FROM tot
    )
    SELECT c.priority, c.s AS score, c.n, c.x,
           CAST(c.x AS DOUBLE) / CAST(c.n AS DOUBLE) AS rate,
           CAST(t.xx AS DOUBLE) / CAST(t.nn AS DOUBLE) AS pooled_rate,
           t.tnum * t.tnum / t.tvar AS ca_z2
    FROM cells c CROSS JOIN stat t
    """,
    survey_ref="extension: Cochran-Armitage trend test — does "
    "fulfillment probability change MONOTONICALLY with priority level? "
    "The ordered-category test q205/q327 can't express (chi² ignores "
    "order); scores are the priority's leading digit, the statistic "
    "forms entirely from exact BIGINT sums",
)
def q347_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend: with score s = priority level (1..5)
    and outcome = order fulfilled, T = Σs·x − p̄·Σs·n and Var T =
    p̄(1−p̄)(Σns² − (Σsn)²/N); z² = T²/Var. Every Σ is an exact BIGINT
    over 5 group rows (order-independent integer sums — no folds);
    doubles form only in the final statistic.

    Scale: one map-side-combinable aggregate over orders; the trend
    test itself is constant work."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("s"),
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("o_orderstatus") == "F").cast("int")).cast("long").alias("x"),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("x").cast("long").alias("xx"),
        F.sum(F.col("s") * F.col("x")).cast("long").alias("sx"),
        F.sum(F.col("s") * F.col("n")).cast("long").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).cast("long").alias("ssn"),
    )
    nn_d = F.col("nn").cast("double")
    xx_d = F.col("xx").cast("double")
    stat = tot.select(
        "nn",
        "xx",
        (
            F.col("sx").cast("double")
            - xx_d * F.col("sn").cast("double") / nn_d
        ).alias("tnum"),
        (
            xx_d
            / nn_d
            * (F.lit(1.0) - xx_d / nn_d)
            * (
                F.col("ssn").cast("double")
                - F.col("sn").cast("double") * F.col("sn").cast("double") / nn_d
            )
        ).alias("tvar"),
    )
    return cells.crossJoin(F.broadcast(stat)).select(
        "priority",
        F.col("s").alias("score"),
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n").cast("double")).alias("rate"),
        (F.col("xx").cast("double") / F.col("nn").cast("double")).alias(
            "pooled_rate"
        ),
        (F.col("tnum") * F.col("tnum") / F.col("tvar")).alias("ca_z2"),
    )


# ---------------------------------------------------------------------------
# Batch 34 (round 5): Markov attribution, label-propagation communities,
# Croston intermittent-demand forecasting, STL-lite decomposition
# ---------------------------------------------------------------------------

_MARKOV_ROUNDS = 6


def _markov_oracle(rounds: int = _MARKOV_ROUNDS) -> str:
    vs = []
    prev = "v1"
    vs.append("v1 AS (SELECT rem, s, conv AS val FROM conv0)")
    for i in range(2, rounds + 1):
        vs.append(f"""v{i} AS (
        SELECT c.rem, c.s, c.conv + COALESCE(f.sm, 0e0) AS val
        FROM conv0 c LEFT JOIN (
            SELECT g.rem, g.src,
                   list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                       list(g.p * v.val ORDER BY g.dst)), (a, b) -> a + b) AS sm
            FROM gridt g JOIN {prev} v ON g.rem = v.rem AND g.dst = v.s
            GROUP BY 1, 2
        ) f ON c.rem = f.rem AND c.s = f.src
    )""")
        prev = f"v{i}"
    return f"""
    WITH r AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events
    ), fp AS (
        SELECT user_id, MIN(rn) AS fp FROM r
        WHERE event_type = 'purchase' GROUP BY 1
    ), j AS (
        SELECT r.user_id, r.event_type, r.rn, fp.fp
        FROM r LEFT JOIN fp ON r.user_id = fp.user_id
    ), kept AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn) AS krn
        FROM j WHERE fp IS NULL OR rn < fp
    ), kt AS (
        SELECT event_type AS src,
               COALESCE(LEAD(event_type) OVER (PARTITION BY user_id ORDER BY rn),
                        CASE WHEN fp IS NOT NULL THEN 'CONV' ELSE 'NULL' END)
                   AS dst
        FROM kept
    ), ustart AS (
        SELECT user_id, MAX(fp) AS fp FROM j GROUP BY 1
    ), firstk AS (
        SELECT user_id, event_type FROM kept WHERE krn = 1
    ), st AS (
        SELECT 'START' AS src,
               COALESCE(f.event_type,
                        CASE WHEN u.fp IS NOT NULL THEN 'CONV' ELSE 'NULL' END)
                   AS dst
        FROM ustart u LEFT JOIN firstk f ON u.user_id = f.user_id
    ), tcnt AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT src, dst FROM kt UNION ALL SELECT src, dst FROM st
        ) GROUP BY 1, 2
    ), tp AS (
        SELECT src, dst, c,
               CAST(c AS DOUBLE)
                   / CAST(SUM(c) OVER (PARTITION BY src) AS DOUBLE) AS p
        FROM tcnt
    ), chans AS (
        SELECT DISTINCT src AS ch FROM tcnt WHERE src <> 'START'
    ), rems AS (
        SELECT ch AS rem FROM chans UNION ALL SELECT 'NONE'
    ), states AS (
        SELECT ch AS s FROM chans UNION ALL SELECT 'START'
    ), gridt AS (
        SELECT r.rem, t.src, t.dst, t.p
        FROM rems r JOIN tp t ON t.src <> r.rem AND t.dst <> r.rem
    ), conv0 AS (
        SELECT r.rem, s.s, COALESCE(g.p, 0e0) AS conv
        FROM rems r JOIN states s ON s.s <> r.rem
        LEFT JOIN gridt g
          ON g.rem = r.rem AND g.src = s.s AND g.dst = 'CONV'
    ), {", ".join(vs)},
    fin AS (
        SELECT rem, val FROM {prev} WHERE s = 'START'
    ), base AS (
        SELECT val AS p_base FROM fin WHERE rem = 'NONE'
    ), outp AS (
        SELECT f.rem AS channel, b.p_base, f.val AS p_removed,
               1e0 - f.val / b.p_base AS removal_effect
        FROM fin f CROSS JOIN base b WHERE f.rem <> 'NONE'
    ), tot AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(removal_effect ORDER BY channel)), (a, b) -> a + b)
               AS re_sum
        FROM outp
    )
    SELECT o.channel, o.p_base, o.p_removed, o.removal_effect,
           o.removal_effect / t.re_sum AS attribution_share
    FROM outp o CROSS JOIN tot t
    """


@register(
    "q348_markov_attribution",
    oracle=_markov_oracle(),
    survey_ref="extension: Markov-chain (removal-effect) attribution — "
    "the data-driven successor to q96's last-click and q159's "
    "positional rules: model journeys as a first-order chain over "
    "channels, absorb at CONV/NULL, credit each channel by how much "
    "base conversion drops when paths through it are cut; absorption "
    f"probabilities from {_MARKOV_ROUNDS} unrolled value-iteration "
    "rounds (the q110 PageRank discipline)",
)
def q348_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution over user journeys (events ordered
    per user up to the FIRST purchase): transitions START→channel→…→
    CONV/NULL with exact integer counts and one row-normalization;
    P(convert | start) comes from 6 unrolled value-iteration rounds —
    v(s) ← P(s→CONV) + Σ_ch P(s→ch)·v(ch), the per-state sum a
    pinned-order fold over destinations. Removing channel c redirects
    every path through c to NULL WITHOUT renormalizing rows (the
    standard removal-effect construction); attribution share is each
    channel's relative drop in conversion.

    Scale: journeys reduce to a ≤|channels|²-row transition matrix in
    one windowed pass + one aggregate; every iteration after that is
    constant-size. The rounds bound the modeled journey length — the
    documented contract, not a convergence gamble (q110 discipline)."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    fp = (
        r.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp"))
    )
    j = r.join(fp, "user_id", "left")
    kept = j.filter(F.col("fp").isNull() | (F.col("rn") < F.col("fp")))
    wk = Window.partitionBy("user_id").orderBy("rn")
    term = F.when(F.col("fp").isNotNull(), F.lit("CONV")).otherwise(F.lit("NULL"))
    kt = kept.select(
        F.col("event_type").alias("src"),
        F.coalesce(F.lead("event_type").over(wk), term).alias("dst"),
    )
    ustart = j.groupBy("user_id").agg(F.max("fp").alias("fp"))
    firstk = (
        kept.select("user_id", "event_type", F.row_number().over(wk).alias("krn"))
        .filter(F.col("krn") == 1)
        .drop("krn")
    )
    st = ustart.join(firstk, "user_id", "left").select(
        F.lit("START").alias("src"),
        F.coalesce(F.col("event_type"), term).alias("dst"),
    )
    tcnt = (
        kt.unionByName(st)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("c"))
    )
    wsrc = Window.partitionBy("src")
    tp = tcnt.select(
        "src",
        "dst",
        "c",
        (F.col("c").cast("double") / F.sum("c").over(wsrc).cast("double")).alias(
            "p"
        ),
    ).cache()  # ≤|channels|² rows; every iteration reuses one events scan
    chans = tp.filter(F.col("src") != "START").select(F.col("src").alias("ch")).distinct()
    rems = chans.select(F.col("ch").alias("rem")).unionByName(
        spark.range(1).select(F.lit("NONE").alias("rem"))
    )
    states = chans.select(F.col("ch").alias("s")).unionByName(
        spark.range(1).select(F.lit("START").alias("s"))
    )
    gridt = (
        rems.crossJoin(tp)
        .filter((F.col("src") != F.col("rem")) & (F.col("dst") != F.col("rem")))
        .select("rem", "src", "dst", "p")
        .cache()
    )
    conv0 = (
        rems.join(states, states.s != rems.rem)
        .join(
            gridt.filter(F.col("dst") == "CONV").select(
                "rem", F.col("src").alias("s"), F.col("p").alias("cp")
            ),
            ["rem", "s"],
            "left",
        )
        .select("rem", "s", F.coalesce(F.col("cp"), F.lit(0.0)).alias("conv"))
        .cache()
    )
    v = conv0.select("rem", "s", F.col("conv").alias("val"))
    for _ in range(2, _MARKOV_ROUNDS + 1):
        contrib = (
            gridt.join(
                v.select("rem", F.col("s").alias("dst"), "val"), ["rem", "dst"]
            )
            .groupBy("rem", "src")
            .agg(_fold_col(["dst"], F.col("p") * F.col("val")).alias("sm"))
        )
        v = conv0.join(
            contrib.select("rem", F.col("src").alias("s"), "sm"),
            ["rem", "s"],
            "left",
        ).select(
            "rem",
            "s",
            (F.col("conv") + F.coalesce(F.col("sm"), F.lit(0.0))).alias("val"),
        )
    fin = v.filter(F.col("s") == "START").select("rem", "val")
    base = fin.filter(F.col("rem") == "NONE").select(
        F.col("val").alias("p_base")
    )
    outp = (
        fin.filter(F.col("rem") != "NONE")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("rem").alias("channel"),
            "p_base",
            F.col("val").alias("p_removed"),
            (F.lit(1.0) - F.col("val") / F.col("p_base")).alias("removal_effect"),
        )
        .cache()  # |channels| rows; the share fold and output reuse it
    )
    tot = outp.agg(_fold_col(["channel"], F.col("removal_effect")).alias("re_sum"))
    return outp.crossJoin(F.broadcast(tot)).select(
        "channel",
        "p_base",
        "p_removed",
        "removal_effect",
        (F.col("removal_effect") / F.col("re_sum")).alias("attribution_share"),
    )


_LPA_ROUNDS = 3


def _lpa_oracle(rounds: int = _LPA_ROUNDS) -> str:
    ls = ["l0 AS (SELECT p_partkey AS node, p_partkey AS lbl FROM part)"]
    prev = "l0"
    for i in range(1, rounds + 1):
        ls.append(f"""l{i} AS (
        SELECT n.node, COALESCE(w.lbl, n.lbl) AS lbl
        FROM {prev} n LEFT JOIN (
            SELECT u AS node, lbl FROM (
                SELECT e.u, lv.lbl, CAST(COUNT(*) AS BIGINT) AS cnt,
                       ROW_NUMBER() OVER (PARTITION BY e.u
                           ORDER BY COUNT(*) DESC, lv.lbl) AS rk
                FROM edges e JOIN {prev} lv ON e.v = lv.node
                GROUP BY 1, 2
            ) WHERE rk = 1
        ) w ON n.node = w.node
    )""")
        prev = f"l{i}"
    return f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), {", ".join(ls)},
    sizes AS (
        SELECT lbl, CAST(COUNT(*) AS BIGINT) AS comm_size FROM {prev} GROUP BY 1
    ), ncomm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_communities FROM sizes
    )
    SELECT l.node AS partkey, l.lbl AS community, s.comm_size, n.n_communities
    FROM {prev} l JOIN sizes s ON l.lbl = s.lbl CROSS JOIN ncomm n
    """


@register(
    "q349_label_propagation",
    oracle=_lpa_oracle(),
    survey_ref="extension: label-propagation community detection on "
    "the co-purchase graph (q294's edge set) — synchronous LPA, "
    f"{_LPA_ROUNDS} unrolled rounds, each node adopting its "
    "neighborhood's most frequent label with deterministic "
    "smallest-label tie-break; complements q66 (connected components "
    "find REACHABILITY, LPA finds DENSITY) and q294 (which scores a "
    "GIVEN partition — LPA produces one)",
)
def q349_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation: every part starts as its own
    community; each round, a node adopts the most frequent label among
    its co-purchase neighbors (ties → smallest label; isolated nodes
    keep their own). Three unrolled rounds — the documented contract,
    like q110/q348. Everything is exact integer counts + a
    deterministic argmax window, so the result is engine-reproducible
    without any randomized update order.

    Scale: the edge build is the one expensive stage (self-join on
    orderkey — bounded per-order fan-out); it caches once and each
    round is one edge⋈label join + count + per-node argmax, all
    shuffle-partitioned by node."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .cache()  # reused by every propagation round
    )
    labels = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_partkey").alias("lbl")
    )
    for _ in range(_LPA_ROUNDS):
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy("u", "lbl")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        wu = Window.partitionBy("u").orderBy(F.desc("cnt"), F.col("lbl"))
        win = (
            nbr.select("u", "lbl", F.row_number().over(wu).alias("rk"))
            .filter(F.col("rk") == 1)
            .select(F.col("u").alias("node"), F.col("lbl").alias("wlbl"))
        )
        labels = labels.join(win, "node", "left").select(
            "node", F.coalesce(F.col("wlbl"), F.col("lbl")).alias("lbl")
        )
    labels = labels.cache()
    sizes = labels.groupBy("lbl").agg(F.count("*").cast("long").alias("comm_size"))
    ncomm = sizes.agg(F.count("*").cast("long").alias("n_communities"))
    return (
        labels.join(sizes, "lbl")
        .crossJoin(F.broadcast(ncomm))
        .select(
            F.col("node").alias("partkey"),
            F.col("lbl").alias("community"),
            "comm_size",
            "n_communities",
        )
    )


@register(
    "q350_croston",
    oracle="""
    WITH weekly AS (
        SELECT l_partkey AS partkey,
               CAST(datediff('day', DATE '1995-01-01', l_shipdate) // 7
                    AS BIGINT) AS wk,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), folded AS (
        SELECT partkey, CAST(COUNT(*) AS BIGINT) AS n_episodes,
               CAST(SUM(q) AS BIGINT) AS total_qty,
               list_reduce(
                   list_prepend(
                       struct_pack(z := CAST(0e0 AS DOUBLE),
                                   p := CAST(0e0 AS DOUBLE),
                                   pw := CAST(-1e0 AS DOUBLE)),
                       list(struct_pack(z := CAST(q AS DOUBLE),
                                        p := CAST(wk AS DOUBLE),
                                        pw := CAST(0e0 AS DOUBLE))
                            ORDER BY wk)),
                   (acc, e) -> CASE WHEN acc.pw < 0e0
                       THEN struct_pack(z := e.z, p := e.p + 1e0, pw := e.p)
                       ELSE struct_pack(
                           z := acc.z + 0.2e0 * (e.z - acc.z),
                           p := acc.p + 0.2e0 * ((e.p - acc.pw) - acc.p),
                           pw := e.p) END) AS st
        FROM weekly GROUP BY 1
    )
    SELECT partkey, n_episodes, total_qty,
           st.z AS size_ema, st.p AS interval_ema,
           st.z / st.p AS demand_rate
    FROM folded
    """,
    survey_ref="extension: Croston's method for intermittent demand — "
    "separate exponential smoothing (α=0.2) of demand SIZES and "
    "inter-demand INTERVALS per part, forecast = size/interval; the "
    "sparse-series forecaster q212/q238's dense-series smoothers "
    "mishandle (zeros drag a plain EMA to zero); the sequential "
    "recurrence runs as a struct-accumulator fold in week order",
)
def q350_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston per part over weekly demand: z ← z + α(q−z) on episode
    sizes, p ← p + α(i−p) on the gaps between demand weeks (first
    episode seeds z with its size and p with its 1-based week). The
    recurrence is inherently sequential, so it folds a per-part sorted
    (week, qty) array through a struct accumulator — both engines run
    the identical CASE/arithmetic sequence from the identical seed, and
    α = 0.2 parses to the same double.

    Scale: the weekly rollup is the only fact-sized stage; per-part
    arrays hold that part's DEMAND weeks only (sparse by construction),
    and the fold is Arrow-free JVM/native work on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    weekly = (
        li.select(
            F.col("l_partkey").alias("partkey"),
            F.expr(
                "CAST(datediff(l_shipdate, DATE '1995-01-01') div 7 AS BIGINT)"
            ).alias("wk"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("partkey", "wk")
        .agg(F.sum("q").cast("long").alias("q"))
    )
    seed = F.struct(
        F.lit(0.0).alias("z"), F.lit(0.0).alias("p"), F.lit(-1.0).alias("pw")
    )
    # week must be the FIRST struct field: array_sort orders struct
    # arrays lexicographically by field position, and the fold order
    # contract is ascending week (weeks are distinct per part)
    elems = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("wk").cast("double").alias("p"),
                F.col("q").cast("double").alias("z"),
                F.lit(0.0).alias("pw"),
            )
        )
    )

    def step(acc, e):
        first = F.struct(
            e["z"].alias("z"), (e["p"] + F.lit(1.0)).alias("p"), e["p"].alias("pw")
        )
        rest = F.struct(
            (acc["z"] + F.lit(0.2) * (e["z"] - acc["z"])).alias("z"),
            (acc["p"] + F.lit(0.2) * ((e["p"] - acc["pw"]) - acc["p"])).alias("p"),
            e["p"].alias("pw"),
        )
        return F.when(acc["pw"] < 0.0, first).otherwise(rest)

    folded = weekly.groupBy("partkey").agg(
        F.count("*").cast("long").alias("n_episodes"),
        F.sum("q").cast("long").alias("total_qty"),
        F.aggregate(elems, seed, step).alias("st"),
    )
    return folded.select(
        "partkey",
        "n_episodes",
        "total_qty",
        F.col("st.z").alias("size_ema"),
        F.col("st.p").alias("interval_ema"),
        (F.col("st.z") / F.col("st.p")).alias("demand_rate"),
    )


@register(
    "q351_stl_decompose",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, isodow(CAST(ts AS DATE)) - 1 AS wd,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ), ma AS (
        SELECT d, wd, cents,
               CAST(SUM(cents) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
               CAST(COUNT(*) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS c7
        FROM daily
    ), full7 AS (
        SELECT d, wd, cents, s7, 7 * cents - s7 AS det7
        FROM ma WHERE c7 = 7
    ), seas AS (
        SELECT wd, CAST(SUM(det7) AS BIGINT) AS snum,
               CAST(COUNT(*) AS BIGINT) AS scnt
        FROM full7 GROUP BY 1
    )
    SELECT strftime(f.d, '%Y-%m-%d') AS day, CAST(f.wd AS BIGINT) AS weekday,
           f.cents AS total_cents,
           CAST(f.s7 AS DOUBLE) / 7e0 AS trend,
           CAST(f_s.snum AS DOUBLE) / CAST(7 * f_s.scnt AS DOUBLE) AS seasonal,
           CAST(f.cents AS DOUBLE) - CAST(f.s7 AS DOUBLE) / 7e0
               - CAST(f_s.snum AS DOUBLE) / CAST(7 * f_s.scnt AS DOUBLE)
               AS residual
    FROM full7 f JOIN seas f_s ON f.wd = f_s.wd
    """,
    survey_ref="extension: STL-lite trend/seasonal/residual "
    "decomposition of the daily event-value series — centered 7-day "
    "moving-average trend, per-weekday mean of the detrended series as "
    "the seasonal component; detrended values stay EXACT BIGINTs by "
    "working with 7·x − Σ7 instead of x − Σ7/7, so the seasonal means "
    "need no pinned folds",
)
def q351_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition of daily event value: trend = centered
    7-day MA (full windows only), seasonal = per-weekday mean of the
    detrended series, residual = the rest. The integer trick: detrended
    ×7 (7·cents − Σ7) is an exact BIGINT, so the per-weekday seasonal
    mean is an exact integer ratio — division happens once per output
    row, keeping every double a correctly-rounded function of exact
    integers with NO order-sensitive double sums anywhere.

    Scale: one day-grain aggregate; the MA window orders by day (a
    range-partitionable sort at scale); weekday means reduce 7 rows."""
    ev = load_events(spark, sf_dir)
    daily = (
        ev.select(
            F.to_date("ts").alias("d"),
            (_dec("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .select("d", F.weekday("d").alias("wd"), "cents")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    ma = daily.select(
        "d",
        "wd",
        "cents",
        F.sum("cents").over(w7).cast("long").alias("s7"),
        F.count("*").over(w7).cast("long").alias("c7"),
    )
    full7 = ma.filter(F.col("c7") == 7).select(
        "d", "wd", "cents", "s7", (7 * F.col("cents") - F.col("s7")).alias("det7")
    ).cache()  # ≤ day-count rows; seasonal means and output reuse it
    seas = full7.groupBy("wd").agg(
        F.sum("det7").cast("long").alias("snum"),
        F.count("*").cast("long").alias("scnt"),
    )
    trend = F.col("s7").cast("double") / F.lit(7.0)
    seasonal = F.col("snum").cast("double") / (7 * F.col("scnt")).cast("double")
    return full7.join(F.broadcast(seas), "wd").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("wd").cast("long").alias("weekday"),
        F.col("cents").alias("total_cents"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("cents").cast("double") - trend - seasonal).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Batch 35 (round 5): portable exp + EWMA control chart, lift curve,
# runs test, two-way ANOVA
# ---------------------------------------------------------------------------

_PEXP_COEFFS = [1.0 / _math.factorial(n) for n in range(12, -1, -1)]  # c12..c0


def _pexp_ctes(src: str, x: str, out: str, tag: str) -> str:
    """CTE chain computing ``out`` = portable exp(x) from relation
    ``src`` (x a double column already bit-identical across engines,
    |x| ≲ 43 — callers in this file satisfy that by construction; more
    negative x returns exactly 0, the IEEE-underflow-adjacent branch
    both engines take identically).

    Same discipline as _pln_ctes: range-reduce with k = ⌊x/ln2 + ½⌋ so
    r = x − k·ln2 has |r| ≤ ln2/2, evaluate exp(r) by a 13-term
    factorial-reciprocal Horner (literals parse to identical doubles;
    tail ≤ r¹³/13! ≈ 2e-16), then scale by the EXACT power of two
    2^k built from integer shifts. Every step is exact-operand IEEE
    arithmetic ⇒ bit-identical across engines."""
    poly = f"CAST('{_PEXP_COEFFS[0]!r}' AS DOUBLE)"
    for c in _PEXP_COEFFS[1:]:
        poly = f"(CAST('{c!r}' AS DOUBLE) + {tag}_r * {poly})"
    return f"""{tag}_a AS (
        SELECT *, CAST(floor({x} / {_PLN_LN2!r}e0 + 5e-1) AS BIGINT) AS {tag}_k
        FROM {src}
    ), {tag}_b AS (
        SELECT *, {x} - CAST({tag}_k AS DOUBLE) * {_PLN_LN2!r}e0 AS {tag}_r
        FROM {tag}_a
    ), {tag}_c AS (
        SELECT *, {poly} AS {tag}_p FROM {tag}_b
    ), {tag} AS (
        SELECT *, CASE
            WHEN {tag}_k < -62 THEN 0e0
            WHEN {tag}_k >= 0
                THEN {tag}_p * CAST(CAST(1 AS BIGINT) << {tag}_k AS DOUBLE)
            ELSE {tag}_p / CAST(CAST(1 AS BIGINT) << (-{tag}_k) AS DOUBLE)
        END AS {out}
        FROM {tag}_c
    )"""


def _pexp_stage(df: DataFrame, x: str, out: str, tag: str) -> DataFrame:
    """Spark twin of _pexp_ctes — same operand sequence, staged through
    named columns (see _pln_stage for why staging matters)."""
    k, r, p = f"{tag}_k", f"{tag}_r", f"{tag}_p"
    df = df.withColumn(
        k, F.floor(F.col(x) / F.lit(_PLN_LN2) + F.lit(0.5)).cast("long")
    )
    df = df.withColumn(r, F.col(x) - F.col(k).cast("double") * F.lit(_PLN_LN2))
    poly = F.lit(_PEXP_COEFFS[0])
    for c in _PEXP_COEFFS[1:]:
        poly = F.lit(c) + F.col(r) * poly
    df = df.withColumn(p, poly)
    one = F.lit(1).cast("long")
    df = df.withColumn(
        out,
        F.when(F.col(k) < -62, F.lit(0.0))
        .when(
            F.col(k) >= 0,
            F.col(p)
            * F.call_function("shiftleft", one, F.col(k)).cast("double"),
        )
        .otherwise(
            F.col(p)
            / F.call_function("shiftleft", one, -F.col(k)).cast("double")
        ),
    )
    return df.drop(k, r, p)


@register(
    "q352_ewma_control",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT d, y,
               CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
        FROM daily
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM idx
    ), mu AS (
        SELECT n, CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               sqrt((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sigma
        FROM stats
    ), arr AS (
        SELECT list(struct_pack(t := t, y := CAST(y AS DOUBLE)) ORDER BY t) AS a
        FROM idx
    ), zt AS (
        SELECT i.d, i.t, i.y, m.mu, m.sigma,
               list_reduce(
                   list_prepend(m.mu,
                       list_transform(list_filter(ar.a, e -> e.t <= i.t),
                                      e -> e.y)),
                   (acc, yv) -> 8e-1 * acc + 2e-1 * yv) AS z,
               2e0 * CAST(i.t AS DOUBLE) * (-2.2314355131420976e-1)
                   AS xarg
        FROM idx i CROSS JOIN mu m CROSS JOIN arr ar
    ), {_pexp_ctes("zt", "xarg", "pw", "pe")},
    lim AS (
        SELECT d, t, y, mu, sigma, z,
               sigma * sqrt(2e0 / (2e0 - 2e-1) * 1e-1 * (1e0 - pw)) AS halfw
        FROM pe
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, t, y, z AS ewma,
           mu + 3e0 * halfw AS ucl, mu - 3e0 * halfw AS lcl,
           z > mu + 3e0 * halfw OR z < mu - 3e0 * halfw AS violation
    FROM lim
    """,
    survey_ref="extension: EWMA control chart over daily order volume "
    "(λ=0.2, L=3) — the drift monitor q210's CUSUM complements: "
    "time-varying control limits need (1−λ)^{2t}, computed as "
    "portable-exp(2t·ln(4/5)) with ln(4/5) a correctly-rounded host "
    "literal; the EWMA recursion folds the day series prefix in order",
)
def q352_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart: z_t = 0.8·z_{t−1} + 0.2·y_t seeded at the
    series mean, flagged against μ ± 3σ·√(λ/(2−λ)·(1−(1−λ)^{2t})).
    The recursion is sequential, so each day folds the ≤t prefix of one
    broadcast (t, y) array (O(n²) lambda steps on a day-grain series —
    constant work at any fact scale); the exact-integer day counts make
    μ and σ correctly-rounded functions of BIGINT sums; (0.8)^{2t}
    goes through the portable-exp primitive so the limits hash-match.

    Scale: one day-grain aggregate is the only fact-sized stage."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    wt = Window.orderBy("d")
    idx = daily.select(
        "d", "y", F.row_number().over(wt).cast("long").alias("t")
    ).cache()  # day-grain; stats/array/output reuse one orders scan
    stats = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n_d = F.col("n").cast("double")
    mu = stats.select(
        "n",
        (F.col("sy").cast("double") / n_d).alias("mu"),
        F.sqrt(
            (
                n_d * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy").cast("double")
            )
            / (n_d * n_d)
        ).alias("sigma"),
    )
    arr = idx.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("t").alias("t"), F.col("y").cast("double").alias("y"))
            )
        ).alias("a")
    )
    zt = idx.crossJoin(F.broadcast(mu)).crossJoin(F.broadcast(arr))
    z = F.aggregate(
        F.transform(
            F.filter(F.col("a"), lambda e: e["t"] <= F.col("t")),
            lambda e: e["y"],
        ),
        F.col("mu"),
        lambda acc, yv: F.lit(0.8) * acc + F.lit(0.2) * yv,
    )
    # ln(4/5), correctly rounded (repr(math.log(0.8)))
    ln45 = F.lit(-0.22314355131420976)
    zt = zt.select(
        "d",
        "t",
        "y",
        "mu",
        "sigma",
        z.alias("z"),
        (F.lit(2.0) * F.col("t").cast("double") * ln45).alias("xarg"),
    )
    zt = _pexp_stage(zt, "xarg", "pw", "pe")
    halfw = F.col("sigma") * F.sqrt(
        F.lit(2.0) / (F.lit(2.0) - F.lit(0.2)) * F.lit(0.1) * (F.lit(1.0) - F.col("pw"))
    )
    lim = zt.select("d", "t", "y", "mu", "z", halfw.alias("halfw"))
    ucl = F.col("mu") + F.lit(3.0) * F.col("halfw")
    lcl = F.col("mu") - F.lit(3.0) * F.col("halfw")
    return lim.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "t",
        "y",
        F.col("z").alias("ewma"),
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((F.col("z") > ucl) | (F.col("z") < lcl)).alias("violation"),
    )


@register(
    "q353_lift_curve",
    oracle="""
    WITH cells AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 100000 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM orders GROUP BY 1
    ), cum AS (
        SELECT bucket, n, pos,
               CAST(SUM(n) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_n,
               CAST(SUM(pos) OVER (ORDER BY bucket DESC) AS BIGINT) AS cum_pos
        FROM cells
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS np
        FROM cells
    )
    SELECT c.bucket, c.n, c.pos, c.cum_n, c.cum_pos,
           CAST(c.cum_n AS DOUBLE) / CAST(t.nn AS DOUBLE) AS depth,
           CAST(c.cum_pos AS DOUBLE) / CAST(t.np AS DOUBLE) AS gain,
           (CAST(c.cum_pos AS DOUBLE) / CAST(c.cum_n AS DOUBLE))
               / (CAST(t.np AS DOUBLE) / CAST(t.nn AS DOUBLE)) AS lift
    FROM cum c CROSS JOIN tot t
    """,
    survey_ref="extension: cumulative gains/lift curve for a response "
    "score ($1000 price buckets, descending) — the response-model "
    "counterpart of q322's treatment-uplift Qini: gain = share of all "
    "positives captured at each depth, lift = capture rate vs the base "
    "rate; every point is an exact integer ratio (no decile splitting, "
    "so no within-cell uniformity assumption)",
)
def q353_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift curve at natural score breakpoints: bucket the score
    (order value, $1000 buckets), prefix-sum counts and positives in
    DESCENDING score order, and emit depth/gain/lift per bucket — all
    exact BIGINT ratios, no per-row ranking and no fractional decile
    splits. Reading: gain(depth) far above the diagonal = the score
    concentrates fulfilled orders at the top.

    Scale: one map-side-combinable aggregate to ~500 buckets, one
    window over those buckets, constant arithmetic after."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            F.expr(
                "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " div 100000 AS BIGINT)"
            ).alias("bucket"),
            (F.col("o_orderstatus") == "F").cast("int").alias("isf"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("isf").cast("long").alias("pos"),
        )
        .cache()  # ≤~500 rows; window, totals and output reuse one scan
    )
    wd = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select(
        "bucket",
        "n",
        "pos",
        F.sum("n").over(wd).cast("long").alias("cum_n"),
        F.sum("pos").over(wd).cast("long").alias("cum_pos"),
    )
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("pos").cast("long").alias("np")
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n",
        "pos",
        "cum_n",
        "cum_pos",
        (F.col("cum_n").cast("double") / F.col("nn").cast("double")).alias("depth"),
        (F.col("cum_pos").cast("double") / F.col("np").cast("double")).alias(
            "gain"
        ),
        (
            (F.col("cum_pos").cast("double") / F.col("cum_n").cast("double"))
            / (F.col("np").cast("double") / F.col("nn").cast("double"))
        ).alias("lift"),
    )


@register(
    "q354_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
        FROM lineitem GROUP BY 1
    ), med AS (
        SELECT quantile_cont(y, 0.5) AS m FROM daily
    ), signs AS (
        SELECT d, CASE WHEN y > m THEN 1 ELSE 0 END AS s
        FROM daily CROSS JOIN med
        WHERE CAST(y AS DOUBLE) <> m
    ), runs0 AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                         OR LAG(s) OVER (ORDER BY d) <> s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ), agg AS (
        SELECT CAST(SUM(s) AS BIGINT) AS n1,
               CAST(SUM(1 - s) AS BIGINT) AS n2,
               CAST(SUM(new_run) AS BIGINT) AS runs
        FROM runs0
    )
    SELECT n1 AS n_above, n2 AS n_below, runs,
           CASE WHEN n1 = 0 OR n2 = 0 THEN 0e0 ELSE
           1e0 + 2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               / CAST(n1 + n2 AS DOUBLE) END AS expected_runs,
           CASE WHEN n1 = 0 OR n2 = 0 THEN 0e0 ELSE
           (2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
            * (2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
               - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
               / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                  * CAST(n1 + n2 - 1 AS DOUBLE)) END AS var_runs,
           CASE WHEN n1 = 0 OR n2 = 0 THEN 0e0 ELSE
           (CAST(runs AS DOUBLE)
            - (1e0 + 2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     / CAST(n1 + n2 AS DOUBLE)))
               / sqrt((2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                       * (2e0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
                      / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                         * CAST(n1 + n2 - 1 AS DOUBLE))) END AS z
    FROM agg
    """,
    survey_ref="extension: Wald–Wolfowitz runs test on daily order "
    "volume vs its median — tests RANDOMNESS of the sequence itself "
    "(too few runs = clustering/trend, too many = oscillation), the "
    "dimension q280's Mann–Kendall (monotone trend only) can't see; "
    "the median comes from the q42-proven exact-median parity",
)
def q354_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test: days above/below the median order count form a ±
    sequence; R = number of maximal same-sign runs (a lag comparison),
    z = (R − E[R])/√Var under the exchangeability null. Ties with the
    median are dropped (the standard convention); all counts are exact
    BIGINTs and the statistic is one mirrored double expression.

    Scale: day-grain aggregate + one ordered window over days."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    ).cache()  # day-grain; median branch and signs reuse one scan
    med = daily.agg(F.percentile(F.col("y"), F.lit(0.5)).alias("m"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y").cast("double") != F.col("m"))
        .select("d", F.when(F.col("y") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    wd = Window.orderBy("d")
    runs0 = signs.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull() | (F.lag("s").over(wd) != F.col("s")), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs0.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("runs"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    ns = (F.col("n1") + F.col("n2")).cast("double")
    degenerate = (F.col("n1") == 0) | (F.col("n2") == 0)
    exp_r = F.lit(1.0) + F.lit(2.0) * n1 * n2 / ns
    var_r = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
    ) / (ns * ns * (F.col("n1") + F.col("n2") - 1).cast("double"))
    z = (F.col("runs").cast("double") - exp_r) / F.sqrt(var_r)
    return agg.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        "runs",
        F.when(degenerate, F.lit(0.0)).otherwise(exp_r).alias("expected_runs"),
        F.when(degenerate, F.lit(0.0)).otherwise(var_r).alias("var_runs"),
        F.when(degenerate, F.lit(0.0)).otherwise(z).alias("z"),
    )


@register(
    "q355_two_way_anova",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS a, l_linestatus AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s
        FROM lineitem GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(s) AS BIGINT) AS ss,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM cells
    ), sst0 AS (
        SELECT CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS syy
        FROM lineitem
    ), fa AS (
        SELECT a, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
        FROM cells GROUP BY 1
    ), fb AS (
        SELECT b, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s
        FROM cells GROUP BY 1
    ), folds AS (
        SELECT
            (SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                 list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      ORDER BY a)), (x, y) -> x + y) FROM fa) AS qa,
            (SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                 list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      ORDER BY b)), (x, y) -> x + y) FROM fb) AS qb,
            (SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                 list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      ORDER BY a, b)), (x, y) -> x + y) FROM cells) AS qc,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM fa) AS ka,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM fb) AS kb
    ), stats AS (
        SELECT t.nn, t.n_cells, f.ka, f.kb,
               CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
                   / CAST(t.nn AS DOUBLE) AS cm,
               f.qa, f.qb, f.qc, CAST(y.syy AS DOUBLE) AS syy
        FROM tot t CROSS JOIN folds f CROSS JOIN sst0 y
    ), ssq AS (
        SELECT nn, n_cells, ka, kb,
               qa - cm AS ssa, qb - cm AS ssb,
               qc - qa - qb + cm AS ssab,
               syy - qc AS sse, syy - cm AS sst
        FROM stats
    )
    SELECT c.a AS returnflag, c.b AS linestatus, c.n,
           CAST(c.s AS DOUBLE) / CAST(c.n AS DOUBLE) AS cell_mean,
           q.ssa AS ss_factor_a, q.ssb AS ss_factor_b,
           q.ssab AS ss_interaction, q.sse AS ss_error,
           (q.ssa / CAST(q.ka - 1 AS DOUBLE))
               / (q.sse / CAST(q.nn - q.n_cells AS DOUBLE)) AS f_a,
           (q.ssb / CAST(q.kb - 1 AS DOUBLE))
               / (q.sse / CAST(q.nn - q.n_cells AS DOUBLE)) AS f_b,
           (q.ssab / CAST((q.ka - 1) * (q.kb - 1) AS DOUBLE))
               / (q.sse / CAST(q.nn - q.n_cells AS DOUBLE)) AS f_interaction
    FROM cells c CROSS JOIN ssq q
    """,
    survey_ref="extension: two-way ANOVA (returnflag × linestatus on "
    "quantity) with interaction — the factorial extension of q333, "
    "classical weighted (Type I) decomposition SSA/SSB/SSAB/SSE from "
    "exact BIGINT cell sums; F ratios against the within-cell error",
)
def q355_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction: cell/margin quadratic forms
    Σ S²/n fold in pinned order (the q333 discipline, one fold per
    margin plus one for cells); SSAB = SS_cells − SSA − SSB (classical
    weighted decomposition — exact only under proportional cell counts,
    the documented contract for unbalanced data) and SSE = SST −
    SS_cells. Output one row per cell with the shared F statistics.

    Scale: one map-side-combinable aggregate over lineitem plus one
    Σy² pass; everything else touches ≤6 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    cells = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(q).cast("long").alias("s"),
    ).cache()  # ≤6 rows; margins, folds and output reuse one scan
    tot = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("ss"),
        F.count("*").cast("long").alias("n_cells"),
    )
    syy = li.agg(F.sum(q * q).cast("long").alias("syy"))
    fa = cells.groupBy("a").agg(
        F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s")
    )
    fb = cells.groupBy("b").agg(
        F.sum("n").cast("long").alias("n"), F.sum("s").cast("long").alias("s")
    )
    qform = F.col("s").cast("double") * F.col("s").cast("double") / F.col(
        "n"
    ).cast("double")
    qa = fa.agg(
        _fold_col(["a"], qform).alias("qa"), F.count("*").cast("long").alias("ka")
    )
    qb = fb.agg(
        _fold_col(["b"], qform).alias("qb"), F.count("*").cast("long").alias("kb")
    )
    qc = cells.agg(_fold_col(["a", "b"], qform).alias("qc"))
    stats = (
        tot.crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(qb))
        .crossJoin(F.broadcast(qc))
        .crossJoin(F.broadcast(syy))
        .select(
            "nn",
            "n_cells",
            "ka",
            "kb",
            "qa",
            "qb",
            "qc",
            F.col("syy").cast("double").alias("syy"),
            (
                F.col("ss").cast("double")
                * F.col("ss").cast("double")
                / F.col("nn").cast("double")
            ).alias("cm"),
        )
    )
    ssq = stats.select(
        "nn",
        "n_cells",
        "ka",
        "kb",
        (F.col("qa") - F.col("cm")).alias("ssa"),
        (F.col("qb") - F.col("cm")).alias("ssb"),
        (F.col("qc") - F.col("qa") - F.col("qb") + F.col("cm")).alias("ssab"),
        (F.col("syy") - F.col("qc")).alias("sse"),
        (F.col("syy") - F.col("cm")).alias("sst"),
    )
    mse = F.col("sse") / (F.col("nn") - F.col("n_cells")).cast("double")
    return cells.crossJoin(F.broadcast(ssq)).select(
        F.col("a").alias("returnflag"),
        F.col("b").alias("linestatus"),
        "n",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("cell_mean"),
        F.col("ssa").alias("ss_factor_a"),
        F.col("ssb").alias("ss_factor_b"),
        F.col("ssab").alias("ss_interaction"),
        F.col("sse").alias("ss_error"),
        ((F.col("ssa") / (F.col("ka") - 1).cast("double")) / mse).alias("f_a"),
        ((F.col("ssb") / (F.col("kb") - 1).cast("double")) / mse).alias("f_b"),
        (
            (
                F.col("ssab")
                / ((F.col("ka") - 1) * (F.col("kb") - 1)).cast("double")
            )
            / mse
        ).alias("f_interaction"),
    )


# ---------------------------------------------------------------------------
# Batch 36 (round 5): logistic calibration (Newton on aggregates),
# log-rank survival comparison, Cochran's Q, log-log elasticity
# ---------------------------------------------------------------------------

_PLATT_ROUNDS = 3


def _platt_round_ctes(i: int, prev: str) -> str:
    """One Newton-Raphson round over the score cells: logits at the
    current (A, B), sigmoid via portable-exp, gradient/Hessian folds,
    exact 2x2 solve."""
    return f"""r{i}_t AS (
        SELECT c.s, c.n, c.ypos, p.aa, p.bb,
               p.aa * CAST(c.s AS DOUBLE) + p.bb AS tlin
        FROM cells c CROSS JOIN {prev} p
    ), {_pexp_ctes(f"r{i}_t", "tlin", "et", f"r{i}e")},
    r{i}_p AS (
        SELECT s, n, ypos, aa, bb, et / (1e0 + et) AS pp FROM r{i}e
    ), r{i}_g AS (
        SELECT
            {_fold_sql("CAST(n AS DOUBLE) * pp * CAST(s AS DOUBLE)", "s")} AS gpa,
            {_fold_sql("CAST(n AS DOUBLE) * pp", "s")} AS gpb,
            {_fold_sql("CAST(n AS DOUBLE) * pp * (1e0 - pp) * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)", "s")} AS haa,
            {_fold_sql("CAST(n AS DOUBLE) * pp * (1e0 - pp) * CAST(s AS DOUBLE)", "s")} AS hab,
            {_fold_sql("CAST(n AS DOUBLE) * pp * (1e0 - pp)", "s")} AS hbb,
            CAST(SUM(ypos * s) AS BIGINT) AS oys,
            CAST(SUM(ypos) AS BIGINT) AS oy,
            MAX(aa) AS aa, MAX(bb) AS bb
        FROM r{i}_p
    ), p{i} AS (
        SELECT
            aa - ((gpa - CAST(oys AS DOUBLE)) * hbb
                  - (gpb - CAST(oy AS DOUBLE)) * hab)
                 / (haa * hbb - hab * hab) AS aa,
            bb - ((gpb - CAST(oy AS DOUBLE)) * haa
                  - (gpa - CAST(oys AS DOUBLE)) * hab)
                 / (haa * hbb - hab * hab) AS bb
        FROM r{i}_g
    )"""


def _platt_oracle(rounds: int = _PLATT_ROUNDS) -> str:
    blocks = []
    prev = "p0"
    for i in range(1, rounds + 1):
        blocks.append(_platt_round_ctes(i, prev))
        prev = f"p{i}"
    return f"""
    WITH raw AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 5000000 AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ), cells AS (
        SELECT least(s, 9) AS s, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS ypos
        FROM raw GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(ypos) AS BIGINT) AS np,
               CAST(SUM(n - ypos) AS BIGINT) AS nm
        FROM cells
    ), b0 AS (
        SELECT np + 1 AS bn, nm + 1 AS bd FROM tot
    ), {_pln_ctes("b0", "bn", "bd", "lnb", "pb0")},
    p0 AS (
        SELECT 0e0 AS aa, lnb AS bb FROM pb0
    ), {", ".join(blocks)},
    {_platt_final_ctes(prev)}
    SELECT c.s AS score_bucket, c.n, c.ypos,
           CAST(c.ypos AS DOUBLE) / CAST(c.n AS DOUBLE) AS emp_rate,
           f.pp AS calibrated_p, f.aa AS coef_a, f.bb AS coef_b
    FROM fin f JOIN cells c ON f.s = c.s
    """


def _platt_final_ctes(prev: str) -> str:
    return f"""fin0 AS (
        SELECT c.s, p.aa, p.bb, p.aa * CAST(c.s AS DOUBLE) + p.bb AS tlin
        FROM cells c CROSS JOIN {prev} p
    ), {_pexp_ctes("fin0", "tlin", "et", "fe")},
    fin AS (
        SELECT s, aa, bb, et / (1e0 + et) AS pp FROM fe
    )"""


@register(
    "q356_logistic_calibration",
    oracle=_platt_oracle(),
    survey_ref="extension: Platt-style logistic calibration — fit "
    "P(fulfilled | score) = sigmoid(A·s + B) by "
    f"{_PLATT_ROUNDS} unrolled Newton-Raphson rounds computed ENTIRELY "
    "on score-cell aggregates (gradient and Hessian are sums over ~10 "
    "cells, the exact 2x2 solve is closed-form); the sigmoid goes "
    "through portable-exp, the intercept seed through portable-ln — "
    "the parametric upgrade of q315's isotonic fit",
)
def q356_logistic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic (Platt) calibration of the order-value score against
    fulfillment: Newton-Raphson on the two-parameter log-likelihood,
    where every round needs only Σ n·p, Σ n·p·s, Σ n·p(1−p)·{1,s,s²}
    over the 10 score cells — folds in score order — plus the exact
    integer outcome sums. Rounds are UNROLLED (the q310/q348 contract);
    A starts at 0 and B at Platt's ln((N₊+1)/(N₋+1)).

    Scale: one fact-sized aggregate to 10 cells; each Newton round is
    constant-size arithmetic, so the fit costs the same at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            F.least(
                F.expr(
                    "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                    " div 5000000 AS BIGINT)"
                ),
                F.lit(9).cast("long"),
            ).alias("s"),
            (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("y").cast("long").alias("ypos"),
        )
        .cache()  # ≤10 rows; every Newton round reuses one orders scan
    )
    tot = cells.agg(
        F.sum("ypos").cast("long").alias("np"),
        F.sum(F.col("n") - F.col("ypos")).cast("long").alias("nm"),
    )
    b0 = tot.select((F.col("np") + 1).alias("bn"), (F.col("nm") + 1).alias("bd"))
    b0 = _pln_stage(b0, "bn", "bd", "lnb", "pb0")
    params = b0.select(F.lit(0.0).alias("aa"), F.col("lnb").alias("bb"))
    for i in range(1, _PLATT_ROUNDS + 1):
        rt = cells.crossJoin(F.broadcast(params)).withColumn(
            "tlin", F.col("aa") * F.col("s").cast("double") + F.col("bb")
        )
        rt = _pexp_stage(rt, "tlin", "et", f"r{i}e")
        rp = rt.withColumn("pp", F.col("et") / (F.lit(1.0) + F.col("et")))
        n_d = F.col("n").cast("double")
        s_d = F.col("s").cast("double")
        w = n_d * F.col("pp") * (F.lit(1.0) - F.col("pp"))
        g = rp.agg(
            _fold_col(["s"], n_d * F.col("pp") * s_d).alias("gpa"),
            _fold_col(["s"], n_d * F.col("pp")).alias("gpb"),
            _fold_col(["s"], w * s_d * s_d).alias("haa"),
            _fold_col(["s"], w * s_d).alias("hab"),
            _fold_col(["s"], w).alias("hbb"),
            F.sum(F.col("ypos") * F.col("s")).cast("long").alias("oys"),
            F.sum("ypos").cast("long").alias("oy"),
            F.max("aa").alias("aa"),
            F.max("bb").alias("bb"),
        )
        det = F.col("haa") * F.col("hbb") - F.col("hab") * F.col("hab")
        ga = F.col("gpa") - F.col("oys").cast("double")
        gb = F.col("gpb") - F.col("oy").cast("double")
        params = g.select(
            (F.col("aa") - (ga * F.col("hbb") - gb * F.col("hab")) / det).alias(
                "aa"
            ),
            (F.col("bb") - (gb * F.col("haa") - ga * F.col("hab")) / det).alias(
                "bb"
            ),
        )
    fin0 = cells.crossJoin(F.broadcast(params)).withColumn(
        "tlin", F.col("aa") * F.col("s").cast("double") + F.col("bb")
    )
    fin0 = _pexp_stage(fin0, "tlin", "et", "fe")
    return fin0.select(
        F.col("s").alias("score_bucket"),
        "n",
        "ypos",
        (F.col("ypos").cast("double") / F.col("n").cast("double")).alias(
            "emp_rate"
        ),
        (F.col("et") / (F.lit(1.0) + F.col("et"))).alias("calibrated_p"),
        F.col("aa").alias("coef_a"),
        F.col("bb").alias("coef_b"),
    )


@register(
    "q357_logrank_test",
    oracle="""
    WITH cust AS (
        SELECT o.o_custkey,
               CAST((year(max(o.o_orderdate)) - year(min(o.o_orderdate))) * 4
                    + (quarter(max(o.o_orderdate))
                       - quarter(min(o.o_orderdate))) AS BIGINT) AS t,
               CASE WHEN max(o.o_orderdate) >= TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END AS censored,
               CASE WHEN max(c.c_mktsegment) = 'BUILDING'
                    THEN 1 ELSE 0 END AS grp
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ), hist AS (
        SELECT t, grp, CAST(SUM(1 - censored) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM cust GROUP BY 1, 2
    ), times AS (
        SELECT DISTINCT t FROM hist
    ), grid AS (
        SELECT tt.t, g.grp, COALESCE(h.d, 0) AS d, COALESCE(h.m, 0) AS m
        FROM times tt CROSS JOIN (SELECT 0 AS grp UNION ALL SELECT 1) g
        LEFT JOIN hist h ON tt.t = h.t AND g.grp = h.grp
    ), risk AS (
        SELECT t, grp, d,
               CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS BIGINT) AS n_at
        FROM grid
    ), wide AS (
        SELECT a.t, a.d AS d1, a.n_at AS n1, b.d AS d2, b.n_at AS n2
        FROM risk a JOIN risk b ON a.t = b.t AND a.grp = 1 AND b.grp = 0
    ), terms AS (
        SELECT t, d1, n1, d2, n2,
               CAST(d1 + d2 AS DOUBLE)
                   * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) AS e1,
               CASE WHEN n1 + n2 > 1 THEN
                   CAST(d1 + d2 AS DOUBLE)
                   * (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                   * (1e0 - CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                   * CAST(n1 + n2 - d1 - d2 AS DOUBLE)
                   / CAST(n1 + n2 - 1 AS DOUBLE)
               ELSE 0e0 END AS v
        FROM wide WHERE n1 + n2 > 0
    ), stat AS (
        SELECT CAST(SUM(d1) AS BIGINT) AS o1,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(e1 ORDER BY t)), (a, b) -> a + b) AS e1s,
               list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(v ORDER BY t)), (a, b) -> a + b) AS vs
        FROM terms
    )
    SELECT x.t AS tenure_q, x.d1 AS d_building, x.n1 AS risk_building,
           x.d2 AS d_other, x.n2 AS risk_other, x.e1 AS expected_building,
           s.o1 AS observed_total, s.e1s AS expected_total,
           (CAST(s.o1 AS DOUBLE) - s.e1s) * (CAST(s.o1 AS DOUBLE) - s.e1s)
               / s.vs AS logrank_chi2
    FROM terms x CROSS JOIN stat s
    """,
    survey_ref="extension: log-rank test — do BUILDING-segment "
    "customers churn on a different schedule than the rest? The "
    "two-sample comparison q341's Kaplan-Meier curve begs for: at each "
    "event time, observed-vs-hypergeometric-expected events in group 1, "
    "χ² = (O−E)²/V; same censoring convention as q341",
)
def q357_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel-Cox) test between two survival cohorts on the
    q341 tenure/censoring definitions. Per event time: d1, d2 events
    and n1, n2 at risk (suffix sums per group over the dense
    time×group grid), e1 = d·n1/n and the hypergeometric variance; the
    O−E and V totals fold in time order. Everything before the final
    ratios is exact BIGINT.

    Scale: customer-grain aggregate → ≤~60 grid rows; the suffix-sum
    windows partition by group."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    cust = (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("o_custkey")
        .agg(
            (
                (F.year(F.max("o_orderdate")) - F.year(F.min("o_orderdate"))) * 4
                + (
                    F.quarter(F.max("o_orderdate"))
                    - F.quarter(F.min("o_orderdate"))
                )
            )
            .cast("long")
            .alias("t"),
            F.when(
                F.max("o_orderdate") >= F.lit("2001-01-01").cast("timestamp_ntz"),
                1,
            )
            .otherwise(0)
            .alias("censored"),
            F.when(F.max("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("grp"),
        )
    )
    hist = cust.groupBy("t", "grp").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.count("*").cast("long").alias("m"),
    ).cache()  # ≤~60 rows; grid/suffix windows reuse one orders scan
    times = hist.select("t").distinct()
    grps = spark.range(2).select(F.col("id").cast("int").alias("grp"))
    grid = (
        times.crossJoin(F.broadcast(grps))
        .join(F.broadcast(hist), ["t", "grp"], "left")
        .select(
            "t",
            "grp",
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("d"),
            F.coalesce(F.col("m"), F.lit(0)).cast("long").alias("m"),
        )
    )
    wr = (
        Window.partitionBy("grp")
        .orderBy("t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    risk = grid.select(
        "t", "grp", "d", F.sum("m").over(wr).cast("long").alias("n_at")
    )
    a = risk.filter(F.col("grp") == 1).select(
        "t", F.col("d").alias("d1"), F.col("n_at").alias("n1")
    )
    b = risk.filter(F.col("grp") == 0).select(
        "t", F.col("d").alias("d2"), F.col("n_at").alias("n2")
    )
    nsum = (F.col("n1") + F.col("n2")).cast("double")
    frac = F.col("n1").cast("double") / nsum
    terms = (
        a.join(b, "t")
        .filter(F.col("n1") + F.col("n2") > 0)
        .select(
            "t",
            "d1",
            "n1",
            "d2",
            "n2",
            ((F.col("d1") + F.col("d2")).cast("double") * frac).alias("e1"),
            F.when(
                F.col("n1") + F.col("n2") > 1,
                (F.col("d1") + F.col("d2")).cast("double")
                * frac
                * (F.lit(1.0) - frac)
                * (F.col("n1") + F.col("n2") - F.col("d1") - F.col("d2")).cast(
                    "double"
                )
                / (F.col("n1") + F.col("n2") - 1).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
        .cache()  # ≤~30 rows; folds and output reuse it
    )
    stat = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        _fold_col(["t"], F.col("e1")).alias("e1s"),
        _fold_col(["t"], F.col("v")).alias("vs"),
    )
    om = F.col("o1").cast("double") - F.col("e1s")
    return terms.crossJoin(F.broadcast(stat)).select(
        F.col("t").alias("tenure_q"),
        F.col("d1").alias("d_building"),
        F.col("n1").alias("risk_building"),
        F.col("d2").alias("d_other"),
        F.col("n2").alias("risk_other"),
        F.col("e1").alias("expected_building"),
        F.col("o1").alias("observed_total"),
        F.col("e1s").alias("expected_total"),
        (om * om / F.col("vs")).alias("logrank_chi2"),
    )


@register(
    "q358_cochrans_q",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END AS a,
               CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END AS b,
               CASE WHEN l_tax >= 0.04 THEN 1 ELSE 0 END AS c
        FROM lineitem
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS g1, CAST(SUM(b) AS BIGINT) AS g2,
               CAST(SUM(c) AS BIGINT) AS g3,
               CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sr2,
               CAST(SUM(a + b + c) AS BIGINT) AS s
        FROM scored
    )
    SELECT n, g1, g2, g3, s,
           2e0 * (3e0 * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
                         + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
                         + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (3e0 * CAST(s AS DOUBLE) - CAST(sr2 AS DOUBLE)) AS cochran_q
    FROM agg
    """,
    survey_ref="extension: Cochran's Q — the k-treatment extension of "
    "q338's McNemar (k=3 binary rules scored on the SAME line items): "
    "Q = (k−1)(kΣG_j² − S²)/(kS − ΣR_i²), every term an exact BIGINT "
    "from one aggregate; Q ~ χ²₂ under 'all rules fire equally often'",
)
def q358_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three binary rules applied to the same rows
    (quantity ≥ 25, discount ≥ 5%, tax ≥ 4%): column totals G_j, the
    grand total S and the row-sum squares ΣR² all come from ONE
    map-side-combinable aggregate; the statistic is a single mirrored
    double expression. (ΣG² forms in doubles — the q312-class
    at-scale int64 guard.)

    Scale: one pass, zero joins, zero shuffles beyond the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    a = (F.col("l_quantity") >= 25).cast("int")
    b = (F.col("l_discount") >= 0.05).cast("int")
    c = (F.col("l_tax") >= 0.04).cast("int")
    r = a + b + c
    agg = li.select(
        a.alias("a"), b.alias("b"), c.alias("c"), r.alias("r")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("a").cast("long").alias("g1"),
        F.sum("b").cast("long").alias("g2"),
        F.sum("c").cast("long").alias("g3"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("sr2"),
        F.sum("r").cast("long").alias("s"),
    )
    g1, g2, g3 = (F.col(x).cast("double") for x in ("g1", "g2", "g3"))
    s_d = F.col("s").cast("double")
    return agg.select(
        "n",
        "g1",
        "g2",
        "g3",
        "s",
        (
            F.lit(2.0)
            * (F.lit(3.0) * (g1 * g1 + g2 * g2 + g3 * g3) - s_d * s_d)
            / (F.lit(3.0) * s_d - F.col("sr2").cast("double"))
        ).alias("cochran_q"),
    )


@register(
    "q359_log_elasticity",
    oracle=f"""
    WITH cells AS (
        SELECT p.p_brand AS brand,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 100000 AS pb,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS sp,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), {_pln_ctes("cells", "sp", "n", "lx", "pa")},
    {_pln_ctes("pa", "sq", "n", "ly", "pb2")},
    sums AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS k,
               {_fold_sql("lx", "pb")} AS sx,
               {_fold_sql("ly", "pb")} AS sy,
               {_fold_sql("lx * ly", "pb")} AS sxy,
               {_fold_sql("lx * lx", "pb")} AS sxx,
               {_fold_sql("ly * ly", "pb")} AS syy
        FROM pb2 GROUP BY 1
    )
    SELECT brand, k AS n_price_levels,
           (CAST(k AS DOUBLE) * sxy - sx * sy)
               / (CAST(k AS DOUBLE) * sxx - sx * sx) AS elasticity,
           (CAST(k AS DOUBLE) * sxy - sx * sy)
               * (CAST(k AS DOUBLE) * sxy - sx * sy)
               / ((CAST(k AS DOUBLE) * sxx - sx * sx)
                  * (CAST(k AS DOUBLE) * syy - sy * sy)) AS r2
    FROM sums
    """,
    survey_ref="extension: log-log price elasticity per brand — OLS of "
    "ln(mean qty) on ln(mean price) over $1000 price levels, the "
    "economics twin of q346's Zipf fit and the nonlinear complement of "
    "q202's linear groupwise OLS; both lns are portable-ln of exact "
    "integer ratios (Σprice_cents/n, Σqty/n)",
)
def q359_log_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand demand elasticity: group line items into $1000 price
    levels, take ln(mean quantity) vs ln(mean price) — both portable-ln
    of exact BIGINT ratios — and fit the per-brand OLS slope with the
    five sums folding in price-level order WITHIN each brand group
    (grouped pinned folds). Slope ≈ elasticity; r² says whether a
    log-linear demand curve describes the brand at all.

    Scale: one aggregate over lineitem⋈part (part broadcasts) to
    brand×level cells; folds touch ≤~1000 rows per brand."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = (_dec("l_extendedprice") * 100).cast("long")
    cells = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            cents.alias("cents"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .withColumn("pb", F.expr("cents div 100000"))
        .groupBy("brand", "pb")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sp"),
            F.sum("q").cast("long").alias("sq"),
        )
    )
    cells = _pln_stage(cells, "sp", "n", "lx", "pa")
    cells = _pln_stage(cells, "sq", "n", "ly", "pb2")
    sums = cells.groupBy("brand").agg(
        F.count("*").cast("long").alias("k"),
        _fold_col(["pb"], F.col("lx")).alias("sx"),
        _fold_col(["pb"], F.col("ly")).alias("sy"),
        _fold_col(["pb"], F.col("lx") * F.col("ly")).alias("sxy"),
        _fold_col(["pb"], F.col("lx") * F.col("lx")).alias("sxx"),
        _fold_col(["pb"], F.col("ly") * F.col("ly")).alias("syy"),
    )
    k_d = F.col("k").cast("double")
    num = k_d * F.col("sxy") - F.col("sx") * F.col("sy")
    den = k_d * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "brand",
        F.col("k").alias("n_price_levels"),
        (num / den).alias("elasticity"),
        (
            num * num / (den * (k_d * F.col("syy") - F.col("sy") * F.col("sy")))
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Batch 37 (round 5): corpus-ops tooling — dedup operating curve,
# generation-loop detector, PII density audit, compaction planner
# ---------------------------------------------------------------------------


@register(
    "q360_dedup_threshold_sweep",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                         i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks
        )
    ), sz AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS inter
        FROM sh a JOIN sh b USING (sh)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), pairs AS (
        SELECT i.id_a, i.id_b, i.inter,
               CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS uni
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.id_a
        JOIN sz sb ON sb.doc_id = i.id_b
    ), thetas AS (
        SELECT CAST(theta AS BIGINT) AS theta
        FROM generate_series(50, 95, 5) AS g(theta)
    ), qual AS (
        SELECT t.theta, p.id_a, p.id_b
        FROM pairs p JOIN thetas t ON 100 * p.inter >= t.theta * p.uni
    ), removed AS (
        SELECT DISTINCT theta, id_b AS doc_id FROM qual
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
    ), per AS (
        SELECT t.theta,
               CAST(COALESCE(q.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(r.docs_removed, 0) AS BIGINT) AS docs_removed,
               CAST(COALESCE(r.chars_removed, 0) AS BIGINT) AS chars_removed
        FROM thetas t
        LEFT JOIN (
            SELECT theta, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM qual GROUP BY 1
        ) q ON t.theta = q.theta
        LEFT JOIN (
            SELECT rm.theta, CAST(COUNT(*) AS BIGINT) AS docs_removed,
                   CAST(SUM(d.n_chars) AS BIGINT) AS chars_removed
            FROM removed rm JOIN documents d ON rm.doc_id = d.doc_id
            GROUP BY 1
        ) r ON t.theta = r.theta
    )
    SELECT p.theta AS threshold_pct, p.n_pairs, p.docs_removed,
           p.chars_removed,
           CAST(p.docs_removed AS DOUBLE) / CAST(t.n_docs AS DOUBLE)
               AS doc_removal_rate,
           CAST(p.chars_removed AS DOUBLE) / CAST(t.total_chars AS DOUBLE)
               AS char_removal_rate
    FROM per p CROSS JOIN tot t
    """,
    survey_ref="extension: dedup operating curve — how much of the "
    "corpus (docs, chars) a keep-smallest-id near-dup pass would drop "
    "at EVERY Jaccard threshold 0.50..0.95, from one pass over q25's "
    "trigram pair table; threshold tests stay in integers "
    "(100·∩ ≥ θ·∪), so the sweep is exact at every point",
)
def q360_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operating curve a dedup threshold decision needs: for each
    θ ∈ {50%..95%}, how many doc pairs exceed it, and how many
    documents/characters a keep-first (smallest doc_id) policy would
    remove. Pair similarities come from the q25 postings join (work ∝
    shingle postings, never docs²); per-θ qualification is the exact
    integer comparison 100·inter ≥ θ·union, so NO similarity is ever a
    rounded double; empty thresholds densify from the literal range.

    Scale: one postings self-join (the same cost as running dedup
    once) amortized over the WHOLE threshold sweep — versus re-running
    dedup per candidate threshold."""
    doc = load_table(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - 2, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(tk, i),
            F.element_at(tk, i + 1),
            F.element_at(tk, i + 2),
        ),
    )
    sh = doc.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("sh")
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("inter"))
    )
    pairs = (
        inter.join(sz.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sa")), "id_a")
        .join(sz.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sb")), "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("sa") + F.col("sb") - F.col("inter")).cast("long").alias("uni"),
        )
        .cache()  # the sweep reuses one postings join for all thresholds
    )
    thetas = spark.range(50, 100, 5).select(F.col("id").alias("theta"))
    qual = pairs.crossJoin(F.broadcast(thetas)).filter(
        100 * F.col("inter") >= F.col("theta") * F.col("uni")
    )
    npairs = qual.groupBy("theta").agg(F.count("*").cast("long").alias("n_pairs"))
    removed = qual.select("theta", F.col("id_b").alias("doc_id")).distinct()
    rem = (
        removed.join(F.broadcast(doc.select("doc_id", "n_chars")), "doc_id")
        .groupBy("theta")
        .agg(
            F.count("*").cast("long").alias("docs_removed"),
            F.sum("n_chars").cast("long").alias("chars_removed"),
        )
    )
    tot = doc.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    per = (
        thetas.join(F.broadcast(npairs), "theta", "left")
        .join(F.broadcast(rem), "theta", "left")
        .select(
            "theta",
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce(F.col("docs_removed"), F.lit(0))
            .cast("long")
            .alias("docs_removed"),
            F.coalesce(F.col("chars_removed"), F.lit(0))
            .cast("long")
            .alias("chars_removed"),
        )
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("theta").alias("threshold_pct"),
        "n_pairs",
        "docs_removed",
        "chars_removed",
        (
            F.col("docs_removed").cast("double") / F.col("n_docs").cast("double")
        ).alias("doc_removal_rate"),
        (
            F.col("chars_removed").cast("double")
            / F.col("total_chars").cast("double")
        ).alias("char_removal_rate"),
    )


@register(
    "q361_loop_detector",
    oracle="""
    WITH tails AS (
        SELECT doc_id, source, right(text, 64) AS tl FROM documents
    ), per AS (
        SELECT doc_id, source, CAST(length(tl) AS BIGINT) AS tail_len,
               list_min(list_transform(generate_series(1, 8),
                   p -> CASE WHEN length(tl) > p
                                  AND substr(tl, 1, length(tl) - p)
                                      = substr(tl, p + 1, length(tl) - p)
                             THEN p ELSE 99 END)) AS mp
        FROM tails
    )
    SELECT doc_id, source, tail_len,
           CAST(CASE WHEN mp = 99 THEN 0 ELSE mp END AS BIGINT) AS loop_period,
           mp <> 99 AND tail_len >= 32 AS is_looping
    FROM per
    """,
    survey_ref="extension: degenerate-generation loop detector — the "
    "smallest period p ≤ 8 such that the document's 64-char tail "
    "repeats with period p (exact shifted-substring equality, no "
    "hashing); catches the 'ababab…' failure mode of sampling loops "
    "that q101's token-repetition ratios dilute away on long docs",
)
def q361_loop_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-periodicity scan: a text whose last 64 characters satisfy
    tail[i] = tail[i+p] for all i is stuck in a p-cycle — the classic
    degenerate-decode signature. The check is the shifted self-equality
    substr(t, 1, L−p) = substr(t, p+1, L−p) for p = 1..8, evaluated as
    row-local string ops (identical semantics in both engines); the
    smallest qualifying period is reported, 0 if none.

    Scale: embarrassingly parallel row-local work, no shuffle at all;
    the 64-char cap bounds per-row cost regardless of document size."""
    doc = load_table(spark, sf_dir, "documents")
    tl = F.expr("right(text, 64)")
    d = doc.select("doc_id", "source", tl.alias("tl"))
    L = F.length(F.col("tl"))
    mp = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda p: F.when(
                (L > p)
                & (
                    F.col("tl").substr(F.lit(1), L - p)
                    == F.col("tl").substr(p + 1, L - p)
                ),
                p,
            ).otherwise(F.lit(99)),
        )
    )
    per = d.select(
        "doc_id", "source", L.cast("long").alias("tail_len"), mp.alias("mp")
    )
    return per.select(
        "doc_id",
        "source",
        "tail_len",
        F.when(F.col("mp") == 99, 0)
        .otherwise(F.col("mp"))
        .cast("long")
        .alias("loop_period"),
        ((F.col("mp") != 99) & (F.col("tail_len") >= 32)).alias("is_looping"),
    )


@register(
    "q362_pii_density",
    oracle="""
    WITH per AS (
        SELECT source, n_chars,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+'))
                   AS BIGINT) AS emails,
               CAST(len(regexp_extract_all(text,
                   '[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]'))
                   AS BIGINT) AS ssns,
               CAST(len(regexp_extract_all(text,
                   '[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]'))
                   AS BIGINT) AS phones
        FROM documents
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(emails) AS BIGINT) AS emails,
           CAST(SUM(ssns) AS BIGINT) AS ssns,
           CAST(SUM(phones) AS BIGINT) AS phones,
           CAST(SUM(CASE WHEN emails + ssns + phones > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           CAST(SUM(emails + ssns + phones) AS DOUBLE) * 1e5
               / CAST(SUM(n_chars) AS DOUBLE) AS pii_per_100k_chars
    FROM per GROUP BY 1
    """,
    survey_ref="extension: PII density audit per source — pattern "
    "counts (emails, SSN-shaped, phone-shaped) per 100k characters; "
    "the MEASUREMENT side of q65's redaction transform: which sources "
    "need scrubbing before training, and how much survives after",
)
def q362_pii_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure: count email-, SSN- and phone-shaped
    matches per document (regexp_count with patterns restricted to the
    regex subset both engines implement identically — explicit digit
    classes, no lookaround), then aggregate to source-level totals and
    a per-100k-character density. A zero result IS the audit passing.

    Scale: row-local regex work (no shuffle before the source rollup);
    the pattern list extends by adding one column, never another scan."""
    doc = load_table(spark, sf_dir, "documents")
    emails = F.regexp_count(
        F.col("text"),
        F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"),
    ).cast("long")
    ssns = F.regexp_count(
        F.col("text"), F.lit(r"[0-9][0-9][0-9]-[0-9][0-9]-[0-9][0-9][0-9][0-9]")
    ).cast("long")
    phones = F.regexp_count(
        F.col("text"),
        F.lit(r"[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"),
    ).cast("long")
    per = doc.select(
        "source",
        "n_chars",
        emails.alias("emails"),
        ssns.alias("ssns"),
        phones.alias("phones"),
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("emails").cast("long").alias("emails"),
        F.sum("ssns").cast("long").alias("ssns"),
        F.sum("phones").cast("long").alias("phones"),
        F.sum(
            (F.col("emails") + F.col("ssns") + F.col("phones") > 0).cast("int")
        )
        .cast("long")
        .alias("docs_with_pii"),
        (
            F.sum(F.col("emails") + F.col("ssns") + F.col("phones")).cast(
                "double"
            )
            * F.lit(1e5)
            / F.sum("n_chars").cast("double")
        ).alias("pii_per_100k_chars"),
    )


@register(
    "q363_compaction_nextfit",
    oracle="""
    WITH items AS (
        SELECT source, doc_id, CAST(n_chars AS BIGINT) AS sz,
               CAST(ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn
        FROM documents
    ), arr AS (
        SELECT source,
               list(struct_pack(bin := rn, fill := sz) ORDER BY rn) AS a
        FROM items GROUP BY 1
    ), packed AS (
        -- (bin, fill) packed into ONE BIGINT (bin<<32 | fill): DuckDB
        -- 1.0's correlated list_reduce returns wrong values for
        -- STRUCT accumulators on multi-group inputs (correct in
        -- isolation — a vectorization fault this repo's scalar folds
        -- never hit), so the state stays scalar on both engines
        SELECT i.source, i.doc_id, i.sz, i.rn,
               list_reduce(
                   list_prepend(CAST(8192 AS BIGINT),
                       list_transform(list_filter(ar.a, e -> e.bin <= i.rn),
                                      e -> e.fill)),
                   (acc, e) -> CASE WHEN (acc & 4294967295) + e > 8192
                       THEN (((acc >> 32) + 1) << 32) + e
                       ELSE acc + e END) AS st
        FROM items i JOIN arr ar ON i.source = ar.source
    ), bins AS (
        SELECT source, CAST(MAX(st >> 32) AS BIGINT) AS n_bins
        FROM packed GROUP BY 1
    )
    SELECT p.source, p.doc_id, p.sz AS size_chars,
           CAST(p.st >> 32 AS BIGINT) AS bin_id,
           CAST(p.st & 4294967295 AS BIGINT) AS bin_fill_after, b.n_bins
    FROM packed p JOIN bins b ON p.source = b.source
    """,
    survey_ref="extension: small-file compaction planner — next-fit-"
    "decreasing bin packing of each source's documents into 8 KiB "
    "target files; the per-partition assignment plan a lakehouse "
    "OPTIMIZE job executes, complementing q274's LPT task scheduler "
    "(LPT balances a FIXED bin count; NFD minimizes the count at a "
    "fixed capacity); pure integer folds, exact on both engines",
)
def q363_compaction_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit-decreasing packing per source: items sort by (size
    desc, doc_id), the running (bin, fill) state is inherently
    sequential so each item folds its rank-prefix of one per-source
    array (the q341/q352 prefix-fold pattern, all integer); the seed
    (bin 0, fill = capacity) makes the first item open bin 1 and lets
    oversized items take a bin alone. Output: every document's target
    bin, the bin's fill after placement, and the source's bin count.

    Scale: per-source arrays are partition-local; O(m²) fold steps per
    source over DOCUMENT COUNTS, not bytes — and the planner output is
    exactly the work list a compaction executor consumes."""
    doc = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.col("doc_id"))
    items = doc.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("sz"),
        F.row_number().over(ws).cast("long").alias("rn"),
    ).cache()  # document-grain; array build and fold reuse one scan
    arr = items.groupBy("source").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("rn").alias("bin"), F.col("sz").alias("fill"))
            )
        ).alias("a")
    )
    packed = items.join(F.broadcast(arr), "source")
    mask = F.lit(4294967295).cast("long")
    st = F.aggregate(
        F.transform(
            F.filter(F.col("a"), lambda e: e["bin"] <= F.col("rn")),
            lambda e: e["fill"],
        ),
        F.lit(8192).cast("long"),
        lambda acc, e: F.when(
            acc.bitwiseAND(mask) + e > 8192,
            F.call_function(
                "shiftleft", F.shiftright(acc, 32) + 1, F.lit(32)
            )
            + e,
        ).otherwise(acc + e),
    )
    packed = packed.select("source", "doc_id", "sz", st.alias("st")).cache()
    bins = packed.groupBy("source").agg(
        F.max(F.shiftright(F.col("st"), 32)).cast("long").alias("n_bins")
    )
    return packed.join(F.broadcast(bins), "source").select(
        "source",
        "doc_id",
        F.col("sz").alias("size_chars"),
        F.shiftright(F.col("st"), 32).cast("long").alias("bin_id"),
        F.col("st").bitwiseAND(mask).cast("long").alias("bin_fill_after"),
        "n_bins",
    )


# ---------------------------------------------------------------------------
# Batch 38 (round 5): time-series diagnostics (ACF/PACF/Ljung-Box),
# Cramér-von Mises two-sample test, variance inflation factors
# ---------------------------------------------------------------------------

# Durbin-Levinson recursion to lag 5, unrolled as NAMED-COLUMN stages
# whose defining SQL text is SHARED verbatim between the DuckDB oracle
# and the Spark plan (F.expr parses the same fragment ⇒ identical
# operand order ⇒ bit-identical doubles).
_DL_STAGES: list[tuple[str, str]] = [
    ("p11", "r1"),
    ("p22", "(r2 - r1 * r1) / (1e0 - r1 * r1)"),
    ("p21", "r1 - p22 * r1"),
    ("p33", "(r3 - (p21 * r2 + p22 * r1)) / (1e0 - (p21 * r1 + p22 * r2))"),
    ("p31", "p21 - p33 * p22"),
    ("p32", "p22 - p33 * p21"),
    (
        "p44",
        "(r4 - (p31 * r3 + p32 * r2 + p33 * r1))"
        " / (1e0 - (p31 * r1 + p32 * r2 + p33 * r3))",
    ),
    ("p41", "p31 - p44 * p33"),
    ("p42", "p32 - p44 * p32"),
    ("p43", "p33 - p44 * p31"),
    (
        "p55",
        "(r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))"
        " / (1e0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4))",
    ),
]

_LB_EXPRS: list[str] = [
    "CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ("
    + " + ".join(f"r{j} * r{j} / CAST(n - {j} AS DOUBLE)" for j in range(1, k + 1))
    + ")"
    for k in range(1, 6)
]


def _ts_diag_oracle() -> str:
    dl = ", ".join(
        f"dl{i} AS (SELECT *, {expr} AS {name} FROM dl{i - 1})"
        for i, (name, expr) in enumerate(_DL_STAGES, 1)
    )
    pacf = {1: "p11", 2: "p22", 3: "p33", 4: "p44", 5: "p55"}
    sel = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, n AS n_days, r{k} AS acf, "
        f"{pacf[k]} AS pacf, {_LB_EXPRS[k - 1]} AS ljung_box_q FROM dl{len(_DL_STAGES)}"
        for k in range(1, 6)
    )
    leads = ", ".join(
        f"LEAD(y, {k}) OVER (ORDER BY d) AS y{k}" for k in range(1, 6)
    )
    sums = ", ".join(
        f"""CAST(SUM(CASE WHEN y{k} IS NOT NULL THEN y * y{k} END) AS BIGINT) AS sxy{k},
            CAST(SUM(CASE WHEN y{k} IS NOT NULL THEN y END) AS BIGINT) AS sh{k},
            CAST(SUM(y{k}) AS BIGINT) AS st{k}"""
        for k in range(1, 6)
    )
    rs = ", ".join(
        f"""CAST(n * n * sxy{k} - n * sy * (sh{k} + st{k})
                 + (n - {k}) * sy * sy AS DOUBLE)
            / CAST(n * (n * syy - sy * sy) AS DOUBLE) AS r{k}"""
        for k in range(1, 6)
    )
    return f"""
    WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
        FROM lineitem GROUP BY 1
    ), led AS (
        SELECT d, y, {leads} FROM daily
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy, {sums}
        FROM led
    ), dl0 AS (
        SELECT n, {rs} FROM agg
    ), {dl}
    {sel}
    """


@register(
    "q364_ts_diagnostics",
    oracle=_ts_diag_oracle(),
    survey_ref="extension: the Box-Jenkins diagnostic head — ACF, "
    "PACF (Durbin-Levinson, unrolled to lag 5) and Ljung-Box Q over "
    "the daily shipment series; q165's per-lag Pearson uses per-lag "
    "means (a different estimator) — this is the standard "
    "global-mean ACF the PACF recursion requires; autocovariance "
    "numerators are exact n²-scaled BIGINTs",
)
def q364_ts_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF/PACF/Ljung-Box to lag 5 on daily shipment counts. All five
    autocovariances come from ONE pass (five LEAD columns over the
    day-grain series): scaling Σ(y_t−ȳ)(y_{t+k}−ȳ) by n² clears the
    rational mean, so numerator and denominator are exact BIGINTs and
    each r_k is one double division. The Durbin-Levinson recursion and
    the Ljung-Box sums are defined by SQL fragments parsed VERBATIM by
    both engines (F.expr), so every derived double is bit-identical.

    Scale: one fact aggregate to day grain; everything after is
    constant-size single-row algebra."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
        F.count("*").cast("long").alias("y")
    )
    wd = Window.orderBy("d")
    led = daily.select(
        "d", "y", *[F.lead("y", k).over(wd).alias(f"y{k}") for k in range(1, 6)]
    )
    aggs = [
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    ]
    for k in range(1, 6):
        yk = F.col(f"y{k}")
        aggs += [
            F.sum(F.when(yk.isNotNull(), F.col("y") * yk)).cast("long").alias(f"sxy{k}"),
            F.sum(F.when(yk.isNotNull(), F.col("y"))).cast("long").alias(f"sh{k}"),
            F.sum(yk).cast("long").alias(f"st{k}"),
        ]
    agg = led.agg(*aggs)
    dl = agg.select(
        "n",
        *[
            F.expr(
                f"CAST(n * n * sxy{k} - n * sy * (sh{k} + st{k})"
                f" + (n - {k}) * sy * sy AS DOUBLE)"
                f" / CAST(n * (n * syy - sy * sy) AS DOUBLE)"
            ).alias(f"r{k}")
            for k in range(1, 6)
        ],
    )
    for name, expr in _DL_STAGES:
        dl = dl.withColumn(name, F.expr(expr))
    pacf = {1: "p11", 2: "p22", 3: "p33", 4: "p44", 5: "p55"}
    rows = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("lag"),
                F.col("n").alias("n_days"),
                F.col(f"r{k}").alias("acf"),
                F.col(pacf[k]).alias("pacf"),
                F.expr(_LB_EXPRS[k - 1]).alias("ljung_box_q"),
            )
            for k in range(1, 6)
        ]
    )
    return dl.select(F.explode(rows).alias("x")).select(
        "x.lag", "x.n_days", "x.acf", "x.pacf", "x.ljung_box_q"
    )


@register(
    "q365_cramer_von_mises",
    oracle="""
    WITH tagged AS (
        SELECT CAST(l_quantity AS BIGINT) AS v,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS g
        FROM lineitem WHERE l_returnflag IN ('R', 'N')
    ), cells AS (
        SELECT v, CAST(SUM(g) AS BIGINT) AS ca,
               CAST(SUM(1 - g) AS BIGINT) AS cb
        FROM tagged GROUP BY 1
    ), cum AS (
        SELECT v, ca, cb,
               CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
               CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
        FROM cells
    ), tot AS (
        SELECT CAST(SUM(ca) AS BIGINT) AS n, CAST(SUM(cb) AS BIGINT) AS m
        FROM cells
    ), terms AS (
        SELECT c.v, c.ca, c.cb, c.cuma, c.cumb, t.n, t.m,
               CAST(c.ca + c.cb AS DOUBLE)
                   * (CAST(c.cuma * t.m - c.cumb * t.n AS DOUBLE)
                      * CAST(c.cuma * t.m - c.cumb * t.n AS DOUBLE)) AS w
        FROM cum c CROSS JOIN tot t
    ), stat AS (
        SELECT list_reduce(list_prepend(CAST(0e0 AS DOUBLE),
                   list(w ORDER BY v)), (a, b) -> a + b) AS ws
        FROM terms
    )
    SELECT x.v AS quantity, x.ca AS count_r, x.cb AS count_n,
           x.cuma AS cum_r, x.cumb AS cum_n,
           s.ws / (CAST(x.n AS DOUBLE) * CAST(x.m AS DOUBLE)
                   * CAST(x.n + x.m AS DOUBLE) * CAST(x.n + x.m AS DOUBLE))
               AS cvm_t
    FROM terms x CROSS JOIN stat s
    """,
    survey_ref="extension: two-sample Cramér-von Mises — integrates "
    "the SQUARED ECDF gap where q245's KS takes only the max (CvM "
    "sees distributed small departures KS misses); completes the "
    "χ²/KS/Wasserstein/CvM distribution-comparison family; gap "
    "numerators cumA·m − cumB·n are exact BIGINTs, squared in doubles",
)
def q365_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample CvM on quantity between R and N return flags:
    T = Σ_obs (F(v) − G(v))² · nm/N². Per distinct value, the ECDF gap
    numerator cumA·m − cumB·n is an exact BIGINT (≤ ~3.6e11 at sf0.1;
    at 100 TB the counts would bucket first); the squared terms weight
    by the tie count and fold in value order; ONE final division by
    nm·N² lands the statistic.

    Scale: value-grain prefix sums over ≤50 distinct quantities —
    the q245/q275 count-of-counts discipline."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    tagged = li.select(
        F.col("l_quantity").cast("long").alias("v"),
        (F.col("l_returnflag") == "R").cast("int").alias("g"),
    )
    cells = tagged.groupBy("v").agg(
        F.sum("g").cast("long").alias("ca"),
        F.sum(1 - F.col("g")).cast("long").alias("cb"),
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "v",
        "ca",
        "cb",
        F.sum("ca").over(wv).cast("long").alias("cuma"),
        F.sum("cb").over(wv).cast("long").alias("cumb"),
    )
    tot = cells.agg(
        F.sum("ca").cast("long").alias("n"), F.sum("cb").cast("long").alias("m")
    )
    gap = (F.col("cuma") * F.col("m") - F.col("cumb") * F.col("n")).cast("double")
    terms = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "ca",
        "cb",
        "cuma",
        "cumb",
        "n",
        "m",
        ((F.col("ca") + F.col("cb")).cast("double") * (gap * gap)).alias("w"),
    ).cache()  # ≤50 rows; the fold and output reuse one scan
    stat = terms.agg(_fold_col(["v"], F.col("w")).alias("ws"))
    nm = (
        F.col("n").cast("double")
        * F.col("m").cast("double")
        * (F.col("n") + F.col("m")).cast("double")
        * (F.col("n") + F.col("m")).cast("double")
    )
    return terms.crossJoin(F.broadcast(stat)).select(
        F.col("v").alias("quantity"),
        F.col("ca").alias("count_r"),
        F.col("cb").alias("count_n"),
        F.col("cuma").alias("cum_r"),
        F.col("cumb").alias("cum_n"),
        (F.col("ws") / nm).alias("cvm_t"),
    )
