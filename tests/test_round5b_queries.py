"""Round-5 batch-30 additions: BH-FDR (q312), cross-fitted doubly-robust
OPE (q313), l-diversity (q314), isotonic calibration (q315),
Kruskal–Wallis (q316), segmented trend (q317), Mantel–Haenszel pooled
odds (q318). Each already hash-matches its DuckDB oracle registry-wide;
these tests pin the SEMANTICS against independent pure-Python replays
from the raw parquet — where possible by a DIFFERENT algorithm than the
engine uses (q315's replay is the sequential pool-adjacent-violators
sweep, the engine computes the minimax identity; q317's replay refits
every split from scratch, the engine uses prefix sums) — so an
engine-symmetric bug cannot hide behind the oracle."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


# ---------------------------------------------------------------- q312


def test_bh_fdr_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT p.p_brand, l.l_quantity,
               CASE WHEN l.l_linestatus = 'F' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey
        """
    )
    st: dict[str, list[int]] = {}
    for brand, q, is_f in raw:
        s = st.setdefault(brand, [0, 0, 0, 0, 0, 0])
        q = int(q)
        if is_f:
            s[0] += 1
            s[1] += q
            s[2] += q * q
        else:
            s[3] += 1
            s[4] += q
            s[5] += q * q
    tests = {}
    for brand, (na, sa, ssa, nb, sb, ssb) in st.items():
        if na < 2 or nb < 2 or na * ssa - sa * sa + nb * ssb - sb * sb <= 0:
            continue
        delta = sa / na - sb / nb
        se2 = (na * ssa - sa * sa) / (na * na * (na - 1)) + (
            nb * ssb - sb * sb
        ) / (nb * nb * (nb - 1))
        z2 = delta * delta / se2
        tests[brand] = (na, nb, z2, 1.0 if z2 <= 1.0 else 1.0 / z2)
    m = len(tests)
    order = sorted(tests, key=lambda b: (tests[b][3], b))
    kstar = 0
    for r, brand in enumerate(order, 1):
        if tests[brand][3] * m * 10.0 <= r:
            kstar = r
    expected = {
        brand: (tests[brand][0], tests[brand][1], r, r <= kstar)
        for r, brand in enumerate(order, 1)
    }
    got = REGISTRY["q312_bh_fdr"].fn(spark, SF).collect()
    assert len(got) == m
    for row in got:
        na, nb, rank, disc = expected[row.brand]
        assert (row.n_f, row.n_o, row.p_rank, row.discovery) == (
            na,
            nb,
            rank,
            disc,
        )
        assert row.m_tests == m
        assert _close(row.z2, tests[row.brand][2])
        assert _close(row.p_chebyshev, tests[row.brand][3])
    # BH must reject a PREFIX of the p-ordered tests, never a gap
    flags = [r.discovery for r in sorted(got, key=lambda r: r.p_rank)]
    assert flags == sorted(flags, reverse=True)


# ---------------------------------------------------------------- q313


def test_dr_offpolicy_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT c.c_mktsegment, o.o_orderpriority,
               CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               o.o_orderkey % 2
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        """
    )
    model: dict[str, list[int]] = {}
    gm = [0, 0]
    ev: dict[str, list[int]] = {}
    n_e = 0
    for seg, act, r_cents, fold in raw:
        tgt = act == "1-URGENT"
        if fold == 0 and tgt:
            s = model.setdefault(seg, [0, 0])
            s[0] += 1
            s[1] += r_cents
            gm[0] += 1
            gm[1] += r_cents
        if fold == 1:
            n_e += 1
            s = ev.setdefault(seg, [0, 0, 0])
            s[0] += 1
            if tgt:
                s[1] += 1
                s[2] += r_cents
    got = {r.segment: r for r in REGISTRY["q313_dr_offpolicy"].fn(spark, SF).collect()}
    assert set(got) == set(ev)
    for seg, (ne_seg, na_e, mc_e) in ev.items():
        nm, mc = model.get(seg, (0, 0))
        qhat = mc / nm if nm > 0 else gm[1] / gm[0]
        dm = ne_seg * qhat / n_e
        corr = 0.0 if na_e == 0 else (mc_e - na_e * qhat) * ne_seg / na_e / n_e
        row = got[seg]
        assert (row.n_model_urgent, row.n_eval, row.n_eval_urgent) == (
            nm,
            ne_seg,
            na_e,
        )
        assert _close(row.qhat_cents, qhat)
        assert _close(row.dm_contrib_cents, dm)
        assert _close(row.correction_cents, corr) or (corr == 0 and row.correction_cents == 0)
        assert _close(row.dr_contrib_cents, dm + corr)
    # the cross-fit makes DR a real correction: at least one segment's
    # correction must be nonzero (fold-0 model vs fold-1 outcomes differ)
    assert any(abs(r.correction_cents) > 0 for r in got.values())


# ---------------------------------------------------------------- q314


def test_l_diversity_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        """
    )
    cells: dict[tuple, dict[str, int]] = {}
    for nk, seg, act in raw:
        cells.setdefault((nk, seg), {}).setdefault(act, 0)
        cells[(nk, seg)][act] += 1
    got = {
        (r.nationkey, r.segment): r
        for r in REGISTRY["q314_l_diversity"].fn(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for qi, acts in cells.items():
        row = got[qi]
        n = sum(acts.values())
        top = max(acts.values())
        assert (row.group_n, row.l_distinct, row.top_count, row.at_risk) == (
            n,
            len(acts),
            top,
            len(acts) < 3,
        )
        assert _close(row.top_share, top / n)


# ---------------------------------------------------------------- q315


def _pava(levels: list[tuple[int, int, int]]) -> dict[int, float]:
    """Sequential pool-adjacent-violators — a deliberately DIFFERENT
    algorithm than the engine's minimax identity."""
    blocks = [[d, w, s] for d, w, s in levels]  # ordered by d
    out = []
    for b in blocks:
        out.append(b[:])
        while len(out) >= 2 and out[-2][2] * out[-1][1] >= out[-1][2] * out[-2][1]:
            d, w, s = out.pop()
            out[-1][1] += w
            out[-1][2] += s
    iso = {}
    i = 0
    for d2, w2, s2 in out:
        # block covers all original levels up to its last member
        rate = s2 / w2
        cover = 0
        while cover < w2:
            iso[blocks[i][0]] = rate
            cover += blocks[i][1]
            i += 1
    return iso


def test_isotonic_matches_sequential_pava(spark):
    raw = _rows(
        f"""
        SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
               COUNT(*),
               SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1 ORDER BY 1
        """
    )
    levels = [(int(d), int(w), int(s)) for d, w, s in raw]
    iso = _pava(levels)
    got = {r.discount_cents: r for r in
           REGISTRY["q315_isotonic_calibration"].fn(spark, SF).collect()}
    assert set(got) == set(iso)
    for (d, w, s) in levels:
        row = got[d]
        assert (row.n, row.n_pos) == (w, s)
        assert _close(row.emp_rate, s / w)
        assert _close(row.iso_rate, iso[d])
    # the fit must be monotone non-decreasing in discount
    rates = [got[d].iso_rate for d, _, _ in levels]
    assert all(a <= b + 1e-12 for a, b in zip(rates, rates[1:]))
    # and mass-preserving per pooled block: overall weighted means agree
    tot_w = sum(w for _, w, _ in levels)
    assert _close(
        sum(got[d].iso_rate * w for d, w, _ in levels) / tot_w,
        sum(s for _, _, s in levels) / tot_w,
    )


# ---------------------------------------------------------------- q316


def test_kruskal_wallis_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')
        """
    )
    from collections import Counter

    byval = Counter(v for _, v in raw)
    order = sorted(byval)
    d2 = {}
    cb = 0
    for v in order:
        d2[v] = 2 * cb + byval[v] + 1
        cb += byval[v]
    groups: dict[str, list[int]] = {}
    for g, v in raw:
        s = groups.setdefault(g, [0, 0])
        s[0] += 1
        s[1] += d2[v]
    n = len(raw)
    tie3 = sum(c * c * c - c for c in byval.values())
    srank = 0.0
    for g in sorted(groups):
        n_g, r2 = groups[g]
        srank += float(r2) * float(r2) / float(4 * n_g)
    h = 12.0 * srank / (float(n) * float(n + 1)) - 3.0 * float(n + 1)
    tie_c = 1.0 - float(tie3) / (float(n) ** 3 - float(n))
    rows = REGISTRY["q316_kruskal_wallis"].fn(spark, SF).collect()
    assert {r.returnflag for r in rows} == set(groups)
    for r in rows:
        n_g, r2 = groups[r.returnflag]
        assert (r.n_g, r.rank_sum2, r.n_total) == (n_g, r2, n)
        assert _close(r.hstat, h)
        assert _close(r.tie_correction, tie_c)
        assert _close(r.h_corrected, h / tie_c)
    # with k=2 this machinery must reduce to q308's z²: cross-check
    # H(corrected) against scipy-free two-group identity on a subsample
    # is covered by construction (same midrank table as q308).
    assert h > 0  # ranks differ somewhere


# ---------------------------------------------------------------- q317


def test_segmented_trend_matches_bruteforce_refit(spark):
    raw = _rows(
        f"""
        SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT),
               o_orderdate, COUNT(*)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1, 2 ORDER BY 1
        """
    )
    pts = [(int(x), day, int(y)) for x, day, y in raw]

    def ols_sse(seg):
        n = len(seg)
        mx = sum(x for x, _, _ in seg) / n
        my = sum(y for _, _, y in seg) / n
        sxy = sum((x - mx) * (y - my) for x, _, y in seg)
        sxx = sum((x - mx) ** 2 for x, _, _ in seg)
        b = sxy / sxx
        return sum((y - my - b * (x - mx)) ** 2 for x, _, y in seg), b

    best = None
    for i in range(2, len(pts) - 1):
        sl, bl = ols_sse(pts[:i])
        sr, br = ols_sse(pts[i:])
        key = (sl + sr, pts[i - 1][1])
        if best is None or key < best[0]:
            best = (key, pts[i - 1][1], i, bl, br, sl, sr)
    s0, _ = ols_sse(pts)
    row = REGISTRY["q317_segmented_trend"].fn(spark, SF).collect()
    assert len(row) == 1
    row = row[0]
    _, day, i, bl, br, sl, sr = best
    assert row.split_day == day
    assert (row.n_left, row.n_right) == (i, len(pts) - i)
    # brute force uses centered sums (different fp path) — tolerance-based
    assert math.isclose(row.slope_left, bl, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row.slope_right, br, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row.sse_split, sl + sr, rel_tol=1e-9)
    assert math.isclose(row.sse_null, s0, rel_tol=1e-9)
    assert math.isclose(row.gain, (s0 - (sl + sr)) / s0, rel_tol=1e-9)
    assert 0.0 <= row.gain <= 1.0


# ---------------------------------------------------------------- q318


def test_cmh_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT p.p_brand,
               CASE WHEN CAST(l.l_discount AS DECIMAL(18,2)) * 100 >= 5
                    THEN 1 ELSE 0 END,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey
        """
    )
    st: dict[str, list[int]] = {}
    for brand, e, r in raw:
        s = st.setdefault(brand, [0, 0, 0, 0])
        s[2 * (1 - e) + (1 - r)] += 1  # [a, b, c, d] layout
    num = 0.0
    den = 0.0
    for brand in sorted(st):
        a, b, c, d = st[brand]
        n = a + b + c + d
        num += a * d / n
        den += b * c / n
    got = {r.brand: r for r in
           REGISTRY["q318_cmh_pooled_odds"].fn(spark, SF).collect()}
    assert set(got) == set(st)
    for brand, (a, b, c, d) in st.items():
        row = got[brand]
        assert (row.n_exp_ret, row.n_exp_keep, row.n_unexp_ret,
                row.n_unexp_keep) == (a, b, c, d)
        if b * c == 0:
            assert row.or_stratum is None
        else:
            assert _close(row.or_stratum, a * d / (b * c))
        assert _close(row.mh_num, num)
        assert _close(row.mh_den, den)
        assert _close(row.or_mh, num / den)


# ---------------------------------------------------------------- q319


def test_hits_matches_python_replay(spark):
    raw = _rows(
        f"""
        WITH seq AS (
            SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
            FROM read_parquet('{SF}/events.parquet')
        )
        SELECT event_type, nxt, COUNT(*) FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    )
    edges = [(s, d, int(w)) for s, d, w in raw]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    h = {u: 1.0 / len(nodes) for u in nodes}
    a = {}
    for _ in range(2):
        a = {u: 0.0 for u in nodes}
        for s, d, w in sorted(edges, key=lambda e: (e[1], e[0])):
            a[d] += h[s] * w
        t = 0.0
        for u in nodes:
            t += a[u]
        a = {u: a[u] / t for u in nodes}
        h = {u: 0.0 for u in nodes}
        for s, d, w in sorted(edges, key=lambda e: (e[0], e[1])):
            h[s] += a[d] * w
        t = 0.0
        for u in nodes:
            t += h[u]
        h = {u: h[u] / t for u in nodes}
    got = {r.node: r for r in REGISTRY["q319_hits"].fn(spark, SF).collect()}
    assert set(got) == set(nodes)
    for u in nodes:
        assert _close(got[u].hub, h[u])
        assert _close(got[u].authority, a[u])
    # both score vectors are L1-normalized probability masses
    assert _close(sum(r.hub for r in got.values()), 1.0)
    assert _close(sum(r.authority for r in got.values()), 1.0)


# ---------------------------------------------------------------- q320


def test_memorization_matches_python_replay(spark):
    docs = _rows(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    )
    def grams(text):
        tk = text.split()
        return [" ".join(tk[i:i + 8]) for i in range(len(tk) - 7)]
    ref = {g for _, src, t in docs if src == "src0" for g in grams(t)}
    expected = {}
    for doc_id, src, t in docs:
        if src == "src0":
            continue
        gs = grams(t)
        if not gs:
            continue
        flags = [g in ref for g in gs]
        longest = run = 0
        for f in flags:
            run = run + 1 if f else 0
            longest = max(longest, run)
        expected[doc_id] = (len(gs), sum(flags), longest)
    got = {r.doc_id: r for r in
           REGISTRY["q320_memorization"].fn(spark, SF).collect()}
    assert set(got) == set(expected)
    for doc_id, (n, m, longest) in expected.items():
        row = got[doc_id]
        assert (row.n_grams, row.n_memorized, row.longest_run) == (n, m, longest)
        assert _close(row.mem_rate, m / n)


# ---------------------------------------------------------------- q321


def test_cohens_kappa_matches_python_replay(spark):
    from stock_data_pipeline_spark.llm.text import LANG_MARKERS

    docs = _rows(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    def predict(text):
        tk = [t for t in text.split() if t]
        scores = {
            lang: sum(1 for t in tk if t.lower() in set(m))
            for lang, m in LANG_MARKERS.items()
        }
        best = max(scores.values())
        if best == 0:
            return "und"
        return next(l for l in LANG_MARKERS if scores[l] == best)
    conf: dict[tuple, int] = {}
    for gold, text in docs:
        k = (gold, predict(text))
        conf[k] = conf.get(k, 0) + 1
    labels = {g for g, _ in conf} | {p for _, p in conf}
    n = sum(conf.values())
    agree = sum(c for (g, p), c in conf.items() if g == p)
    n_gold = {l: sum(c for (g, _), c in conf.items() if g == l) for l in labels}
    n_pred = {l: sum(c for (_, p), c in conf.items() if p == l) for l in labels}
    cx = sum(n_gold[l] * n_pred[l] for l in labels)
    po, pe = agree / n, cx / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    got = {r.label: r for r in
           REGISTRY["q321_cohens_kappa"].fn(spark, SF).collect()}
    assert set(got) == labels
    for l in labels:
        row = got[l]
        n_agree = sum(c for (g, p), c in conf.items() if g == p == l)
        assert (row.n_gold, row.n_pred, row.n_agree, row.n_total) == (
            n_gold[l], n_pred[l], n_agree, n)
        assert _close(row.po, po) and _close(row.pe, pe)
        assert _close(row.kappa, kappa)
    assert -1.0 <= kappa <= 1.0


# ---------------------------------------------------------------- q322


def test_qini_matches_rowlevel_sort_replay(spark):
    """The engine assigns deciles by value-cell interval overlap; the
    replay does it the naive way — materialize every row, sort by
    (score desc, t, y), cut by index — proving the overlap algebra
    equals true rank-range semantics."""
    raw = _rows(
        f"""
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               CASE WHEN CAST(l_discount AS DECIMAL(18,2)) * 100 >= 5
                    THEN 1 ELSE 0 END,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/lineitem.parquet')
        """
    )
    rows = sorted(((-int(v), t, y) for v, t, y in raw))
    n = len(rows)
    per = {k: [0, 0, 0, 0] for k in range(10)}
    for i, (_, t, y) in enumerate(rows):
        # rank i+1 belongs to decile k iff k*n//10 < i+1 <= (k+1)*n//10
        k = next(kk for kk in range(10)
                 if kk * n // 10 < i + 1 <= (kk + 1) * n // 10)
        s = per[k]
        if t:
            s[0] += 1
            s[2] += y
        else:
            s[1] += 1
            s[3] += y
    got = {r.decile: r for r in
           REGISTRY["q322_qini_uplift"].fn(spark, SF).collect()}
    assert set(got) == set(per)
    cnt_t = cnc = cyt = cyc = 0
    for k in range(10):
        nt, nc, yt, yc = per[k]
        cnt_t, cnc, cyt, cyc = cnt_t + nt, cnc + nc, cyt + yt, cyc + yc
        row = got[k]
        assert (row.n_treat, row.n_ctrl, row.y_treat, row.y_ctrl) == (
            nt, nc, yt, yc)
        assert (row.cum_n_treat, row.cum_n_ctrl, row.cum_y_treat,
                row.cum_y_ctrl) == (cnt_t, cnc, cyt, cyc)
        up = 0.0 if nt == 0 or nc == 0 else yt / nt - yc / nc
        qini = cyt if cnc == 0 else cyt - cyc * cnt_t / cnc
        assert _close(row.uplift_rate, up)
        assert _close(row.qini_value, qini)


# ---------------------------------------------------------------- q323


def test_label_centroid_confusion_matches_python_replay(spark):
    raw = _rows(
        f"SELECT label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    )
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for label, emb in raw:
        q = [math.floor(float(x) * 1024.0) for x in emb]
        s = sums.setdefault(label, [0] * len(q))
        for i, v in enumerate(q):
            s[i] += v
        counts[label] = counts.get(label, 0) + 1
    labels = sorted(sums)
    got = {(r.label_a, r.label_b): r for r in
           REGISTRY["q323_label_centroid_confusion"].fn(spark, SF).collect()}
    assert set(got) == {(a, b) for a in labels for b in labels if a <= b}
    for a in labels:
        for b in labels:
            if a > b:
                continue
            dot = sum(x * y for x, y in zip(sums[a], sums[b]))
            na2 = sum(x * x for x in sums[a])
            nb2 = sum(x * x for x in sums[b])
            row = got[(a, b)]
            assert (row.n_a, row.n_b, row.dot) == (counts[a], counts[b], dot)
            assert _close(row.cos_sim, dot / (math.sqrt(na2) * math.sqrt(nb2)))
    # diagonal is exactly 1 up to fp: cos(x, x) = 1
    for a in labels:
        assert _close(got[(a, a)].cos_sim, 1.0)


# ---------------------------------------------------------------- q324


def _scored_docs():
    """(doc_id, score, label) via the oracle's own scoring SQL — the
    replay then re-derives the DECOMPOSITION independently."""
    from stock_data_pipeline_spark.queries import _Q222_SCORE_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(_Q222_SCORE_SQL).fetchall()


def test_brier_decomposition_identity(spark):
    docs = sorted(_scored_docs(), key=lambda r: (r[1], r[0]))
    n = len(docs)
    base, rem = divmod(n, 10)
    bins = []
    i = 0
    for k in range(1, 11):
        size = base + (1 if k <= rem else 0)
        bins.append(docs[i:i + size])
        i += size
    fbar = [sum(s for _, s, _ in b) / len(b) for b in bins]
    obar_k = [sum(l for _, _, l in b) / len(b) for b in bins]
    pos = sum(l for _, _, l in docs)
    obar = pos / n
    rel = sum(len(b) * (f - o) ** 2 for b, f, o in zip(bins, fbar, obar_k)) / n
    res = sum(len(b) * (o - obar) ** 2 for b, o in zip(bins, obar_k)) / n
    unc = obar * (1 - obar)
    rows = REGISTRY["q324_brier_decomposition"].fn(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        b = bins[r.bin - 1]
        assert r.n == len(b)
        assert math.isclose(r.mean_score, fbar[r.bin - 1], rel_tol=1e-9)
        assert _close(r.positive_rate, obar_k[r.bin - 1])
        assert math.isclose(r.reliability, rel, rel_tol=1e-9)
        assert math.isclose(r.resolution, res, rel_tol=1e-9)
        assert _close(r.uncertainty, unc)
    # Murphy identity: rel - res + unc == the binned Brier score
    # computed DIRECTLY as the mean squared error of bin-mean forecasts
    direct = sum(
        (f - l) ** 2 for b, f in zip(bins, fbar) for _, _, l in b
    ) / n
    got = rows[0].brier_binned
    assert math.isclose(got, direct, rel_tol=1e-9)


# ---------------------------------------------------------------- q325


def test_best_of_n_matches_python_replay(spark):
    docs = _scored_docs()
    counts: dict[int, int] = {}
    for _, s, _ in docs:
        b = min(math.floor(s * 16.0), 15)
        counts[b] = counts.get(b, 0) + 1
    n = len(docs)
    buckets = sorted(counts)
    got = {(r.n_draws, r.bucket): r for r in
           REGISTRY["q325_best_of_n"].fn(spark, SF).collect()}
    assert {b for _, b in got} == set(buckets)
    for nd in (1, 2, 4, 8, 16, 32):
        c = 0
        tot_p = 0.0
        prev_mean = None
        for b in buckets:
            c0 = c
            c += counts[b]
            p = (c / n) ** nd - (c0 / n) ** nd
            row = got[(nd, b)]
            assert row.n_docs == counts[b]
            assert math.isclose(row.p_max_bucket, p, rel_tol=1e-9, abs_tol=1e-15)
            tot_p += row.p_max_bucket
        # each n's max-distribution is a probability mass
        assert math.isclose(tot_p, 1.0, rel_tol=1e-9)
    # more draws -> stochastically better bucket (E[bucket] nondecreasing)
    means = [sum(b * got[(nd, b)].p_max_bucket for b in buckets)
             for nd in (1, 2, 4, 8, 16, 32)]
    assert all(a <= b + 1e-12 for a, b in zip(means, means[1:]))


# ---------------------------------------------------------------- q326


def test_ab_power_planner_matches_python_replay(spark):
    (n, pos), = _rows(
        f"""SELECT COUNT(*), SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    (n_orders, n_days), = _rows(
        f"""SELECT COUNT(*), COUNT(DISTINCT o_orderdate)
            FROM read_parquet('{SF}/orders.parquet')"""
    )
    p = pos / n
    opd = n_orders / n_days
    za, zb = 1.95996398454005423, 0.841621233572914406
    zsum2 = (za + zb) * (za + zb)
    got = {r.delta: r for r in
           REGISTRY["q326_ab_power_planner"].fn(spark, SF).collect()}
    assert set(got) == {0.005, 0.01, 0.02, 0.05}
    prev = None
    for d in (0.005, 0.01, 0.02, 0.05):
        expect = zsum2 * (p * (1 - p) + (p + d) * (1 - p - d)) / (d * d)
        row = got[d]
        assert _close(row.baseline_rate, p)
        assert math.isclose(row.n_per_arm, expect, rel_tol=1e-12)
        assert row.n_per_arm_ceil == math.ceil(expect)
        assert _close(row.orders_per_day, opd)
        assert row.days_needed == math.ceil(2 * expect / opd)
        # smaller effects need more samples
        if prev is not None:
            assert row.n_per_arm < prev
        prev = row.n_per_arm


# ---------------------------------------------------------------- q327


def test_cramers_v_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT o.o_orderpriority, o.o_orderstatus, c.c_mktsegment
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        """
    )
    cols = {"prio": 0, "status": 1, "seg": 2}
    pairs = [("prio_x_status", "prio", "status"),
             ("prio_x_segment", "prio", "seg"),
             ("status_x_segment", "status", "seg")]
    got = {r.pair: r for r in REGISTRY["q327_cramers_v"].fn(spark, SF).collect()}
    assert set(got) == {t for t, _, _ in pairs}
    n = len(raw)
    for tag, ca, cb in pairs:
        ia, ib = cols[ca], cols[cb]
        from collections import Counter
        cells = Counter((r[ia], r[ib]) for r in raw)
        rm = Counter(r[ia] for r in raw)
        cm = Counter(r[ib] for r in raw)
        chi2 = 0.0
        for va in sorted(rm):
            for vb in sorted(cm):
                e = rm[va] * cm[vb] / n
                o = cells.get((va, vb), 0)
                chi2 += (o - e) ** 2 / e
        row = got[tag]
        assert row.n == n
        assert math.isclose(row.chi2, chi2, rel_tol=1e-9)
        assert row.dof == (len(rm) - 1) * (len(cm) - 1)
        v = math.sqrt(chi2 / (n * min(len(rm) - 1, len(cm) - 1)))
        assert math.isclose(row.cramers_v, v, rel_tol=1e-9)
        assert 0.0 <= row.cramers_v <= 1.0 + 1e-12


# ---------------------------------------------------------------- q328


def test_group_sequential_matches_python_replay(spark):
    raw = _rows(
        f"""
        SELECT o_orderdate, o_orderkey % 2,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet')
        """
    )
    days = sorted({d for d, _, _ in raw})
    nd = len(days)
    look = {d: (i * 5) // nd + 1 for i, d in enumerate(days)}
    per = {k: [0, 0, 0, 0] for k in range(1, 6)}
    for d, arm, conv in raw:
        s = per[look[d]]
        if arm == 0:
            s[0] += 1
            s[2] += conv
        else:
            s[1] += 1
            s[3] += conv
    got = {r.look: r for r in
           REGISTRY["q328_group_sequential"].fn(spark, SF).collect()}
    assert set(got) == set(per)
    n0 = n1 = c0 = c1 = 0
    prev_boundary = None
    for k in range(1, 6):
        a0, a1, b0, b1 = per[k]
        n0, n1, c0, c1 = n0 + a0, n1 + a1, c0 + b0, c1 + b1
        row = got[k]
        assert (row.cum_n_ctrl, row.cum_n_treat, row.cum_conv_ctrl,
                row.cum_conv_treat) == (n0, n1, c0, c1)
        p = (c0 + c1) / (n0 + n1)
        z = (c1 / n1 - c0 / n0) / math.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
        b = 2.0401 * math.sqrt(5 / k)
        assert math.isclose(row.z_stat, z, rel_tol=1e-12)
        assert math.isclose(row.boundary, b, rel_tol=1e-12)
        assert row.crossed == (abs(z) > b)
        # O'Brien-Fleming boundaries tighten monotonically
        if prev_boundary is not None:
            assert row.boundary < prev_boundary
        prev_boundary = row.boundary


# ---------------------------------------------------------------- q329


def test_raking_matches_python_replay_and_margins(spark):
    raw = _rows(
        f"SELECT c_nationkey, c_mktsegment, c_acctbal FROM read_parquet('{SF}/customer.parquet')"
    )
    from collections import Counter
    samp = Counter((nk, seg) for nk, seg, bal in raw if bal >= 0)
    tn = Counter(nk for nk, _, _ in raw)
    ts = Counter(seg for _, seg, _ in raw)
    w = {cell: 1.0 for cell in samp}
    for _ in range(3):
        for nk in sorted({c[0] for c in w}):
            cur = sum(w[c] * samp[c] for c in sorted(w) if c[0] == nk)
            for c in w:
                if c[0] == nk:
                    w[c] *= tn[nk] / cur
        for seg in sorted({c[1] for c in w}):
            cur = sum(w[c] * samp[c] for c in sorted(w) if c[1] == seg)
            for c in w:
                if c[1] == seg:
                    w[c] *= ts[seg] / cur
    got = {(r.nationkey, r.segment): r for r in
           REGISTRY["q329_raking_ipf"].fn(spark, SF).collect()}
    assert set(got) == set(samp)
    for cell, cnt in samp.items():
        row = got[cell]
        assert row.n_sample == cnt
        assert (row.target_nation, row.target_segment) == (tn[cell[0]], ts[cell[1]])
        assert math.isclose(row.weight, w[cell], rel_tol=1e-9)
        assert math.isclose(row.weighted_count, row.weight * cnt, rel_tol=1e-12)
    # after the final segment step, segment margins are matched EXACTLY
    # (up to fp) and nation margins nearly (IPF converging)
    for seg in ts:
        tot = sum(r.weighted_count for (nk, s), r in got.items() if s == seg)
        assert math.isclose(tot, ts[seg], rel_tol=1e-9)
    for nk in tn:
        tot = sum(r.weighted_count for (n2, s), r in got.items() if n2 == nk)
        assert math.isclose(tot, tn[nk], rel_tol=0.05)


# ---------------------------------------------------------------- q330


def test_curriculum_interleave_matches_python_replay(spark):
    docs = _rows(
        f"SELECT doc_id, n_chars FROM read_parquet('{SF}/documents.parquet')"
    )
    buckets: dict[int, list[int]] = {}
    for doc_id, n_chars in docs:
        buckets.setdefault(min(n_chars // 400, 3), []).append(doc_id)
    expected = {}
    for b, ids in buckets.items():
        for r, doc_id in enumerate(sorted(ids), 1):
            expected[doc_id] = (b, r, (r - 1) * 4 + b)
    got = {r.doc_id: r for r in
           REGISTRY["q330_curriculum_interleave"].fn(spark, SF).collect()}
    assert {d: (r.bucket, r.rank_in_bucket, r.position)
            for d, r in got.items()} == expected
    # positions are globally unique, and within any aligned stride of 4
    # the bucket ids are distinct (round-robin property)
    positions = sorted(r.position for r in got.values())
    assert len(set(positions)) == len(positions)
    by_pos = {r.position: r.bucket for r in got.values()}
    for p, b in by_pos.items():
        assert p % 4 == b


# ---------------------------------------------------------------- q331


def test_sampled_quantiles_matches_python_replay(spark):
    def mix31(u):
        m = 2147483647
        a = (u * 48271 + 11) % m
        b = ((a ^ (a >> 16)) * 69621) % m
        return b ^ (b >> 16)

    raw = _rows(
        f"""SELECT l_orderkey, l_linenumber,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    full = sorted(c for _, _, c in raw)
    samp = sorted(c for ok, ln, c in raw if mix31(ok * 8 + ln) % 64 == 0)
    specs = [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p90", 9, 10),
             ("p99", 99, 100)]
    got = {r.label: r for r in
           REGISTRY["q331_sampled_quantiles"].fn(spark, SF).collect()}
    assert set(got) == {l for l, _, _ in specs}
    for label, num, den in specs:
        rf = (num * len(full) + den - 1) // den
        rs = (num * len(samp) + den - 1) // den
        exact, est = full[rf - 1], samp[rs - 1]
        row = got[label]
        assert (row.n_total, row.n_sample) == (len(full), len(samp))
        assert (row.exact_cents, row.est_cents) == (exact, est)
        assert row.abs_err_cents == abs(est - exact)
        assert _close(row.rel_err, abs(est - exact) / exact)


# ---------------------------------------------------------------- q332


def test_dp_histogram_matches_python_replay(spark):
    import math as _m

    def mix31(u):
        m = 2147483647
        a = (u * 48271 + 11) % m
        b = ((a ^ (a >> 16)) * 69621) % m
        return b ^ (b >> 16)

    raw = _rows(
        f"SELECT CAST(c_nationkey AS BIGINT), COUNT(*) FROM read_parquet('{SF}/customer.parquet') GROUP BY 1"
    )
    alpha = _m.exp(-1)
    ks = list(range(-8, 9))
    mass = [alpha ** abs(k) for k in ks]
    tot = sum(mass)
    got = {r.nationkey: r for r in
           REGISTRY["q332_dp_histogram"].fn(spark, SF).collect()}
    assert set(got) == {nk for nk, _ in raw}
    noises = []
    for nk, n_true in raw:
        u = mix31(nk * 7919 + 17) / 2147483648.0
        acc, noise = 0.0, 8
        for k, m2 in zip(ks, mass):
            acc += m2 / tot
            if u < float(f"{acc:.17e}") and k < 8:
                noise = k
                break
        row = got[nk]
        assert row.n_true == n_true
        assert row.noise == noise
        assert row.n_released == max(n_true + noise, 0)
        noises.append(noise)
    # the deterministic draws behave like the mechanism: zero-centred
    # support actually exercised on both sides
    assert min(noises) < 0 < max(noises)


# ------------------------------------------------- review-pass fixes


def test_ngrams_short_document_yields_empty_not_crash(spark):
    """sequence(1, 0) in Spark is the DESCENDING [1, 0], so an unguarded
    n-gram build crashes on any sub-n-token document (found in the
    round-5 self review). The guard must yield ZERO grams — DuckDB
    generate_series semantics — and leave normal docs untouched."""
    from stock_data_pipeline_spark.llm import dedup as dd
    from stock_data_pipeline_spark.llm.text import tokens

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    ).select("doc_id", tokens("text").alias("tk"))
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", dd.ngrams_from_tokens(F.col("tk"), 8).alias("g")
        ).collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == [
        "one two three four five six seven eight",
        "two three four five six seven eight nine",
    ]


def test_hits_rejects_zero_rounds(spark):
    from stock_data_pipeline_spark.operators.graph import hits_fixed

    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, weight long"
    )
    with pytest.raises(ValueError, match="rounds"):
        hits_fixed(edges, rounds=0)
