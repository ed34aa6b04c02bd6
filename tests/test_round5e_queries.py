"""Round-5 batch-33 additions: Kendall tau-b (q343), between-group
Theil index (q344), Jensen-Shannon source divergence (q345), Zipf
slope fit (q346), Cochran-Armitage trend test (q347). Each already
hash-matches its DuckDB oracle; these tests pin SEMANTICS against
independent pure-Python replays (O(m²) literal pair loops for tau,
math.log for the information measures), so an engine-symmetric bug
cannot hide behind the oracle."""

from __future__ import annotations

import math
import re

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def _ln_close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-10)


# ---------------------------------------------------------------- q343


def test_kendall_tau_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT c.c_custkey, CAST(c.c_nationkey AS BIGINT),
               CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT),
               CAST(COALESCE(o.cnt, 0) AS BIGINT)
        FROM read_parquet('{SF}/customer.parquet') c LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS cnt
            FROM read_parquet('{SF}/orders.parquet') GROUP BY 1
        ) o ON c.c_custkey = o.o_custkey"""
    )
    by_nation: dict[int, list] = {}
    for ck, nk, y, x in raw:
        by_nation.setdefault(nk, []).append((ck, x, y))
    expected = {}
    for nk, lst in by_nation.items():
        lst.sort()
        n0 = nc = nd = n1 = n2 = 0
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                _, x1, y1 = lst[i]
                _, x2, y2 = lst[j]
                n0 += 1
                p = (x1 - x2) * (y1 - y2)
                nc += p > 0
                nd += p < 0
                n1 += x1 == x2
                n2 += y1 == y2
        expected[nk] = (n0, nc, nd, n1, n2)
    got = REGISTRY["q343_kendall_tau"].fn(spark, SF).collect()
    assert len(got) == len(expected)
    for row in got:
        n0, nc, nd, n1, n2 = expected[row.nationkey]
        assert (row.n_pairs, row.concordant, row.discordant) == (n0, nc, nd)
        assert (row.tied_x, row.tied_y) == (n1, n2)
        assert _close(row.tau_b, (nc - nd) / math.sqrt((n0 - n1) * (n0 - n2)))
        assert -1.0 <= row.tau_b <= 1.0


# ---------------------------------------------------------------- q344


def test_theil_index_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT p.p_brand,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey"""
    )
    st: dict[str, list[int]] = {}
    for brand, cents in raw:
        s = st.setdefault(brand, [0, 0])
        s[0] += 1
        s[1] += cents
    nn = sum(s[0] for s in st.values())
    xx = sum(s[1] for s in st.values())
    theil = sum(
        st[b][1] / xx * (math.log(st[b][1] / xx) - math.log(st[b][0] / nn))
        for b in sorted(st)
    )
    got = REGISTRY["q344_theil_index"].fn(spark, SF).collect()
    assert len(got) == len(st)
    for row in got:
        n, rev = st[row.brand]
        assert (row.n, row.revenue_cents) == (n, rev)
        assert _close(row.rev_share, rev / xx)
        assert _close(row.pop_share, n / nn)
        term = rev / xx * (math.log(rev / xx) - math.log(n / nn))
        assert _ln_close(row.theil_term, term)
        assert _ln_close(row.theil_between, theil)
    assert got[0].theil_between >= -1e-9  # Theil T is non-negative


# ---------------------------------------------------------------- q345


def test_js_divergence_matches_python_replay(spark):
    raw = _rows(
        f"SELECT source, lang FROM read_parquet('{SF}/documents.parquet')"
    )
    cell: dict[tuple[str, str], int] = {}
    langs: dict[str, int] = {}
    srcs: dict[str, int] = {}
    for src, lang in raw:
        cell[(src, lang)] = cell.get((src, lang), 0) + 1
        langs[lang] = langs.get(lang, 0) + 1
        srcs[src] = srcs.get(src, 0) + 1
    gg = len(raw)
    expected = {}
    for src in srcs:
        aa = srcs[src]
        bb = gg - aa
        js = 0.0
        for lang in sorted(langs):
            a = cell.get((src, lang), 0)
            b = langs[lang] - a
            p = a / aa
            q = b / bb
            m = (p + q) / 2.0
            t = 0.0
            if a:
                t += p * math.log(p / m)
            if b:
                t += q * math.log(q / m)
            js += t / 2.0
        expected[src] = (aa, js)
    got = REGISTRY["q345_js_divergence"].fn(spark, SF).collect()
    assert len(got) == len(srcs)
    for row in got:
        aa, js = expected[row.source]
        assert row.n_docs == aa
        assert _ln_close(row.js_nats, js)
        assert _ln_close(row.js_bits, js / math.log(2.0))
        # JS is bounded: 0 <= JS <= ln 2 nats
        assert -1e-12 <= row.js_nats <= math.log(2.0) + 1e-12


# ---------------------------------------------------------------- q346


def test_zipf_slope_matches_python_replay(spark):
    raw = _rows(f"SELECT text FROM read_parquet('{SF}/documents.parquet')")
    freq: dict[str, int] = {}
    for (text,) in raw:
        for tok in re.split(r"\s+", text):
            if tok:
                freq[tok] = freq.get(tok, 0) + 1
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    k = len(ranked)
    xs = [math.log(r) for r in range(1, k + 1)]
    ys = [math.log(f) for _, f in ranked]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    intercept = (sy - slope * sx) / k
    r2 = (k * sxy - sx * sy) ** 2 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
    got = REGISTRY["q346_zipf_slope"].fn(spark, SF).collect()
    assert len(got) == k
    for row in sorted(got, key=lambda r: r.rank):
        tok, f = ranked[row.rank - 1]
        assert (row.token, row.freq) == (tok, f)
        assert _ln_close(row.ln_rank, math.log(row.rank))
        assert _ln_close(row.ln_freq, math.log(f))
        assert math.isclose(row.slope, slope, rel_tol=1e-8, abs_tol=1e-9)
        assert math.isclose(row.intercept, intercept, rel_tol=1e-8, abs_tol=1e-9)
        assert math.isclose(row.r2, r2, rel_tol=1e-8, abs_tol=1e-9)
    assert got[0].slope < 0.0  # frequency decreases with rank


# ---------------------------------------------------------------- q347


def test_cochran_armitage_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT o_orderpriority, o_orderstatus
        FROM read_parquet('{SF}/orders.parquet')"""
    )
    st: dict[str, list[int]] = {}
    for pr, status in raw:
        s = st.setdefault(pr, [0, 0])
        s[0] += 1
        s[1] += status == "F"
    nn = sum(s[0] for s in st.values())
    xx = sum(s[1] for s in st.values())
    sx = sum(int(p[0]) * st[p][1] for p in st)
    sn = sum(int(p[0]) * st[p][0] for p in st)
    ssn = sum(int(p[0]) ** 2 * st[p][0] for p in st)
    pbar = xx / nn
    tnum = sx - xx * sn / nn
    tvar = pbar * (1 - pbar) * (ssn - sn * sn / nn)
    got = REGISTRY["q347_cochran_armitage"].fn(spark, SF).collect()
    assert len(got) == len(st)
    for row in got:
        n, x = st[row.priority]
        assert (row.score, row.n, row.x) == (int(row.priority[0]), n, x)
        assert _close(row.rate, x / n)
        assert _close(row.pooled_rate, pbar)
        assert _close(row.ca_z2, tnum * tnum / tvar)
    assert got[0].ca_z2 >= 0.0
