"""Round-5 batch-39 additions: multiple-testing corrections (q367),
phonetic blocking (q368), hash-randomization permutation test (q369),
lag-1 Granger causality (q370). Each already hash-matches its DuckDB
oracle; these tests pin SEMANTICS against independent pure-Python
replays — textbook formulas, not the query's own algebra."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _erfc_as(x: float) -> float:
    """A&S 7.1.26 with the host's exp — the SPEC q367 implements."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    p = (
        ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t
    )
    return p * math.exp(-(x * x))


# ---------------------------------------------------------------- q367


def test_multiple_testing_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT n.n_name, COUNT(*),
            SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        JOIN read_parquet('{SF}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        GROUP BY 1"""
    )
    nn = sum(r[1] for r in raw)
    kk = sum(r[2] for r in raw)
    pp = kk / nn
    ps = {}
    for name, n_i, k_i in raw:
        z = (k_i / n_i - (kk - k_i) / (nn - n_i)) / math.sqrt(
            pp * (1 - pp) * (1 / n_i + 1 / (nn - n_i))
        )
        ps[name] = (z, _erfc_as(abs(z) / math.sqrt(2.0)))
    got = {
        r.nation: r
        for r in REGISTRY["q367_multiple_testing"].fn(spark, SF).collect()
    }
    assert set(got) == set(ps)
    m = len(ps)
    for name, (z, p) in ps.items():
        assert math.isclose(got[name].z, z, rel_tol=1e-9)
        assert math.isclose(got[name].p_raw, p, rel_tol=1e-9, abs_tol=1e-300)
        # the A&S polynomial is within 1.5e-7 of true erfc
        assert abs(got[name].p_raw - math.erfc(abs(z) / math.sqrt(2.0))) < 1e-6
        assert 0.0 <= got[name].p_raw <= 1.0
    # replay Holm (step-down running max) and BH (step-up running min)
    order = sorted(ps, key=lambda k: (ps[k][1], k))
    run = 0.0
    holm = {}
    for i, name in enumerate(order, 1):
        run = max(run, (m - i + 1) * ps[name][1])
        holm[name] = min(run, 1.0)
    bh = {}
    run = math.inf
    for i, name in reversed(list(enumerate(order, 1))):
        run = min(run, ps[name][1] * m / i)
        bh[name] = min(run, 1.0)
    for name in ps:
        assert math.isclose(got[name].p_holm, holm[name], rel_tol=1e-9)
        assert math.isclose(got[name].p_bh, bh[name], rel_tol=1e-9)
        # adjusted never below raw; Holm (FWER) never below BH (FDR)
        assert got[name].p_holm >= got[name].p_raw - 1e-15
        assert got[name].p_bh >= got[name].p_raw - 1e-15
        assert got[name].p_holm >= got[name].p_bh - 1e-12
        assert got[name].reject_holm == (got[name].p_holm <= 0.05)
        assert got[name].reject_bh == (got[name].p_bh <= 0.10)


# ---------------------------------------------------------------- q368


def _soundex_simplified(word: str) -> str:
    mapping = dict(zip("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202"))
    w = word.upper()
    digits = [mapping[ch] for ch in w]
    collapsed = [digits[0]]
    for d in digits[1:]:
        if d != collapsed[-1]:
            collapsed.append(d)
    tail = "".join(d for d in collapsed[1:] if d != "0")
    return w[0] + (tail[:3] + "000")[:3]


def test_phonetic_blocking_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT upper(split_part(p_name, ' ', 1)), COUNT(*)
        FROM read_parquet('{SF}/part.parquet') GROUP BY 1"""
    )
    blocks: dict[str, dict[str, int]] = {}
    for w, c in raw:
        blocks.setdefault(_soundex_simplified(w), {})[w] = c
    got = {
        r.code: r
        for r in REGISTRY["q368_phonetic_blocking"].fn(spark, SF).collect()
    }
    assert set(got) == set(blocks)
    for code, words in blocks.items():
        n = sum(words.values())
        assert got[code].n_parts == n
        assert got[code].n_words == len(words)
        assert got[code].pairs_in_block == n * (n - 1) // 2
    # soundex shape: letter + exactly 3 digits
    for code in got:
        assert len(code) == 4 and code[0].isalpha() and code[1:].isdigit()


# ---------------------------------------------------------------- q369


def test_permutation_test_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(l_orderkey AS BIGINT) * 8 + l_linenumber,
            CAST(l_quantity AS BIGINT), l_returnflag
        FROM read_parquet('{SF}/lineitem.parquet')
        WHERE l_returnflag IN ('R', 'N')"""
    )
    osa = sum(q for _, q, f in raw if f == "R")
    ona = sum(1 for *_, f in raw if f == "R")
    osb = sum(q for _, q, f in raw if f == "N")
    onb = sum(1 for *_, f in raw if f == "N")
    obs = abs(osa / ona - osb / onb)
    got = {
        r.round_id: r
        for r in REGISTRY["q369_permutation_test"].fn(spark, SF).collect()
    }
    assert sorted(got) == list(range(1, 200))
    for r in (1, 7, 199):
        sa = na = sb = nb = 0
        for rid, q, _ in raw:
            # bit 45 of the squared 31-bit affine hash — affine bits
            # (low or high) degenerate, see the q369 docstring
            h1 = (rid * 2654435761 + r * 40503) % 2147483648
            if (h1 * h1) % 70368744177664 >= 35184372088832:
                sa += q
                na += 1
            else:
                sb += q
                nb += 1
        row = got[r]
        assert (row.n_a, row.n_b) == (na, nb)
        assert math.isclose(row.perm_diff, abs(sa / na - sb / nb), rel_tol=1e-12)
        assert math.isclose(row.obs_diff, obs, rel_tol=1e-12)
        assert row.exceeds == (row.perm_diff >= row.obs_diff)
    # Bernoulli(1/2) relabeling concentrates near half-half
    n_tot = ona + onb
    for row in got.values():
        assert abs(row.n_a - n_tot / 2) < 0.1 * n_tot
    # the permutation null must be non-degenerate: many distinct
    # labelings → many distinct perm_diff values (the low-bit bug
    # produced exactly ONE value across all 199 rounds)
    distinct_diffs = {round(r.perm_diff, 15) for r in got.values()}
    assert len(distinct_diffs) >= 150
    # a p-value is derivable and in (0, 1]
    p = (1 + sum(r.exceeds for r in got.values())) / 200
    assert 0.0 < p <= 1.0


# ---------------------------------------------------------------- q370


def test_granger_matches_python_replay(spark):
    da = dict(
        _rows(
            f"""SELECT CAST(l_shipdate AS DATE), COUNT(*)
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"""
        )
    )
    db = dict(
        _rows(
            f"""SELECT CAST(o_orderdate AS DATE), COUNT(*)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"""
        )
    )
    days = sorted(set(da) & set(db))
    series = [(da[d], db[d]) for d in days]

    def ols_rss(y, xs):
        # exact-enough float normal equations via centered moments
        n = len(y)
        my = sum(y) / n
        mx = [sum(col) / n for col in xs]
        cyy = sum((v - my) ** 2 for v in y)
        if not xs:
            return cyy
        import itertools

        k = len(xs)
        cxx = [[sum((xs[i][t] - mx[i]) * (xs[j][t] - mx[j]) for t in range(n))
                for j in range(k)] for i in range(k)]
        cxy = [sum((xs[i][t] - mx[i]) * (y[t] - my) for t in range(n))
               for i in range(k)]
        if k == 1:
            expl = cxy[0] ** 2 / cxx[0][0]
        else:
            det = cxx[0][0] * cxx[1][1] - cxx[0][1] ** 2
            expl = (
                cxx[1][1] * cxy[0] ** 2
                - 2 * cxx[0][1] * cxy[0] * cxy[1]
                + cxx[0][0] * cxy[1] ** 2
            ) / det
        return cyy - expl

    got = {
        r.direction: r
        for r in REGISTRY["q370_granger_causality"].fn(spark, SF).collect()
    }
    assert set(got) == {"orders->shipments", "shipments->orders"}
    n = len(series) - 1
    # direction orders->shipments: target a_t, own lag a_{t-1}, cross b_{t-1}
    a = [s[0] for s in series]
    b = [s[1] for s in series]
    for direction, tgt, own, cross in [
        ("orders->shipments", a[1:], a[:-1], b[:-1]),
        ("shipments->orders", b[1:], b[:-1], a[:-1]),
    ]:
        rss_r = ols_rss(tgt, [own])
        rss_f = ols_rss(tgt, [own, cross])
        f_stat = (rss_r - rss_f) * (n - 3) / rss_f
        row = got[direction]
        assert row.n_obs == n
        assert math.isclose(row.f_stat, f_stat, rel_tol=1e-6)
        assert math.isclose(
            row.partial_r2, (rss_r - rss_f) / rss_r, rel_tol=1e-6
        )
        assert 0.0 <= row.partial_r2 < 1.0
        assert row.f_stat >= 0.0
