"""Round-5 batch-32 additions: McNemar (q338), Jarque–Bera shape audit
(q339), empirical-Bayes shrinkage (q340), Kaplan–Meier with Greenwood
CI (q341), AMS F2 sketch (q342). Each already hash-matches its DuckDB
oracle; these tests pin SEMANTICS against independent pure-Python
replays from the raw parquet (scipy-free closed forms, scratch
cumulative products instead of array folds), so an engine-symmetric
bug cannot hide behind the oracle."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY, _AMS_ROWS

SF = "/root/testdata/sf0.001"
M31 = 2147483647


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def _mix31(u: int) -> int:
    a = (u * 48271 + 11) % M31
    b = ((a ^ (a >> 16)) * 69621) % M31
    return b ^ (b >> 16)


# ---------------------------------------------------------------- q338


def test_mcnemar_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_linestatus, l_quantity, l_discount, l_returnflag
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    st: dict[str, list[int]] = {}
    for ls, q, disc, rf in raw:
        truth = rf == "R"
        a = (q >= 25) == truth
        b = (disc >= 0.05) == truth
        s = st.setdefault(ls, [0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += a
        s[2] += b
        s[3] += a and not b
        s[4] += b and not a
    got = REGISTRY["q338_mcnemar"].fn(spark, SF).collect()
    assert len(got) == len(st)
    for row in got:
        n, na, nb, only_a, only_b = st[row.linestatus]
        assert (row.n, row.n_a_correct, row.n_b_correct) == (n, na, nb)
        assert (row.only_a, row.only_b) == (only_a, only_b)
        ref = (only_a - only_b) ** 2 / (only_a + only_b) if only_a + only_b else 0.0
        assert _close(row.mcnemar_chi2, ref)


# ---------------------------------------------------------------- q339


def test_jarque_bera_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    st: dict[tuple[str, str], list[int]] = {}
    for rf, ls, q in raw:
        s = st.setdefault((rf, ls), [0, 0, 0, 0, 0])
        s[0] += 1
        s[1] += q
        s[2] += q * q
        s[3] += q**3
        s[4] += q**4
    got = REGISTRY["q339_jarque_bera"].fn(spark, SF).collect()
    assert len(got) == len(st)
    for row in got:
        n, s1, s2, s3, s4 = st[(row.returnflag, row.linestatus)]
        e1, e2, e3, e4 = s1 / n, s2 / n, s3 / n, s4 / n
        m2 = e2 - e1 * e1
        m3 = e3 - 3 * e1 * e2 + 2 * e1**3
        m4 = e4 - 4 * e1 * e3 + 6 * e1 * e1 * e2 - 3 * e1**4
        sk = m3 / (m2 * math.sqrt(m2))
        kx = m4 / (m2 * m2) - 3.0
        assert row.n == n
        assert _close(row.mean_qty, e1)
        assert _close(row.variance_pop, m2)
        assert _close(row.skewness, sk)
        assert _close(row.kurtosis_excess, kx)
        assert _close(row.jarque_bera, n / 6.0 * (sk * sk + kx * kx / 4.0))
    # quantity is ~uniform(1..50): flat-topped → strongly platykurtic
    assert all(r.kurtosis_excess < -0.5 for r in got)


# ---------------------------------------------------------------- q340


def test_eb_shrinkage_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT p.p_brand, l.l_returnflag
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey"""
    )
    st: dict[str, list[int]] = {}
    for brand, rf in raw:
        s = st.setdefault(brand, [0, 0])
        s[0] += 1
        s[1] += rf == "R"
    g = len(st)
    mean_p = sum(st[b][1] / st[b][0] for b in sorted(st)) / g
    var_p = sum((st[b][1] / st[b][0] - mean_p) ** 2 for b in sorted(st)) / g
    m_raw = mean_p * (1 - mean_p) / var_p - 1 if var_p > 0 else 0.0
    m = m_raw if var_p > 0 and m_raw > 0 else 1.0
    got = REGISTRY["q340_eb_shrinkage"].fn(spark, SF).collect()
    assert len(got) == g
    for row in got:
        n, x = st[row.brand]
        assert (row.n, row.x) == (n, x)
        assert _close(row.raw_rate, x / n)
        assert math.isclose(row.prior_mean, mean_p, rel_tol=1e-9)
        assert math.isclose(row.prior_var, var_p, rel_tol=1e-9)
        assert math.isclose(row.prior_strength, m, rel_tol=1e-9)
        assert math.isclose(
            row.shrunk_rate, (x + mean_p * m) / (n + m), rel_tol=1e-9
        )
        # shrinkage moves every rate TOWARD the prior, never past it
        lo, hi = sorted((row.raw_rate, row.prior_mean))
        assert lo - 1e-12 <= row.shrunk_rate <= hi + 1e-12


# ---------------------------------------------------------------- q341


def test_kaplan_meier_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT o_custkey,
               CAST((year(max(o_orderdate)) - year(min(o_orderdate))) * 4
                    + (quarter(max(o_orderdate)) - quarter(min(o_orderdate)))
                    AS BIGINT),
               CASE WHEN max(o_orderdate) >= TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"""
    )
    hist: dict[int, list[int]] = {}
    for _, t, cen in raw:
        s = hist.setdefault(t, [0, 0])
        s[1 if cen else 0] += 1
    total = len(raw)
    ts = sorted(hist)
    seen = 0
    s_km = 1.0
    gw = 0.0
    expected = {}
    for t in ts:
        d, c = hist[t]
        n = total - seen
        s_km *= 1.0 - d / n
        if n > d:
            gw += d / (n * (n - d))
        expected[t] = (n, d, c, s_km, gw)
        seen += d + c
    got = REGISTRY["q341_kaplan_meier"].fn(spark, SF).collect()
    assert len(got) == len(ts)
    z = 1.95996398454005423
    for row in got:
        n, d, c, s, g = expected[row.tenure_q]
        assert (row.n_risk, row.d_churned, row.c_censored) == (n, d, c)
        assert _close(row.s_km, s)
        assert _close(row.greenwood_var, s * s * g)
        assert math.isclose(row.ci_lo, s - z * math.sqrt(s * s * g), rel_tol=1e-9)
        assert math.isclose(row.ci_hi, s + z * math.sqrt(s * s * g), rel_tol=1e-9)
    # survival curve is monotone non-increasing in t
    curve = [r.s_km for r in sorted(got, key=lambda r: r.tenure_q)]
    assert all(a >= b - 1e-15 for a, b in zip(curve, curve[1:]))
    # nobody censored before the 2001 cutoff cohort appears
    assert sum(r.c_censored for r in got) == sum(1 for _, _, c in raw if c)


# ---------------------------------------------------------------- q342


def test_ams_f2_matches_python_replay(spark):
    raw = _rows(
        f"SELECT l_partkey FROM read_parquet('{SF}/lineitem.parquet')"
    )
    keys = [k for (k,) in raw]
    sketches = []
    for a, b in _AMS_ROWS:
        sketches.append(sum(1 - 2 * (_mix31(k * a + b) % 2) for k in keys))
    freq: dict[int, int] = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    f2 = sum(c * c for c in freq.values())
    ests = sorted(s * s for s in sketches)
    med = (ests[3] + ests[4]) / 2.0
    got = REGISTRY["q342_ams_f2"].fn(spark, SF).collect()
    assert len(got) == len(_AMS_ROWS)
    for row in got:
        assert row.sketch_sum == sketches[row.sketch_id]
        assert row.estimate == sketches[row.sketch_id] ** 2
        assert row.f2_exact == f2
        assert _close(row.est_mean, sum(ests) / 8.0)
        assert _close(row.est_median, med)
        assert _close(row.rel_error_median, (med - f2) / f2)
    # the median-of-8 estimate should land within 3x of truth
    assert f2 / 3 <= med <= 3 * f2
