"""Round-5 batch-36 additions: logistic (Platt) calibration via Newton
on aggregates (q356), log-rank survival comparison (q357), Cochran's Q
(q358), log-log price elasticity (q359). Each already hash-matches its
DuckDB oracle; these tests pin SEMANTICS against independent
pure-Python replays — the calibration replay runs the same Newton
iteration with math.exp, the log-rank replay recomputes the
hypergeometric terms from scratch — so an engine-symmetric bug cannot
hide behind the oracle."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY, _PLATT_ROUNDS

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


# ---------------------------------------------------------------- q356


def test_logistic_calibration_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT least(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT) // 5000000, 9),
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet')"""
    )
    cells: dict[int, list[int]] = {}
    for s, y in raw:
        c = cells.setdefault(s, [0, 0])
        c[0] += 1
        c[1] += y
    np_ = sum(c[1] for c in cells.values())
    nm = sum(c[0] - c[1] for c in cells.values())
    A, B = 0.0, math.log((np_ + 1) / (nm + 1))
    for _ in range(_PLATT_ROUNDS):
        gpa = gpb = haa = hab = hbb = 0.0
        for s in sorted(cells):
            n, _ = cells[s]
            pp = 1.0 / (1.0 + math.exp(-(A * s + B)))
            w = n * pp * (1 - pp)
            gpa += n * pp * s
            gpb += n * pp
            haa += w * s * s
            hab += w * s
            hbb += w
        oys = sum(cells[s][1] * s for s in cells)
        oy = np_
        det = haa * hbb - hab * hab
        ga, gb = gpa - oys, gpb - oy
        A -= (ga * hbb - gb * hab) / det
        B -= (gb * haa - ga * hab) / det
    got = REGISTRY["q356_logistic_calibration"].fn(spark, SF).collect()
    assert len(got) == len(cells)
    for row in got:
        n, ypos = cells[row.score_bucket]
        assert (row.n, row.ypos) == (n, ypos)
        assert _close(row.emp_rate, ypos / n)
        assert math.isclose(row.coef_a, A, rel_tol=1e-8)
        assert math.isclose(row.coef_b, B, rel_tol=1e-8)
        pref = 1.0 / (1.0 + math.exp(-(A * row.score_bucket + B)))
        assert math.isclose(row.calibrated_p, pref, rel_tol=1e-8)
        assert 0.0 < row.calibrated_p < 1.0
    # calibrated curve is monotone in the score (single logistic)
    pts = sorted(got, key=lambda r: r.score_bucket)
    diffs = [b.calibrated_p - a.calibrated_p for a, b in zip(pts, pts[1:])]
    assert all(d >= 0 for d in diffs) or all(d <= 0 for d in diffs)


# ---------------------------------------------------------------- q357


def test_logrank_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT o.o_custkey,
               CAST((year(max(o.o_orderdate)) - year(min(o.o_orderdate))) * 4
                    + (quarter(max(o.o_orderdate))
                       - quarter(min(o.o_orderdate))) AS BIGINT),
               CASE WHEN max(o.o_orderdate) >= TIMESTAMP '2001-01-01'
                    THEN 1 ELSE 0 END,
               CASE WHEN max(c.c_mktsegment) = 'BUILDING' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        GROUP BY 1"""
    )
    hist: dict[tuple[int, int], list[int]] = {}
    for _, t, cen, grp in raw:
        s = hist.setdefault((t, grp), [0, 0])
        s[0] += 1 - cen
        s[1] += 1
    times = sorted({t for t, _ in hist})
    o1 = e1s = vs = 0.0
    expected = {}
    for t in times:
        d1, m1 = hist.get((t, 1), [0, 0])
        d2, m2 = hist.get((t, 0), [0, 0])
        n1 = sum(hist.get((u, 1), [0, 0])[1] for u in times if u >= t)
        n2 = sum(hist.get((u, 0), [0, 0])[1] for u in times if u >= t)
        if n1 + n2 == 0:
            continue
        frac = n1 / (n1 + n2)
        e1 = (d1 + d2) * frac
        v = (
            (d1 + d2) * frac * (1 - frac) * (n1 + n2 - d1 - d2) / (n1 + n2 - 1)
            if n1 + n2 > 1
            else 0.0
        )
        o1 += d1
        e1s += e1
        vs += v
        expected[t] = (d1, n1, d2, n2, e1)
    chi2 = (o1 - e1s) ** 2 / vs
    got = REGISTRY["q357_logrank_test"].fn(spark, SF).collect()
    assert len(got) == len(expected)
    for row in got:
        d1, n1, d2, n2, e1 = expected[row.tenure_q]
        assert (row.d_building, row.risk_building) == (d1, n1)
        assert (row.d_other, row.risk_other) == (d2, n2)
        assert _close(row.expected_building, e1)
        assert row.observed_total == int(o1)
        assert math.isclose(row.expected_total, e1s, rel_tol=1e-9)
        assert math.isclose(row.logrank_chi2, chi2, rel_tol=1e-9)
    assert got[0].logrank_chi2 >= 0.0


# ---------------------------------------------------------------- q358


def test_cochrans_q_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_quantity, l_discount, l_tax
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    g1 = g2 = g3 = sr2 = s = 0
    for q, d, t in raw:
        a, b, c = q >= 25, d >= 0.05, t >= 0.04
        g1 += a
        g2 += b
        g3 += c
        r = a + b + c
        sr2 += r * r
        s += r
    q_ref = 2.0 * (3.0 * (g1 * g1 + g2 * g2 + g3 * g3) - s * s) / (3.0 * s - sr2)
    (row,) = REGISTRY["q358_cochrans_q"].fn(spark, SF).collect()
    assert (row.n, row.g1, row.g2, row.g3, row.s) == (len(raw), g1, g2, g3, s)
    assert _close(row.cochran_q, q_ref)
    assert row.cochran_q >= 0.0


# ---------------------------------------------------------------- q359


def test_log_elasticity_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT p.p_brand,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               CAST(l.l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') l
        JOIN read_parquet('{SF}/part.parquet') p ON l.l_partkey = p.p_partkey"""
    )
    cells: dict[tuple[str, int], list[int]] = {}
    for brand, cents, q in raw:
        c = cells.setdefault((brand, cents // 100000), [0, 0, 0])
        c[0] += 1
        c[1] += cents
        c[2] += q
    brands: dict[str, list] = {}
    for (brand, pb), (n, sp, sq) in cells.items():
        brands.setdefault(brand, []).append(
            (pb, math.log(sp / n), math.log(sq / n))
        )
    got = REGISTRY["q359_log_elasticity"].fn(spark, SF).collect()
    assert len(got) == len(brands)
    for row in got:
        pts = sorted(brands[row.brand])
        k = len(pts)
        assert row.n_price_levels == k
        sx = sum(x for _, x, _ in pts)
        sy = sum(y for _, _, y in pts)
        sxy = sum(x * y for _, x, y in pts)
        sxx = sum(x * x for _, x, _ in pts)
        syy = sum(y * y for _, _, y in pts)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        r2 = (k * sxy - sx * sy) ** 2 / ((k * sxx - sx * sx) * (k * syy - sy * sy))
        assert math.isclose(row.elasticity, slope, rel_tol=1e-7, abs_tol=1e-9)
        assert math.isclose(row.r2, r2, rel_tol=1e-7, abs_tol=1e-9)
        assert 0.0 <= row.r2 <= 1.0 + 1e-12
