"""Round-5 batch-41 additions: portable-trig spectral analysis (q375
periodogram, q376 harmonic regression), corpus temporal novelty
(q377), deterministic RANSAC line fit (q378). Each already
hash-matches its DuckDB oracle; these tests pin SEMANTICS against
independent pure-Python replays using the HOST's math.cos/sin —
also proving the portable Taylor trig tracks true trig."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _daily():
    return _rows(
        f"""SELECT CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
                        AS BIGINT), COUNT(*)
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY o_orderdate ORDER BY 1"""
    )


# ---------------------------------------------------------------- q375


def test_periodogram_matches_python_replay(spark):
    pts = _daily()
    n = len(pts)
    ybar = sum(y for _, y in pts) / n
    powers = {}
    for p in range(2, 31):
        re = sum((y - ybar) * math.cos(2 * math.pi * (x % p) / p)
                 for x, y in pts)
        im = sum((y - ybar) * math.sin(2 * math.pi * (x % p) / p)
                 for x, y in pts)
        powers[p] = re * re + im * im
    total = sum(powers.values())
    got = {r.period: r for r in
           REGISTRY["q375_periodogram"].fn(spark, SF).collect()}
    assert set(got) == set(powers)
    for p, pw in powers.items():
        # engine trig is a Taylor spec within ~1e-13 of true cos/sin
        assert math.isclose(got[p].power, pw, rel_tol=1e-6, abs_tol=1e-3)
        assert math.isclose(
            got[p].power_share, pw / total, rel_tol=1e-6, abs_tol=1e-9
        )
    shares = sum(r.power_share for r in got.values())
    assert math.isclose(shares, 1.0, rel_tol=1e-9)
    ranked = sorted(got.values(), key=lambda r: r.rk)
    assert all(
        ranked[i].power >= ranked[i + 1].power for i in range(len(ranked) - 1)
    )


# ---------------------------------------------------------------- q376


def test_harmonic_regression_matches_python_replay(spark):
    pts = _daily()
    n = len(pts)
    # normal-equation solve via 3x3 Gaussian elimination on host trig
    cs = [(1.0, math.cos(2 * math.pi * (x % 7) / 7),
           math.sin(2 * math.pi * (x % 7) / 7), y) for x, y in pts]
    m = [[0.0] * 3 for _ in range(3)]
    v = [0.0] * 3
    for one, c, s, y in cs:
        row = (one, c, s)
        for i in range(3):
            v[i] += row[i] * y
            for j in range(3):
                m[i][j] += row[i] * row[j]
    # solve m·beta = v
    for col in range(3):
        piv = max(range(col, 3), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        v[col], v[piv] = v[piv], v[col]
        for r in range(col + 1, 3):
            f = m[r][col] / m[col][col]
            for j in range(col, 3):
                m[r][j] -= f * m[col][j]
            v[r] -= f * v[col]
    beta = [0.0] * 3
    for r in (2, 1, 0):
        beta[r] = (v[r] - sum(m[r][j] * beta[j] for j in range(r + 1, 3))) / m[r][r]
    a, b, c = beta
    sse_full = sum((y - a - b * ci - c * si) ** 2 for _, ci, si, y in cs)
    ybar = sum(y for *_, y in cs) / n
    sse_mean = sum((y - ybar) ** 2 for *_, y in cs)
    f_stat = ((sse_mean - sse_full) / 2) / (sse_full / (n - 3))
    [row] = REGISTRY["q376_harmonic_regression"].fn(spark, SF).collect()
    assert row.n_days == n
    assert math.isclose(row.intercept, a, rel_tol=1e-7)
    assert math.isclose(row.cos_coef, b, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(row.sin_coef, c, rel_tol=1e-5, abs_tol=1e-6)
    assert math.isclose(
        row.amplitude, math.hypot(b, c), rel_tol=1e-5, abs_tol=1e-6
    )
    assert math.isclose(row.f_stat, f_stat, rel_tol=1e-4, abs_tol=1e-6)
    assert row.seasonal == (row.f_stat > 3.0)


# ---------------------------------------------------------------- q377


def test_temporal_novelty_matches_python_replay(spark):
    docs = _rows(
        f"""SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
        ORDER BY doc_id"""
    )
    first: dict[str, int] = {}
    perdoc = []
    for doc_id, text in docs:
        toks = [t for t in text.split() if t]
        grams = {
            " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
        }
        if not grams:
            continue
        novel = 0
        for g in grams:
            if g not in first:
                first[g] = doc_id
            if first[g] == doc_id:
                novel += 1
        perdoc.append((doc_id, len(grams), novel))
    # NTILE(10): first (n mod 10) buckets get the extra row
    n = len(perdoc)
    base, extra = divmod(n, 10)
    want: dict[int, list] = {}
    idx = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        want[d] = perdoc[idx: idx + size]
        idx += size
    got = {r.decile: r for r in
           REGISTRY["q377_temporal_novelty"].fn(spark, SF).collect()}
    assert set(got) == {d for d, rows in want.items() if rows}
    for d, rows in want.items():
        if not rows:
            continue
        n_sh = sum(t[1] for t in rows)
        n_novel = sum(t[2] for t in rows)
        assert got[d].n_docs == len(rows)
        assert got[d].n_shingles == n_sh
        assert got[d].n_novel == n_novel
        assert math.isclose(got[d].novelty_rate, n_novel / n_sh, rel_tol=1e-12)
    # the first decile is maximally novel by construction
    assert got[1].novelty_rate >= max(g.novelty_rate for g in got.values()) - 1e-12


# ---------------------------------------------------------------- q378


def test_ransac_matches_python_replay(spark):
    pts = _daily()  # day-ordered, so index+1 == row_number by x
    n = len(pts)
    ybar = sum(y for _, y in pts) / n
    tol = 0.15 * ybar
    best = None
    for k in range(64):
        r1 = 1 + ((k * 2654435761 + 40503) % 4294967296) % n
        r2 = 1 + ((k * 2654435761 + 81006) % 4294967296) % n
        if r1 == r2:
            continue
        x1, y1 = pts[r1 - 1]
        x2, y2 = pts[r2 - 1]
        slope = (y2 - y1) / (x2 - x1) + 0.0
        icept = y1 - slope * x1
        inl = sum(
            1 for x, y in pts if abs(y - (icept + slope * x)) <= tol
        )
        cand = (-inl, k, slope, icept, inl)
        if best is None or cand < best:
            best = cand
    _, k, slope, icept, inl = best
    [row] = REGISTRY["q378_ransac_line"].fn(spark, SF).collect()
    assert row.cand_id == k
    assert row.n_days == n
    assert row.n_inliers == inl
    assert math.isclose(row.slope, slope, rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(row.icept, icept, rel_tol=1e-12, abs_tol=1e-9)
    assert math.isclose(row.inlier_share, inl / n, rel_tol=1e-12)
    # consensus beats the trivial expectation of a vertical-noise band
    assert 0.0 < row.inlier_share <= 1.0
