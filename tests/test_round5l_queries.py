"""Round-5 batch-40 additions: OLS residual diagnostics (q371
Breusch-Pagan, q372 Durbin-Watson, q374 Cook's distance) and
instrumental-variable 2SLS (q373). Each already hash-matches its
DuckDB oracle; these tests pin SEMANTICS against independent
pure-Python replays — textbook formulas over the raw frames, not the
query's own moment algebra."""

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


def _ols(pts):
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    sxy = sum((x - mx) * (y - my) for x, y in pts)
    b = sxy / sxx
    a = my - b * mx
    resid = [(x, y - a - b * x) for x, y in pts]
    return a, b, resid


def _erfc_as(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    p = (
        ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t
    )
    return p * math.exp(-(x * x))


# ---------------------------------------------------------------- q371


def test_breusch_pagan_matches_python_replay(spark):
    pts = _daily()
    n = len(pts)
    _, slope, resid = _ols(pts)
    u = [(x, e * e) for x, e in resid]
    mu = sum(v for _, v in u) / n
    mx = sum(x for x, _ in u) / n
    sux = sum((x - mx) * (v - mu) for x, v in u)
    suu = sum((v - mu) ** 2 for _, v in u)
    sxx = sum((x - mx) ** 2 for x, _ in u)
    r2 = sux * sux / (suu * sxx)
    lm = n * r2
    p = _erfc_as(math.sqrt(lm / 2.0))
    [row] = REGISTRY["q371_breusch_pagan"].fn(spark, SF).collect()
    assert row.n_days == n
    assert math.isclose(row.slope, slope, rel_tol=1e-9)
    assert math.isclose(row.aux_r2, r2, rel_tol=1e-7)
    assert math.isclose(row.lm_stat, lm, rel_tol=1e-7)
    assert math.isclose(row.p_value, p, rel_tol=1e-6, abs_tol=1e-300)
    # the A&S polynomial tracks the true chi-square(1) survival function
    assert abs(row.p_value - math.erfc(math.sqrt(lm / 2.0))) < 1e-6
    assert 0.0 <= row.aux_r2 <= 1.0
    assert row.heteroscedastic == (row.p_value <= 0.05)


# ---------------------------------------------------------------- q372


def test_durbin_watson_matches_python_replay(spark):
    pts = _daily()
    _, slope, resid = _ols(pts)
    es = [e for _, e in resid]  # already day-ordered
    dw = sum(
        (es[t] - es[t - 1]) ** 2 for t in range(1, len(es))
    ) / sum(e * e for e in es)
    [row] = REGISTRY["q372_durbin_watson"].fn(spark, SF).collect()
    assert row.n_days == len(pts)
    assert row.n_diffs == len(pts) - 1
    assert math.isclose(row.slope, slope, rel_tol=1e-9)
    assert math.isclose(row.dw, dw, rel_tol=1e-9)
    assert math.isclose(row.rho_hat, 1.0 - dw / 2.0, rel_tol=1e-9)
    assert 0.0 < row.dw < 4.0  # DW's hard range
    assert row.positive_autocorr == (row.dw < 1.5)


# ---------------------------------------------------------------- q373


def test_iv_2sls_matches_python_replay(spark):
    per = _rows(
        f"""SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT),
               COUNT(*),
               SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT))
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/lineitem.parquet') l
          ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, 1"""
    )
    n = len(per)
    mz = sum(z for z, _, _ in per) / n
    mx = sum(x for _, x, _ in per) / n
    my = sum(y for _, _, y in per) / n
    czy = sum((z - mz) * (y - my) for z, _, y in per)
    czx = sum((z - mz) * (x - mx) for z, x, _ in per)
    czz = sum((z - mz) ** 2 for z, _, _ in per)
    cxy = sum((x - mx) * (y - my) for _, x, y in per)
    cxx = sum((x - mx) ** 2 for _, x, _ in per)
    beta_ols = cxy / cxx
    beta_iv = czy / czx
    r2_fs = czx * czx / (czz * cxx)
    f_fs = (n - 2) * r2_fs / (1 - r2_fs)
    [row] = REGISTRY["q373_iv_2sls"].fn(spark, SF).collect()
    assert row.n_orders == n
    assert math.isclose(row.beta_ols, beta_ols, rel_tol=1e-9)
    assert math.isclose(row.beta_iv, beta_iv, rel_tol=1e-9)
    assert math.isclose(row.iv_ols_gap, beta_iv - beta_ols, rel_tol=1e-6)
    assert math.isclose(row.first_stage_r2, r2_fs, rel_tol=1e-9)
    assert math.isclose(row.first_stage_f, f_fs, rel_tol=1e-9)
    assert 0.0 <= row.first_stage_r2 <= 1.0
    assert row.instrument_strong == (row.first_stage_f > 10.0)


# ---------------------------------------------------------------- q374


def test_cooks_distance_matches_python_replay(spark):
    pts = _daily()
    n = len(pts)
    _, _, resid = _ols(pts)
    mx = sum(x for x, _ in pts) / n
    sxx = sum((x - mx) ** 2 for x, _ in pts)
    sse = sum(e * e for _, e in resid)
    s2 = sse / (n - 2)
    scored = []
    for x, e in resid:
        h = 1.0 / n + (x - mx) ** 2 / sxx
        d = e * e * h / (2 * s2 * (1 - h) ** 2)
        scored.append((x, e, h, d))
    top = sorted(scored, key=lambda t: (-t[3], t[0]))[:10]
    got = sorted(
        REGISTRY["q374_cooks_distance"].fn(spark, SF).collect(),
        key=lambda r: r.rk,
    )
    assert len(got) == 10
    for row, (x, e, h, d) in zip(got, top):
        assert row.day_offset == x
        assert math.isclose(row.residual, e, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(row.leverage, h, rel_tol=1e-9)
        assert math.isclose(row.cooks_d, d, rel_tol=1e-7)
        # hat-matrix diagonal bounds for a 2-parameter model
        assert 1.0 / n <= row.leverage < 1.0
        assert row.cooks_d >= 0.0
    # ranks descend in influence
    assert all(
        got[i].cooks_d >= got[i + 1].cooks_d for i in range(len(got) - 1)
    )
