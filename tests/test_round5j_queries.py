"""Round-5 batch-38 additions: Box-Jenkins diagnostics (q364),
Cramér-von Mises two-sample test (q365), variance inflation factors
(q366). Each already hash-matches its DuckDB oracle; these tests pin
SEMANTICS against independent pure-Python replays — the q364 replay
runs the textbook Durbin-Levinson recursion on float autocovariances
computed the direct (mean-subtracted) way, so both the n²-scaling
algebra AND the unrolled recursion are cross-checked."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


# ---------------------------------------------------------------- q364


def test_ts_diagnostics_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(l_shipdate AS DATE), CAST(COUNT(*) AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1 ORDER BY 1"""
    )
    ys = [float(y) for _, y in raw]
    n = len(ys)
    mean = sum(ys) / n
    dev = [y - mean for y in ys]
    c0 = sum(d * d for d in dev)
    r = {k: sum(dev[t] * dev[t + k] for t in range(n - k)) / c0 for k in range(1, 6)}
    # Durbin-Levinson
    phi = {1: {1: r[1]}}
    for m in range(2, 6):
        num = r[m] - sum(phi[m - 1][j] * r[m - j] for j in range(1, m))
        den = 1.0 - sum(phi[m - 1][j] * r[j] for j in range(1, m))
        pmm = num / den
        phi[m] = {j: phi[m - 1][j] - pmm * phi[m - 1][m - j] for j in range(1, m)}
        phi[m][m] = pmm
    got = {row.lag: row for row in REGISTRY["q364_ts_diagnostics"].fn(spark, SF).collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]
    lb = 0.0
    for k in range(1, 6):
        row = got[k]
        assert row.n_days == n
        assert math.isclose(row.acf, r[k], rel_tol=1e-9)
        assert math.isclose(row.pacf, phi[k][k], rel_tol=1e-7, abs_tol=1e-9)
        lb += r[k] * r[k] / (n - k)
        assert math.isclose(row.ljung_box_q, n * (n + 2) * lb, rel_tol=1e-7)
        assert -1.0 <= row.acf <= 1.0
        assert -1.0 <= row.pacf <= 1.0
    # pacf at lag 1 equals acf at lag 1 by definition
    assert _close(got[1].acf, got[1].pacf)


# ---------------------------------------------------------------- q365


def test_cramer_von_mises_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(l_quantity AS BIGINT), l_returnflag
        FROM read_parquet('{SF}/lineitem.parquet')
        WHERE l_returnflag IN ('R', 'N')"""
    )
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for v, flag in raw:
        (ca if flag == "R" else cb)[v] = (ca if flag == "R" else cb).get(v, 0) + 1
    n = sum(ca.values())
    m = sum(cb.values())
    vals = sorted(set(ca) | set(cb))
    cuma = cumb = 0
    ws = 0.0
    expected = {}
    for v in vals:
        cuma += ca.get(v, 0)
        cumb += cb.get(v, 0)
        gap = cuma * m - cumb * n
        ws += (ca.get(v, 0) + cb.get(v, 0)) * float(gap) * float(gap)
        expected[v] = (ca.get(v, 0), cb.get(v, 0), cuma, cumb)
    t_ref = ws / (n * m * (n + m) * (n + m))
    got = REGISTRY["q365_cramer_von_mises"].fn(spark, SF).collect()
    assert len(got) == len(vals)
    for row in got:
        a, b, cu, cv = expected[row.quantity]
        assert (row.count_r, row.count_n, row.cum_r, row.cum_n) == (a, b, cu, cv)
        assert math.isclose(row.cvm_t, t_ref, rel_tol=1e-9)
    assert got[0].cvm_t >= 0.0


# ---------------------------------------------------------------- q366


def test_vif_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(l_quantity AS BIGINT),
               CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
               CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    n = len(raw)
    cols = list(zip(*raw))

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(x * y for x, y in zip(a, b))
        saa = sum(x * x for x in a)
        sbb = sum(y * y for y in b)
        return (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )

    r12 = corr(cols[0], cols[1])
    r13 = corr(cols[0], cols[2])
    r23 = corr(cols[1], cols[2])
    rsq = {
        "quantity": (r12 * r12 + r13 * r13 - 2 * r12 * r13 * r23) / (1 - r23 * r23),
        "discount": (r12 * r12 + r23 * r23 - 2 * r12 * r23 * r13) / (1 - r13 * r13),
        "tax": (r13 * r13 + r23 * r23 - 2 * r13 * r23 * r12) / (1 - r12 * r12),
    }
    got = REGISTRY["q366_vif"].fn(spark, SF).collect()
    assert len(got) == 3
    for row in got:
        ref = rsq[row.regressor]
        assert row.n == n
        assert math.isclose(row.r_squared, ref, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(row.vif, 1.0 / (1.0 - ref), rel_tol=1e-9)
        assert row.vif >= 1.0 - 1e-9  # VIF is bounded below by 1
