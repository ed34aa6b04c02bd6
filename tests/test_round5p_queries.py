"""Round-5 batch-44 additions: AR(2) Yule-Walker (q387), clustering
coefficient (q388), Holt-Winters additive smoothing (q389),
decision-stump information gain (q390). Each already hash-matches its
DuckDB oracle; these tests pin SEMANTICS against independent
pure-Python replays. q389's replay is the test that CAUGHT DuckDB's
struct-accumulator mutation bug (the engine now folds a list state)."""

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


# ---------------------------------------------------------------- q387


def test_yule_walker_matches_python_replay(spark):
    ys = [y for _, y in _daily()]
    n = len(ys)
    ybar = sum(ys) / n
    c0 = sum((y - ybar) ** 2 for y in ys) / n
    c1 = sum((ys[t] - ybar) * (ys[t + 1] - ybar) for t in range(n - 1)) / n
    c2 = sum((ys[t] - ybar) * (ys[t + 2] - ybar) for t in range(n - 2)) / n
    r1, r2 = c1 / c0, c2 / c0
    phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    [row] = REGISTRY["q387_yule_walker_ar2"].fn(spark, SF).collect()
    assert row.n_days == n
    assert math.isclose(row.variance, c0, rel_tol=1e-9)
    assert math.isclose(row.acf1, r1, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row.acf2, r2, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row.phi1, phi1, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(row.phi2, phi2, rel_tol=1e-9, abs_tol=1e-12)
    assert math.isclose(
        row.noise_variance, c0 * (1 - (phi1 * r1 + phi2 * r2)), rel_tol=1e-9
    )
    # innovation variance can't exceed the marginal variance
    assert 0.0 < row.noise_variance <= row.variance
    assert row.stationary == (
        phi2 + phi1 < 1 and phi2 - phi1 < 1 and abs(phi2) < 1
    )


# ---------------------------------------------------------------- q388


def test_clustering_coefficient_matches_python_replay(spark):
    edges = _rows(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey"""
    )
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = 0
    for u, v in edges:
        for w in adj[u]:
            if w > v and w in adj[v]:
                tri += 1
    wedges = sum(len(nb) * (len(nb) - 1) // 2 for nb in adj.values())
    [row] = REGISTRY["q388_clustering_coefficient"].fn(spark, SF).collect()
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(edges)
    assert row.n_wedges == wedges
    assert row.n_triangles == tri
    assert math.isclose(row.global_cc, 3 * tri / wedges, rel_tol=1e-12)
    assert 0.0 <= row.global_cc <= 1.0


# ---------------------------------------------------------------- q389


def test_holt_winters_matches_python_replay(spark):
    pts = _daily()
    fl, lev, tr = -1.0, 0.0, 0.0
    s = [0.0] * 7
    se = 0.0
    for x, y in pts:
        r = x % 7
        y = float(y)
        if fl < 0:
            fl, lev, tr = 1.0, y, 0.0
        else:
            sr = s[r]
            err = y - (lev + tr + sr)
            lnew = 0.2 * (y - sr) + 0.8 * (lev + tr)
            tr = 0.1 * (lnew - lev) + 0.9 * tr
            s[r] = 0.3 * (y - lnew) + 0.7 * s[r]
            se += err * err
            lev = lnew
    n = len(pts)
    [row] = REGISTRY["q389_holt_winters"].fn(spark, SF).collect()
    assert row.n_days == n
    assert math.isclose(row.level, lev, rel_tol=1e-9)
    assert math.isclose(row.trend, tr, rel_tol=1e-9, abs_tol=1e-12)
    for j in range(7):
        assert math.isclose(
            getattr(row, f"s{j}"), s[j], rel_tol=1e-9, abs_tol=1e-12
        )
    assert math.isclose(row.sse_1step, se, rel_tol=1e-9)
    assert math.isclose(
        row.rmse_1step, math.sqrt(se / (n - 1)), rel_tol=1e-9
    )
    nxt = (pts[-1][0] + 1) % 7
    assert math.isclose(
        row.forecast_next, lev + tr + s[nxt], rel_tol=1e-9
    )
    # seasonal components of a mean-ish series stay bounded
    assert all(abs(getattr(row, f"s{j}")) < 100 for j in range(7))


# ---------------------------------------------------------------- q390


def test_stump_info_gain_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT),
               MAX(CASE WHEN o.o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END)
        FROM read_parquet('{SF}/customer.parquet') c
        LEFT JOIN read_parquet('{SF}/orders.parquet') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, 1"""
    )
    lv: dict[int, list[int]] = {}
    for bal, tgt in raw:
        e = lv.setdefault(bal, [0, 0])
        e[0] += 1
        e[1] += tgt
    bals = sorted(lv)
    n = sum(v[0] for v in lv.values())
    k = sum(v[1] for v in lv.values())

    def ent(kk, nn):
        if kk == 0 or kk == nn:
            return 0.0
        p = kk / nn
        return -p * math.log(p) - (1 - p) * math.log(1 - p)

    h_par = ent(k, n)
    scored = []
    nl = kl = 0
    for bal in bals:
        nl += lv[bal][0]
        kl += lv[bal][1]
        if nl >= n:
            break
        nr, kr = n - nl, k - kl
        h_kids = nl / n * ent(kl, nl) + nr / n * ent(kr, nr)
        scored.append((-(h_par - h_kids), bal, nl, nr, kl, kr))
    top5 = sorted(scored)[:5]
    got = sorted(
        REGISTRY["q390_stump_info_gain"].fn(spark, SF).collect(),
        key=lambda r: r.rk,
    )
    assert len(got) == 5
    for row, (ngain, bal, nl, nr, kl, kr) in zip(got, top5):
        assert row.threshold_cents == bal
        assert (row.n_left, row.n_right) == (nl, nr)
        assert (row.k_left, row.k_right) == (kl, kr)
        # portable ln is ~4e-11-accurate vs host log
        assert math.isclose(row.h_parent, h_par, rel_tol=1e-8)
        assert math.isclose(row.info_gain, -ngain, rel_tol=1e-6, abs_tol=1e-10)
        assert row.info_gain >= -1e-12
    assert all(
        got[i].info_gain >= got[i + 1].info_gain - 1e-12
        for i in range(len(got) - 1)
    )
