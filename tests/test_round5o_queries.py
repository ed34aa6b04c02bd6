"""Round-5 batch-43 additions: binary-segmentation changepoints
(q383), ANOVA post-hoc pairwise z (q384), Shapley channel attribution
(q385), EM record-linkage (q386). Each already hash-matches its
DuckDB oracle; these tests replay the algorithms independently in
pure Python (greedy segmentation scan, textbook pooled-variance z,
literal 3-player Shapley enumeration, scratch EM)."""

from __future__ import annotations

import math
from itertools import combinations

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------- q383


def test_binary_segmentation_matches_python_replay(spark):
    pts = _rows(
        f"""SELECT o_orderdate, COUNT(*)
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY 1 ORDER BY 1"""
    )
    ys = [y for _, y in pts]
    n = len(ys)

    def sse(seg):
        m = len(seg)
        s = sum(seg)
        ss = sum(v * v for v in seg)
        return (m * ss - s * s) / m

    best1 = min(
        (sse(ys[:i]) + sse(ys[i:]), i) for i in range(1, n)
    )
    cost2, i1 = best1
    # sub-splits: left candidates split ys[:i1], right split ys[i1:]
    cands = []
    for j in range(1, i1):
        gain = sse(ys[:i1]) - (sse(ys[:j]) + sse(ys[j:i1]))
        cands.append((-gain, "L", j))
    for j in range(i1 + 1, n):
        gain = sse(ys[i1:]) - (sse(ys[i1:j]) + sse(ys[j:]))
        cands.append((-gain, "R", j))
    _, _, i2 = min(cands)
    a, b = sorted((i1, i2))
    [row] = REGISTRY["q383_binary_segmentation"].fn(spark, SF).collect()
    assert row.n_days == n
    assert str(row.cp1_day) == str(pts[i1 - 1][0].date()
                                   if hasattr(pts[i1 - 1][0], "date")
                                   else pts[i1 - 1][0])
    assert str(row.seg1_end) == str(pts[a - 1][0].date()
                                    if hasattr(pts[a - 1][0], "date")
                                    else pts[a - 1][0])
    assert math.isclose(row.mean1, sum(ys[:a]) / a, rel_tol=1e-12)
    assert math.isclose(row.mean2, sum(ys[a:b]) / (b - a), rel_tol=1e-12)
    assert math.isclose(row.mean3, sum(ys[b:]) / (n - b), rel_tol=1e-12)
    assert math.isclose(row.sse_1seg, sse(ys), rel_tol=1e-9)
    assert math.isclose(row.sse_2seg, cost2, rel_tol=1e-9)
    assert math.isclose(
        row.sse_3seg, sse(ys[:a]) + sse(ys[a:b]) + sse(ys[b:]), rel_tol=1e-9
    )
    # splitting can only ever reduce SSE
    assert row.sse_1seg >= row.sse_2seg >= row.sse_3seg
    assert 0.0 <= row.gain_ratio <= 1.0


# ---------------------------------------------------------------- q384


def _erfc_as(x: float) -> float:
    t = 1.0 / (1.0 + 0.3275911 * x)
    p = (
        ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t
    )
    return p * math.exp(-(x * x))


def test_posthoc_pairwise_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   // 1000000
        FROM read_parquet('{SF}/orders.parquet')"""
    )
    groups: dict[str, list[int]] = {}
    for g, v in raw:
        groups.setdefault(g, []).append(v)
    k = len(groups)
    n_tot = sum(len(v) for v in groups.values())
    ssw = sum(
        (len(v) * sum(x * x for x in v) - sum(v) ** 2) / len(v)
        for v in groups.values()
    )
    s2 = ssw / (n_tot - k)
    m = k * (k - 1) // 2
    got = {(r.g_a, r.g_b): r for r in
           REGISTRY["q384_posthoc_pairwise"].fn(spark, SF).collect()}
    assert len(got) == m
    for ga, gb in combinations(sorted(groups), 2):
        va, vb = groups[ga], groups[gb]
        z = (sum(va) / len(va) - sum(vb) / len(vb)) / math.sqrt(
            s2 * (1 / len(va) + 1 / len(vb))
        )
        p = _erfc_as(abs(z) / math.sqrt(2))
        r = got[(ga, gb)]
        assert (r.n_a, r.n_b) == (len(va), len(vb))
        assert math.isclose(r.z, z, rel_tol=1e-9)
        assert math.isclose(r.p_raw, p, rel_tol=1e-9, abs_tol=1e-300)
        assert math.isclose(
            r.p_bonferroni, min(1.0, m * p), rel_tol=1e-9, abs_tol=1e-300
        )
        assert r.p_bonferroni >= r.p_raw - 1e-15
        assert r.significant == (r.p_bonferroni <= 0.05)


# ---------------------------------------------------------------- q385


def test_shapley_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT user_id, event_type, COUNT(*)
        FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    )
    per: dict[int, dict[str, int]] = {}
    for uid, et, c in raw:
        per.setdefault(uid, {})[et] = c
    pats: dict[int, list[int]] = {}
    for uid, cnts in per.items():
        tot = sum(cnts.values())
        t = (
            (4 if 5 * cnts.get("click", 0) >= tot else 0)
            + (2 if 5 * cnts.get("view", 0) >= tot else 0)
            + (1 if 5 * cnts.get("signup", 0) >= tot else 0)
        )
        conv = 1 if 5 * cnts.get("purchase", 0) >= tot else 0
        nt = pats.setdefault(t, [0, 0])
        nt[0] += 1
        nt[1] += conv

    def v(s):
        nn = sum(n for t, (n, _) in pats.items() if (t & s) == t)
        kk = sum(kv for t, (_, kv) in pats.items() if (t & s) == t)
        return kk / nn if nn else 0.0

    phis = {}
    for ch, bit in (("click", 4), ("view", 2), ("signup", 1)):
        others = [b for b in (4, 2, 1) if b != bit]
        phi = (v(bit) - v(0)) / 3
        phi += (v(others[0] | bit) - v(others[0])) / 6
        phi += (v(others[1] | bit) - v(others[1])) / 6
        phi += (v(7) - v(others[0] | others[1])) / 3
        phis[ch] = phi
    got = {r.channel: r for r in
           REGISTRY["q385_shapley_attribution"].fn(spark, SF).collect()}
    assert set(got) == set(phis)
    for ch, phi in phis.items():
        r = got[ch]
        assert math.isclose(r.phi, phi, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(r.v_full, v(7), rel_tol=1e-12)
        assert math.isclose(r.v_empty, v(0), rel_tol=1e-12, abs_tol=1e-15)
        assert r.n_users == sum(n for n, _ in pats.values())
    # efficiency axiom: shares of v(full) − v(empty) sum to 1
    if abs(v(7) - v(0)) > 1e-12:
        assert math.isclose(
            sum(r.phi_share for r in got.values()), 1.0, rel_tol=1e-9
        )


# ---------------------------------------------------------------- q386


def test_em_linkage_matches_python_replay(spark):
    pats = _rows(
        f"""WITH feats AS (
            SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
               (CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                - ((CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    % 10000) + 10000) % 10000) // 10000 AS bal_bucket,
               CASE WHEN c.c_acctbal >= 0 THEN 1 ELSE 0 END AS pos,
               CAST(COUNT(o.o_orderkey) AS BIGINT) // 5 AS ord_bucket
            FROM read_parquet('{SF}/customer.parquet') c
            LEFT JOIN read_parquet('{SF}/orders.parquet') o
              ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3, 4, 5
        )
        SELECT CASE WHEN a.bal_bucket = b.bal_bucket THEN 4 ELSE 0 END
             + CASE WHEN a.pos = b.pos THEN 2 ELSE 0 END
             + CASE WHEN a.ord_bucket = b.ord_bucket THEN 1 ELSE 0 END,
               COUNT(*)
        FROM feats a JOIN feats b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_mktsegment = b.c_mktsegment
         AND a.c_custkey < b.c_custkey
        GROUP BY 1"""
    )
    counts = dict(pats)
    n_pairs = sum(counts.values())
    pi, m, u = 0.05, [0.9, 0.9, 0.9], [0.3, 0.3, 0.3]
    for _ in range(3):
        wsum = 0.0
        mm = [0.0, 0.0, 0.0]
        uu = [0.0, 0.0, 0.0]
        for g in sorted(counts):
            n_g = counts[g]
            pm = pu = 1.0
            for j, bit in ((0, 4), (1, 2), (2, 1)):
                if g & bit:
                    pm *= m[j]
                    pu *= u[j]
                else:
                    pm *= 1 - m[j]
                    pu *= 1 - u[j]
            w = pi * pm / (pi * pm + (1 - pi) * pu)
            wsum += n_g * w
            for j, bit in ((0, 4), (1, 2), (2, 1)):
                if g & bit:
                    mm[j] += n_g * w
                    uu[j] += n_g * (1 - w)
        pi = wsum / n_pairs
        m = [mm[j] / wsum for j in range(3)]
        u = [uu[j] / (n_pairs - wsum) for j in range(3)]
    [row] = REGISTRY["q386_em_linkage"].fn(spark, SF).collect()
    assert row.n_pairs == n_pairs
    assert math.isclose(row.pi, pi, rel_tol=1e-9)
    for j, (mj, uj) in enumerate(zip(m, u), 1):
        assert math.isclose(getattr(row, f"m{j}"), mj, rel_tol=1e-9)
        assert math.isclose(getattr(row, f"u{j}"), uj, rel_tol=1e-9)
        assert math.isclose(
            getattr(row, f"agreement_ratio_{j}"), mj / uj, rel_tol=1e-9
        )
    assert 0.0 < row.pi < 1.0
    # the match component should agree MORE than the unmatch component
    assert row.m1 > row.u1
