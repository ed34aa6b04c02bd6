"""Round-5 additions: reference-LM quality scoring (q306), distributed
power-iteration PCA (q307), Mann–Whitney U (q308). Each query already
hash-matches its DuckDB oracle registry-wide; these tests pin the
SEMANTICS against independent pure-Python replays of the math from the
raw parquet, so an engine-symmetric bug (both sides wrong the same
way) cannot hide behind the oracle."""

from __future__ import annotations

import math

import duckdb
import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()


def test_lm_quality_matches_python_replay(spark, docs):
    """Replay the add-one bigram LM and whole-bit surprise in plain
    Python dicts for every document; totals must match row-for-row."""
    ref_bi: dict[tuple[str, str], int] = {}
    ref_uni: dict[str, int] = {}
    ref_vocab: set[str] = set()
    toks = {d: t.split() for d, _, t in docs}
    for doc_id, source, _ in docs:
        tk = toks[doc_id]
        if source == "src0":
            ref_vocab.update(tk)
            for a, b in zip(tk, tk[1:]):
                ref_bi[(a, b)] = ref_bi.get((a, b), 0) + 1
                ref_uni[a] = ref_uni.get(a, 0) + 1
    v = len(ref_vocab)
    expected = {}
    for doc_id, source, _ in docs:
        tk = toks[doc_id]
        if len(tk) < 2:
            continue
        bits = [
            ((ref_uni.get(a, 0) + v) // (ref_bi.get((a, b), 0) + 1)).bit_length() - 1
            for a, b in zip(tk, tk[1:])
        ]
        expected[doc_id] = (len(bits), sum(bits))
    got = {
        r.doc_id: (r.n_bigrams, r.total_bits)
        for r in REGISTRY["q306_lm_quality"].fn(spark, SF).collect()
    }
    assert got == expected
    # reference slice must be cheaper to encode under its own LM
    rows = REGISTRY["q306_lm_quality"].fn(spark, SF).collect()
    ref_rows = [r for r in rows if r.source == "src0"]
    other = [r for r in rows if r.source != "src0"]
    mean = lambda xs: sum(x.total_bits for x in xs) / sum(x.n_bigrams for x in xs)  # noqa: E731
    assert mean(ref_rows) < mean(other)


def test_power_iteration_pca_matches_python_replay(spark):
    """Replay covariance + 3 L∞-normalized power rounds in pure Python
    (ascending-index folds, the engines' exact IEEE sequence) — every
    component must match BITWISE, and the normalization convention
    (component 1.0 at the signed max-|w| dim) must hold."""
    con = duckdb.connect()
    embs = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    q = [[math.floor(float(x) * 1024) for x in e] for _, e in embs]
    n = len(q)
    d = 64
    s = [sum(row[i] for row in q) for i in range(d)]
    c = [
        [
            float(n * sum(row[i] * row[j] for row in q) - s[i] * s[j])
            for j in range(d)
        ]
        for i in range(d)
    ]
    v = [1.0] * d
    for _ in range(3):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):  # ascending fold, exactly like both engines
                acc = acc + c[i][j] * v[j]
            w.append(acc)
        m = max(range(d), key=lambda i: (abs(w[i]), -i))
        mval = w[m]
        v = [x / mval for x in w]
    rows = {
        r.dim: r for r in REGISTRY["q307_power_iteration_pca"].fn(spark, SF).collect()
    }
    assert len(rows) == d
    for i in range(d):
        assert rows[i + 1].component == v[i], f"dim {i + 1} diverged"
        assert rows[i + 1].lambda_linf == mval
    assert max(abs(r.component) for r in rows.values()) == 1.0


def test_poisson_bootstrap_matches_python_replay(spark):
    """Replay the mixer, the inverse-CDF weights, and every replica's
    weighted sums in pure Python from the raw parquet."""
    import math

    M31 = 2147483647
    CUM = [0.0] * 8
    e, f, c = math.exp(-1.0), 1, 0.0
    for k in range(8):
        if k:
            f *= k
        c += e / f
        CUM[k] = float(f"{c:.17e}")

    def mix31(u: int) -> int:
        a = (u * 48271 + 11) % M31
        b = ((a ^ (a >> 16)) * 69621) % M31
        return b ^ (b >> 16)

    def w_of(u: float) -> int:
        for k, t in enumerate(CUM):
            if u < t:
                return k
        return 8

    con = duckdb.connect()
    orders = con.execute(
        f"""SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchall()
    exp = {}
    for b in range(32):
        sw = swc = 0
        for k, cents in orders:
            w = w_of(mix31(k * 64 + b) / 2147483648.0)
            sw += w
            swc += w * cents
        exp[b] = (sw, swc, float(swc) / float(sw))
    rows = REGISTRY["q309_poisson_bootstrap"].fn(spark, SF).collect()
    assert len(rows) == 32
    for r in rows:
        assert (r.sum_w, r.wsum_cents, r.mean_cents) == exp[r.replica]
    # statistical sanity: E[w]=1, so Σw across replicas ≈ 32·n (±5%)
    n = len(orders)
    total_w = sum(r.sum_w for r in rows)
    assert abs(total_w - 32 * n) / (32 * n) < 0.05


def test_bradley_terry_matches_python_replay(spark):
    """Replay comparison derivation, Laplace-smoothed pair counts, and
    3 MM rounds (ascending-partner folds) in pure Python; counts and
    scores must match bitwise."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_orderkey, l_linenumber, l_suppkey,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/lineitem.parquet')
            ORDER BY l_orderkey, l_linenumber"""
    ).fetchall()
    # mirror the JOIN semantics exactly: the fixture has duplicate
    # (orderkey, linenumber) rows, so each a-line pairs with EVERY
    # b-line at linenumber+1 in its order
    by_slot: dict[tuple[int, int], list] = {}
    for o, ln, s, c in rows:
        by_slot.setdefault((o, ln), []).append((s, c))
    pairs: dict[tuple[int, int], list[int]] = {}
    for (o, ln), a_lines in by_slot.items():
        for s1, c1 in a_lines:
            for s2, c2 in by_slot.get((o, ln + 1), []):
                if s1 == s2:
                    continue
                u, v = min(s1, s2), max(s1, s2)
                w = pairs.setdefault((u, v), [1, 1])  # Laplace +1 each way
                if c1 != c2:
                    winner = s1 if c1 < c2 else s2
                    w[0 if winner == u else 1] += 1
    edges: dict[int, list[tuple[int, int, int]]] = {}
    wa: dict[int, int] = {}
    ncmp: dict[int, int] = {}
    for (u, v), (wuv, wvu) in pairs.items():
        n = wuv + wvu
        edges.setdefault(u, []).append((v, n, wuv))
        edges.setdefault(v, []).append((u, n, wvu))
        wa[u] = wa.get(u, 0) + wuv
        wa[v] = wa.get(v, 0) + wvu
        ncmp[u] = ncmp.get(u, 0) + n
        ncmp[v] = ncmp.get(v, 0) + n
    s = {a: 1.0 for a in edges}
    for _ in range(3):
        new = {}
        for a in edges:
            den = 0.0
            for b, n, _w in sorted(edges[a]):  # ascending-partner fold
                den = den + float(n) / (s[a] + s[b])
            new[a] = float(wa[a]) / den
        s = new
    got = {r.suppkey: r for r in REGISTRY["q310_bradley_terry"].fn(spark, SF).collect()}
    assert set(got) == set(edges)
    for a in edges:
        assert got[a].n_comparisons == ncmp[a]
        assert got[a].n_wins_smoothed == wa[a]
        assert got[a].bt_score == s[a], f"supplier {a} score diverged"


def test_ips_offpolicy_matches_python_replay(spark):
    """Replay the propensity table and the per-segment exact collapse;
    the SNIPS identity must also hold: with the target action's rows as
    the only matched mass, Σ ips_contrib / Σ weight_mass equals the
    plain mean reward of the matched rows reweighted per segment."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT c.c_mktsegment, o.o_orderpriority,
                   CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/customer.parquet') c
              ON o.o_custkey = c.c_custkey"""
    ).fetchall()
    n = len(rows)
    n_seg: dict[str, int] = {}
    n_sa: dict[str, int] = {}
    cents: dict[str, int] = {}
    for seg, act, r in rows:
        n_seg[seg] = n_seg.get(seg, 0) + 1
        if act == "1-URGENT":
            n_sa[seg] = n_sa.get(seg, 0) + 1
            cents[seg] = cents.get(seg, 0) + r
    got = {r.segment: r for r in REGISTRY["q311_ips_offpolicy"].fn(spark, SF).collect()}
    assert set(got) == set(n_seg)
    for seg in n_seg:
        g = got[seg]
        assert g.n_seg == n_seg[seg]
        assert g.n_matched == n_sa.get(seg, 0)
        assert g.matched_cents == cents.get(seg, 0)
        assert g.propensity == float(n_sa.get(seg, 0)) / float(n_seg[seg])
        if n_sa.get(seg, 0):
            assert g.ips_contrib_cents == (
                float(cents[seg] * n_seg[seg]) / float(n_sa[seg]) / float(n)
            )
            assert g.weight_mass == (
                float(n_sa[seg] * n_seg[seg]) / float(n_sa[seg]) / float(n)
            )
        else:
            assert g.ips_contrib_cents == 0.0 and g.weight_mass == 0.0
    # SNIPS sanity: the self-normalized estimate is a weighted mean of
    # matched rewards, so it must sit inside [min, max] matched reward
    matched = [r for _, act, r in rows if act == "1-URGENT"]
    snips = sum(g.ips_contrib_cents for g in got.values()) / sum(
        g.weight_mass for g in got.values()
    )
    assert min(matched) <= snips <= max(matched)


def test_mann_whitney_matches_python_replay(spark):
    """Replay midranks + tie correction from the raw cents values."""
    con = duckdb.connect()
    vals = con.execute(
        f"""SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF}/lineitem.parquet')"""
    ).fetchall()
    groups: dict[int, list[int]] = {}
    for cents, is_r in vals:
        groups.setdefault(cents, []).append(is_r)
    na = sum(is_r for _, is_r in vals)
    nb = len(vals) - na
    cb = 0
    r_a2 = 0
    tie3 = 0
    for cents in sorted(groups):
        g = groups[cents]
        t = len(g)
        r_a2 += sum(g) * (2 * cb + t + 1)
        tie3 += t * t * t - t
        cb += t
    u_a2 = r_a2 - na * (na + 1)
    row = REGISTRY["q308_mann_whitney"].fn(spark, SF).collect()[0]
    assert (row.na, row.nb, row.u_a2, row.u_b2) == (na, nb, u_a2, 2 * na * nb - u_a2)
    # z recomputed with the identical operand sequence
    z = (
        float(u_a2 - na * nb) / 2.0
        / math.sqrt(
            float(na) * float(nb) / 12.0
            * (float(na + nb + 1) - float(tie3) / (float(na + nb) * float(na + nb - 1)))
        )
    )
    assert row.z_stat == z
    # U_A + U_B == n_A · n_B is the defining identity
    assert row.u_a2 + row.u_b2 == 2 * na * nb
