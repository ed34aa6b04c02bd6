"""Round-5 batch-42 additions: Cox proportional hazards (q379),
landmark harmonic closeness (q380), macro-F1 classifier eval (q381),
labeled retrieval eval (q382). Each already hash-matches its DuckDB
oracle; these tests pin SEMANTICS against independent pure-Python
replays (host math.exp, dict-BFS, scratch confusion matrices and a
literal cosine ranking)."""

from __future__ import annotations

import math

import duckdb

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------- q379


def test_cox_ph_matches_python_replay(spark):
    per = _rows(
        f"""SELECT CAST(date_diff('day', MIN(o.o_orderdate),
                                  MAX(o.o_orderdate)) AS BIGINT),
               CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END,
               CASE WHEN MAX(o.o_orderdate) <= DATE '2001-01-01'
                    THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey, c.c_mktsegment"""
    )
    times = sorted({dur for dur, _, ev in per if ev})
    rf = []
    for t in times:
        d = sum(1 for dur, _, ev in per if ev and dur == t)
        d1 = sum(1 for dur, x, ev in per if ev and dur == t and x)
        r0 = sum(1 for dur, x, _ in per if dur >= t and not x)
        r1 = sum(1 for dur, x, _ in per if dur >= t and x)
        rf.append((t, d, d1, r0, r1))

    def score_info(beta):
        eb = math.exp(beta)
        u = i = 0.0
        for _, d, d1, r0, r1 in rf:
            s0 = r0 + eb * r1
            u += d1 - d * (eb * r1) / s0
            i += d * (eb * r1 * r0) / (s0 * s0)
        return u, i

    beta = 0.0
    for _ in range(3):
        u, i = score_info(beta)
        beta += u / i
    u_fin, i_fin = score_info(beta)
    [row] = REGISTRY["q379_cox_ph"].fn(spark, SF).collect()
    assert row.n_customers == len(per)
    assert row.n_events == sum(ev for *_, ev in per)
    assert row.n_event_times == len(rf)
    assert math.isclose(row.beta, beta, rel_tol=1e-7, abs_tol=1e-9)
    assert math.isclose(
        row.hazard_ratio, math.exp(beta), rel_tol=1e-7
    )
    assert math.isclose(row.score_final, u_fin, rel_tol=1e-4, abs_tol=1e-7)
    assert math.isclose(row.info_final, i_fin, rel_tol=1e-6)
    # three Newton rounds from 0 have essentially converged
    assert abs(row.score_final) < 1e-4 * row.info_final + 1e-6
    # at beta=0 the score is the log-rank O-E numerator (q357 family)
    u0, _ = score_info(0.0)
    d1_tot = sum(d1 for _, _, d1, _, _ in rf)
    e1_tot = sum(d * r1 / (r0 + r1) for _, d, _, r0, r1 in rf)
    assert math.isclose(u0, d1_tot - e1_tot, rel_tol=1e-9)


# ---------------------------------------------------------------- q380


def test_landmark_closeness_matches_python_replay(spark):
    edges = _rows(
        f"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey <> b.l_partkey"""
    )
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    n_parts = _rows(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/part.parquet')"
    )[0][0]
    got = {r.landmark: r for r in
           REGISTRY["q380_landmark_closeness"].fn(spark, SF).collect()}
    assert set(got) == set(range(1, 9))
    for lm in range(1, 9):
        dist = {lm: 0}
        frontier = [lm]
        for hop in (1, 2, 3):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        c = [0, 0, 0, 0]
        for d in dist.values():
            c[d] += 1
        r = got[lm]
        assert (r.n1, r.n2, r.n3) == (c[1], c[2], c[3])
        assert r.n_reached == 1 + c[1] + c[2] + c[3]
        assert math.isclose(
            r.harmonic_centrality, c[1] + c[2] / 2 + c[3] / 3, rel_tol=1e-12
        )
        assert math.isclose(
            r.coverage, r.n_reached / n_parts, rel_tol=1e-12
        )


# ---------------------------------------------------------------- q381


def test_macro_f1_matches_python_replay(spark):
    from stock_data_pipeline_spark.llm.text import LANG_MARKERS

    docs = _rows(
        f"SELECT lang, text FROM read_parquet('{SF}/documents.parquet')"
    )
    pairs = []
    for truth, text_ in docs:
        toks = [t.lower() for t in text_.split() if t]
        hits = {
            lang: sum(1 for t in toks if t in set(markers))
            for lang, markers in LANG_MARKERS.items()
        }
        best = max(hits.values())
        if best == 0:
            pred = "und"
        else:  # first lang in marker order hitting the max (q30 tie rule)
            pred = next(l for l in LANG_MARKERS if hits[l] == best)
        pairs.append((truth, pred))
    classes = sorted({t for t, _ in pairs})
    stats = {}
    for cl in classes:
        tp = sum(1 for t, p in pairs if t == cl and p == cl)
        n_true = sum(1 for t, _ in pairs if t == cl)
        n_pred = sum(1 for _, p in pairs if p == cl)
        fp = n_pred - tp
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / n_true if n_true else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        stats[cl] = (n_true, n_pred, tp, fp, prec, rec, f1)
    macro = sum(s[6] for s in stats.values()) / len(classes)
    micro = sum(s[2] for s in stats.values()) / len(pairs)
    got = {r["class"]: r for r in
           REGISTRY["q381_macro_f1"].fn(spark, SF).collect()}
    assert set(got) == set(classes)
    for cl, (n_true, n_pred, tp, fp, prec, rec, f1) in stats.items():
        r = got[cl]
        assert (r.n_true, r.n_pred, r.tp, r.fp) == (n_true, n_pred, tp, fp)
        assert math.isclose(r.precision, prec, rel_tol=1e-12, abs_tol=1e-15)
        assert math.isclose(r.recall, rec, rel_tol=1e-12, abs_tol=1e-15)
        assert math.isclose(r.f1, f1, rel_tol=1e-12, abs_tol=1e-15)
        assert r.n_classes == len(classes)
        assert math.isclose(r.macro_f1, macro, rel_tol=1e-9)
        assert math.isclose(r.micro_accuracy, micro, rel_tol=1e-12)


# ---------------------------------------------------------------- q382


def test_retrieval_eval_matches_python_replay(spark):
    vecs = _rows(
        f"""SELECT vec_id, embedding, label
        FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"""
    )
    by_id = {vid: (emb, lab) for vid, emb, lab in vecs}

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return dot / (na * nb)

    queries = [vid for vid in by_id if vid % 20 == 0]
    nq = len(queries)
    rrs, hit1 = 0.0, 0
    hit10, rel10 = 0, 0
    for q in queries:
        qemb, qlab = by_id[q]
        ranked = sorted(
            ((cos(qemb, emb), vid) for vid, (emb, _) in by_id.items()
             if vid != q),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        first = None
        nrel = 0
        for rank, (_, vid) in enumerate(ranked, 1):
            if by_id[vid][1] == qlab:
                nrel += 1
                if first is None:
                    first = rank
        if first is not None:
            rrs += 1.0 / first
            hit10 += 1
            if first == 1:
                hit1 += 1
        rel10 += nrel
    [row] = REGISTRY["q382_retrieval_eval"].fn(spark, SF).collect()
    assert row.n_queries == nq
    assert math.isclose(row.mrr_at_10, rrs / nq, rel_tol=1e-9)
    assert math.isclose(row.hit_rate_at_1, hit1 / nq, rel_tol=1e-12)
    assert math.isclose(row.hit_rate_at_10, hit10 / nq, rel_tol=1e-12)
    assert math.isclose(row.precision_at_10, rel10 / (10 * nq), rel_tol=1e-12)
    assert 0.0 <= row.mrr_at_10 <= 1.0
    assert row.hit_rate_at_1 <= row.hit_rate_at_10
