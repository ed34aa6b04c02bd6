"""Round-5 batch-34 additions: Markov removal-effect attribution
(q348), label-propagation communities (q349), Croston intermittent
demand (q350), STL-lite decomposition (q351). Each already
hash-matches its DuckDB oracle; these tests pin SEMANTICS against
independent pure-Python replays — the attribution replay builds the
chain and runs value iteration from scratch, the LPA replay propagates
labels with literal dict counting — so an engine-symmetric bug cannot
hide behind the oracle."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from stock_data_pipeline_spark.queries import (
    REGISTRY,
    _LPA_ROUNDS,
    _MARKOV_ROUNDS,
)

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


# ---------------------------------------------------------------- q348


def test_markov_attribution_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT user_id, event_type
        FROM read_parquet('{SF}/events.parquet') ORDER BY user_id, ts, event_id"""
    )
    journeys: dict[int, list[str]] = {}
    for uid, et in raw:
        journeys.setdefault(uid, []).append(et)
    trans: dict[tuple[str, str], int] = {}
    for seq in journeys.values():
        conv = "purchase" in seq
        kept = seq[: seq.index("purchase")] if conv else seq
        nodes = ["START"] + kept + (["CONV"] if conv else ["NULL"])
        for a, b in zip(nodes, nodes[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (s, _), c in trans.items():
        row_tot[s] = row_tot.get(s, 0) + c
    p = {k: c / row_tot[k[0]] for k, c in trans.items()}
    chans = sorted({s for s, _ in trans if s != "START"})
    states = chans + ["START"]

    def p_conv(rem):
        v = {s: p.get((s, "CONV"), 0.0) for s in states if s != rem}
        for _ in range(2, _MARKOV_ROUNDS + 1):
            nv = {}
            for s in v:
                acc = p.get((s, "CONV"), 0.0)
                for d in chans:
                    if d != rem and (s, d) in p and d in v:
                        acc += p[(s, d)] * v[d]
                nv[s] = acc
            v = nv
        return v["START"]

    base = p_conv(None)
    expected = {}
    for c in chans:
        pr = p_conv(c)
        expected[c] = (pr, 1.0 - pr / base)
    re_sum = sum(expected[c][1] for c in chans)
    got = REGISTRY["q348_markov_attribution"].fn(spark, SF).collect()
    assert len(got) == len(chans)
    for row in got:
        pr, re = expected[row.channel]
        assert math.isclose(row.p_base, base, rel_tol=1e-9)
        assert math.isclose(row.p_removed, pr, rel_tol=1e-9)
        assert math.isclose(row.removal_effect, re, rel_tol=1e-9)
        assert math.isclose(row.attribution_share, re / re_sum, rel_tol=1e-9)
    # cutting any channel cannot INCREASE conversion
    assert all(r.removal_effect >= -1e-12 for r in got)
    assert math.isclose(sum(r.attribution_share for r in got), 1.0, rel_tol=1e-9)


# ---------------------------------------------------------------- q349


def test_label_propagation_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT DISTINCT l_orderkey, l_partkey
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    by_order: dict[int, list[int]] = {}
    for ok, pk in raw:
        by_order.setdefault(ok, []).append(pk)
    nbrs: dict[int, set[int]] = {}
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u != v:
                    nbrs.setdefault(u, set()).add(v)
    nodes = [k for (k,) in _rows(f"SELECT p_partkey FROM read_parquet('{SF}/part.parquet')")]
    lbl = {n: n for n in nodes}
    for _ in range(_LPA_ROUNDS):
        new = {}
        for n in nodes:
            if n not in nbrs:
                new[n] = lbl[n]
                continue
            cnt: dict[int, int] = {}
            for v in nbrs[n]:
                cnt[lbl[v]] = cnt.get(lbl[v], 0) + 1
            new[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = new
    sizes: dict[int, int] = {}
    for n in nodes:
        sizes[lbl[n]] = sizes.get(lbl[n], 0) + 1
    got = REGISTRY["q349_label_propagation"].fn(spark, SF).collect()
    assert len(got) == len(nodes)
    for row in got:
        assert row.community == lbl[row.partkey]
        assert row.comm_size == sizes[lbl[row.partkey]]
        assert row.n_communities == len(sizes)


# ---------------------------------------------------------------- q350


def test_croston_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_partkey,
               CAST(datediff('day', DATE '1995-01-01', l_shipdate) // 7
                    AS BIGINT),
               CAST(l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    weekly: dict[int, dict[int, int]] = {}
    for pk, wk, q in raw:
        weekly.setdefault(pk, {})[wk] = weekly.setdefault(pk, {}).get(wk, 0) + q
    got = REGISTRY["q350_croston"].fn(spark, SF).collect()
    assert len(got) == len(weekly)
    for row in got:
        eps = sorted(weekly[row.partkey].items())
        assert row.n_episodes == len(eps)
        assert row.total_qty == sum(q for _, q in eps)
        z = p = pw = None
        for w, q in eps:
            if z is None:
                z, p, pw = float(q), float(w) + 1.0, float(w)
            else:
                z = z + 0.2 * (q - z)
                p = p + 0.2 * ((w - pw) - p)
                pw = float(w)
        assert _close(row.size_ema, z)
        assert _close(row.interval_ema, p)
        assert _close(row.demand_rate, z / p)
        # EMA of sizes stays inside the observed size range
        qs = [q for _, q in eps]
        assert min(qs) - 1e-9 <= row.size_ema <= max(qs) + 1e-9


# ---------------------------------------------------------------- q351


def test_stl_decompose_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(ts AS DATE),
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/events.parquet')"""
    )
    daily: dict[dt.date, int] = {}
    for d, cents in raw:
        daily[d] = daily.get(d, 0) + cents
    days = sorted(daily)
    full = {}
    for i, d in enumerate(days):
        if 3 <= i < len(days) - 3:
            s7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
            full[d] = (daily[d], s7, 7 * daily[d] - s7)
    seas: dict[int, list[int]] = {}
    for d, (_, _, det7) in full.items():
        seas.setdefault(d.weekday(), [0, 0])
        seas[d.weekday()][0] += det7
        seas[d.weekday()][1] += 1
    got = REGISTRY["q351_stl_decompose"].fn(spark, SF).collect()
    assert len(got) == len(full)
    for row in got:
        d = dt.date.fromisoformat(row.day)
        cents, s7, det7 = full[d]
        assert row.weekday == d.weekday()
        assert row.total_cents == cents
        assert _close(row.trend, s7 / 7.0)
        snum, scnt = seas[d.weekday()]
        assert _close(row.seasonal, snum / (7 * scnt))
        assert _close(row.residual, cents - s7 / 7.0 - snum / (7 * scnt))
    # the decomposition must reassemble exactly: x = trend+seasonal+resid
    for row in got:
        assert math.isclose(
            row.trend + row.seasonal + row.residual, row.total_cents, rel_tol=1e-12
        )
