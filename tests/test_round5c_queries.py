"""Round-5 batch-31 additions: the portable-ln primitive and the five
operators built on / alongside it — one-way ANOVA (q333), mutual
information (q334), PSI drift (q335), t-closeness (q336), average
precision (q337). Each already hash-matches its DuckDB oracle; these
tests pin SEMANTICS against independent pure-Python replays from the
raw parquet (math.log instead of the atanh series, scratch ranking
instead of window functions), so an engine-symmetric bug cannot hide
behind the oracle. The pln tests additionally pin the primitive's
accuracy contract (~1e-10 absolute vs true ln) and its cross-engine
bit-identity on adversarial ratios."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stock_data_pipeline_spark.queries import REGISTRY, _pln_ctes, _pln_stage

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


def _ln_close(a: float, b: float) -> bool:
    # portable-ln semantic accuracy: series tail + one rounded division
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-10)


# ------------------------------------------------------------- portable ln


def _duck_pln(pairs: list[tuple[int, int]]) -> list[float]:
    vals = ", ".join(f"({n}::BIGINT, {d}::BIGINT)" for n, d in pairs)
    sql = f"""WITH src AS (SELECT * FROM (VALUES {vals}) t(num, den)),
    {_pln_ctes("src", "num", "den", "lnv", "p")}
    SELECT num, den, lnv FROM p ORDER BY num, den"""
    return _rows(sql)


def test_pln_grid_accuracy_and_cross_engine_identity(spark):
    pairs = sorted(
        {
            (1, 1), (2, 1), (1, 2), (3, 1), (1, 3), (999, 1000), (1000, 999),
            (7, 5), (600000, 1), (1, 600000), (123456789, 987654321),
            (2**50 - 1, 3), (5, 2**50 - 1), (2**52, 2**52 - 1), (17, 360000000000),
            (360000000000, 123), (6, 4), (1048575, 1048576), (99, 98),
        }
    )
    duck = {(n, d): v for n, d, v in _duck_pln(pairs)}
    df = _pln_stage(
        spark.createDataFrame(pairs, "num long, den long"), "num", "den", "v", "p"
    )
    got = {(r.num, r.den): r.v for r in df.select("num", "den", "v").collect()}
    for n, d in pairs:
        ref = math.log(n) - math.log(d)
        assert got[(n, d)] == duck[(n, d)], (n, d)  # bit-identical engines
        assert _ln_close(got[(n, d)], ref), (n, d, got[(n, d)], ref)


@settings(max_examples=300, deadline=None)
@given(
    num=st.integers(min_value=1, max_value=2**52),
    den=st.integers(min_value=1, max_value=2**52),
)
def test_pln_property_accuracy(num, den):
    (_, _, got), = _duck_pln([(num, den)])
    assert _ln_close(got, math.log(num) - math.log(den))


# ---------------------------------------------------------------- q333


def test_anova_f_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_returnflag, CAST(l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    cells: dict[str, list[int]] = {}
    for g, q in raw:
        s = cells.setdefault(g, [0, 0, 0])
        s[0] += 1
        s[1] += q
        s[2] += q * q
    n = sum(s[0] for s in cells.values())
    tsx = sum(s[1] for s in cells.values())
    tsxx = sum(s[2] for s in cells.values())
    k = len(cells)
    abetween = 0.0
    for g in sorted(cells):
        s = cells[g]
        abetween += float(s[1]) * float(s[1]) / float(s[0])
    ssb = abetween - float(tsx) * float(tsx) / float(n)
    ssw = float(tsxx) - abetween
    sst = float(tsxx) - float(tsx) * float(tsx) / float(n)
    f_stat = (ssb / float(k - 1)) / (ssw / float(n - k))
    got = REGISTRY["q333_anova_f"].fn(spark, SF).collect()
    assert len(got) == k
    for row in got:
        s = cells[row.returnflag]
        assert (row.n_g, row.sum_qty, row.n_total, row.k_groups) == (
            s[0], s[1], n, k,
        )
        assert _close(row.mean_qty, s[1] / s[0])
        assert _close(row.ss_between, ssb)
        assert _close(row.ss_within, ssw)
        assert _close(row.f_stat, f_stat)
        assert _close(row.eta_squared, ssb / sst)
    # sanity: decomposition SSB + SSW == SST
    assert math.isclose(ssb + ssw, sst, rel_tol=1e-9)


# ---------------------------------------------------------------- q334


def test_mutual_information_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT c.c_mktsegment, o.o_orderpriority
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
          ON o.o_custkey = c.c_custkey"""
    )
    cells: dict[tuple[str, str], int] = {}
    mx: dict[str, int] = {}
    my: dict[str, int] = {}
    for x, y in raw:
        cells[(x, y)] = cells.get((x, y), 0) + 1
        mx[x] = mx.get(x, 0) + 1
        my[y] = my.get(y, 0) + 1
    nn = len(raw)
    mi = sum(
        cells[c] / nn * (math.log(cells[c] / mx[c[0]]) - math.log(my[c[1]] / nn))
        for c in sorted(cells)
    )
    hx = -sum(mx[x] / nn * math.log(mx[x] / nn) for x in sorted(mx))
    hy = -sum(my[y] / nn * math.log(my[y] / nn) for y in sorted(my))
    got = REGISTRY["q334_mutual_information"].fn(spark, SF).collect()
    assert len(got) == len(cells)
    for row in got:
        c = (row.segment, row.priority)
        assert row.n_xy == cells[c]
        pmi_ref = math.log(cells[c] / mx[c[0]]) - math.log(my[c[1]] / nn)
        assert _ln_close(row.pmi_nats, pmi_ref)
        assert _ln_close(row.mi_nats, mi)
        assert _ln_close(row.h_segment, hx)
        assert _ln_close(row.h_priority, hy)
        assert _ln_close(row.nmi, mi / math.sqrt(hx * hy))
    # MI must be non-negative and bounded by min entropy
    one = got[0]
    assert -1e-9 <= one.mi_nats <= min(one.h_segment, one.h_priority) + 1e-9
    assert 0.0 <= one.nmi <= 1.0 + 1e-9


# ---------------------------------------------------------------- q335


def test_psi_drift_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet')"""
    )
    nr = [0] * 10
    nc = [0] * 10
    for cents, is_ref in raw:
        b = min(cents // 5000000, 9)
        if is_ref:
            nr[b] += 1
        else:
            nc[b] += 1
    np_ = [v + 1 for v in nr]
    mp_ = [v + 1 for v in nc]
    nt, mt = sum(np_), sum(mp_)
    terms = [
        (np_[b] / nt - mp_[b] / mt) * (math.log(np_[b] / nt) - math.log(mp_[b] / mt))
        for b in range(10)
    ]
    psi = sum(terms)
    got = REGISTRY["q335_psi_drift"].fn(spark, SF).collect()
    assert len(got) == 10
    for row in got:
        b = row.bucket
        assert (row.n_ref, row.n_cur) == (nr[b], nc[b])
        assert _close(row.ref_share, np_[b] / nt)
        assert _close(row.cur_share, mp_[b] / mt)
        assert _ln_close(row.psi_term, terms[b])
        assert _ln_close(row.psi_total, psi)
    assert psi >= 0.0  # PSI is a symmetrized KL — non-negative


# ---------------------------------------------------------------- q336


def test_t_closeness_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(c_nationkey AS BIGINT), c_mktsegment,
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        FROM read_parquet('{SF}/customer.parquet')"""
    )
    gh: dict[tuple[int, str], list[int]] = {}
    allh = [0] * 10
    for nk, seg, cents in raw:
        b = (cents + 100000) // 110000
        gh.setdefault((nk, seg), [0] * 10)[b] += 1
        allh[b] += 1
    n = sum(allh)
    cum_all = [sum(allh[: j + 1]) for j in range(10)]
    expected = {}
    for key, hist in gh.items():
        n_g = sum(hist)
        cum_g = 0
        emd_num = 0
        for j in range(9):
            cum_g += hist[j]
            emd_num += abs(cum_g * n - cum_all[j] * n_g)
        expected[key] = (n_g, emd_num)
    got = REGISTRY["q336_t_closeness"].fn(spark, SF).collect()
    assert len(got) == len(gh)
    for row in got:
        n_g, emd_num = expected[(row.nationkey, row.segment)]
        assert (row.n_g, row.emd_num) == (n_g, emd_num)
        t = emd_num / (n_g * n * 9)
        assert _close(row.t_emd, t)
        assert row.t_close == (row.t_emd <= 0.2)
        assert 0.0 <= row.t_emd <= 1.0  # EMD of two distributions over [0,1]


# ---------------------------------------------------------------- q337


def test_average_precision_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT c_mktsegment, c_custkey, c_acctbal,
               CASE WHEN c_nationkey < 5 THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/customer.parquet')"""
    )
    by_seg: dict[str, list] = {}
    for seg, ck, bal, rel in raw:
        by_seg.setdefault(seg, []).append((-bal, ck, rel))
    expected = {}
    for seg, lst in by_seg.items():
        lst.sort()
        ap_sum = 0.0
        k = 0
        for r, (_, _, rel) in enumerate(lst, 1):
            if rel:
                k += 1
                ap_sum += float(k) / float(r)
        expected[seg] = (len(lst), k, ap_sum / k if k else 0.0)
    mean_ap = sum(expected[s][2] for s in sorted(expected)) / len(expected)
    got = REGISTRY["q337_average_precision"].fn(spark, SF).collect()
    assert len(got) == len(expected)
    for row in got:
        n_total, n_pos, ap = expected[row.segment]
        assert (row.n_total, row.n_pos) == (n_total, n_pos)
        assert _close(row.avg_precision, ap)
        assert _close(row.mean_ap, mean_ap)
        assert 0.0 <= row.avg_precision <= 1.0
