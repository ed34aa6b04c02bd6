"""Round-5 batch-35 additions: the portable-exp primitive and the
operators around it — EWMA control chart (q352), cumulative gains/lift
curve (q353), Wald-Wolfowitz runs test (q354), two-way ANOVA (q355).
Each already hash-matches its DuckDB oracle; these tests pin SEMANTICS
against independent pure-Python replays (math.exp, literal sequential
EWMA loops, O(cells) ANOVA decompositions), so an engine-symmetric bug
cannot hide behind the oracle. The pexp tests pin the primitive's
accuracy (~1e-13 relative vs math.exp) and cross-engine bit-identity."""

from __future__ import annotations

import math
import statistics

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from stock_data_pipeline_spark.queries import REGISTRY, _pexp_ctes, _pexp_stage

SF = "/root/testdata/sf0.001"


def _rows(sql: str):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _close(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-15)


# ------------------------------------------------------------ portable exp


def _duck_pexp(xs: list[float]) -> dict[float, float]:
    vals = ", ".join(f"({i}, CAST('{x!r}' AS DOUBLE))" for i, x in enumerate(xs))
    sql = f"""WITH src AS (SELECT * FROM (VALUES {vals}) t(i, x)),
    {_pexp_ctes("src", "x", "ex", "p")}
    SELECT i, ex FROM p ORDER BY i"""
    got = _rows(sql)
    return {xs[i]: v for i, v in got}


def test_pexp_grid_accuracy_and_cross_engine_identity(spark):
    xs = [0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 10.0, -10.0, 40.0, -40.0,
          -43.0, -100.0, -1071.0, 0.3465, -0.3465, 3.14159, -27.631,
          0.0001, -0.0001]
    duck = _duck_pexp(xs)
    df = _pexp_stage(
        spark.createDataFrame([(x,) for x in xs], "x double"), "x", "ex", "p"
    )
    got = {r.x: r.ex for r in df.collect()}
    for x in xs:
        assert got[x] == duck[x], x  # bit-identical engines
        ref = math.exp(x)
        if x < -44.0:
            assert got[x] == 0.0  # documented deep-underflow branch
        else:
            assert math.isclose(got[x], ref, rel_tol=1e-12), (x, got[x], ref)


@settings(max_examples=200, deadline=None)
@given(x=st.floats(min_value=-43.0, max_value=43.0, allow_nan=False))
def test_pexp_property_accuracy(x):
    got = _duck_pexp([x])[x]
    assert math.isclose(got, math.exp(x), rel_tol=1e-12)


# ---------------------------------------------------------------- q352


def test_ewma_control_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(o_orderdate AS DATE), CAST(COUNT(*) AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1"""
    )
    ys = [y for _, y in raw]
    n = len(ys)
    mu = sum(ys) / n
    sigma = math.sqrt((n * sum(y * y for y in ys) - sum(ys) ** 2) / (n * n))
    got = REGISTRY["q352_ewma_control"].fn(spark, SF).collect()
    assert len(got) == n
    lam = 0.2
    z = mu
    by_t = {r.t: r for r in got}
    violations = 0
    for t, y in enumerate(ys, 1):
        z = (1 - lam) * z + lam * y
        c = lam / (2 - lam) * (1 - (1 - lam) ** (2 * t))
        ucl = mu + 3 * sigma * math.sqrt(c)
        lcl = mu - 3 * sigma * math.sqrt(c)
        row = by_t[t]
        assert row.y == y
        assert math.isclose(row.ewma, z, rel_tol=1e-9)
        assert math.isclose(row.ucl, ucl, rel_tol=1e-9)
        assert math.isclose(row.lcl, lcl, rel_tol=1e-9)
        assert row.violation == (row.ewma > row.ucl or row.ewma < row.lcl)
        violations += row.violation
    # limits widen monotonically toward the asymptote
    widths = [by_t[t].ucl - by_t[t].lcl for t in range(1, n + 1)]
    assert all(a <= b + 1e-12 for a, b in zip(widths, widths[1:]))


# ---------------------------------------------------------------- q353


def test_lift_curve_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
        FROM read_parquet('{SF}/orders.parquet')"""
    )
    cells: dict[int, list[int]] = {}
    for cents, isf in raw:
        b = cents // 100000
        s = cells.setdefault(b, [0, 0])
        s[0] += 1
        s[1] += isf
    nn = sum(s[0] for s in cells.values())
    np_ = sum(s[1] for s in cells.values())
    got = REGISTRY["q353_lift_curve"].fn(spark, SF).collect()
    assert len(got) == len(cells)
    cum_n = cum_pos = 0
    by_bucket = {r.bucket: r for r in got}
    for b in sorted(cells, reverse=True):
        n, pos = cells[b]
        cum_n += n
        cum_pos += pos
        row = by_bucket[b]
        assert (row.n, row.pos, row.cum_n, row.cum_pos) == (n, pos, cum_n, cum_pos)
        assert _close(row.depth, cum_n / nn)
        assert _close(row.gain, cum_pos / np_)
        assert _close(row.lift, (cum_pos / cum_n) / (np_ / nn))
    # the last (deepest) point always closes at gain = depth = lift = 1
    deepest = by_bucket[min(cells)]
    assert _close(deepest.depth, 1.0) and _close(deepest.gain, 1.0)
    # gain is monotone non-decreasing as depth grows
    pts = sorted(got, key=lambda r: r.depth)
    assert all(a.gain <= b.gain + 1e-15 for a, b in zip(pts, pts[1:]))


# ---------------------------------------------------------------- q354


def test_runs_test_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT CAST(l_shipdate AS DATE), CAST(COUNT(*) AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1 ORDER BY 1"""
    )
    ys = [y for _, y in raw]
    m = statistics.median(ys)
    seq = [1 if y > m else 0 for y in ys if y != m]
    n1 = sum(seq)
    n2 = len(seq) - n1
    runs = 1 + sum(a != b for a, b in zip(seq, seq[1:])) if seq else 0
    (row,) = REGISTRY["q354_runs_test"].fn(spark, SF).collect()
    assert (row.n_above, row.n_below, row.runs) == (n1, n2, runs)
    if n1 and n2:
        ns = n1 + n2
        er = 1 + 2 * n1 * n2 / ns
        vr = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / (ns * ns * (ns - 1))
        assert _close(row.expected_runs, er)
        assert _close(row.var_runs, vr)
        assert _close(row.z, (runs - er) / math.sqrt(vr))


# ---------------------------------------------------------------- q355


def test_two_way_anova_matches_python_replay(spark):
    raw = _rows(
        f"""SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT)
        FROM read_parquet('{SF}/lineitem.parquet')"""
    )
    cells: dict[tuple[str, str], list[int]] = {}
    syy = 0
    for a, b, q in raw:
        s = cells.setdefault((a, b), [0, 0])
        s[0] += 1
        s[1] += q
        syy += q * q
    nn = sum(s[0] for s in cells.values())
    ss = sum(s[1] for s in cells.values())
    cm = ss * ss / nn
    fa: dict[str, list[int]] = {}
    fb: dict[str, list[int]] = {}
    for (a, b), (n, s) in cells.items():
        fa.setdefault(a, [0, 0])[0] += n
        fa[a][1] += s
        fb.setdefault(b, [0, 0])[0] += n
        fb[b][1] += s
    qa = sum(fa[a][1] ** 2 / fa[a][0] for a in sorted(fa))
    qb = sum(fb[b][1] ** 2 / fb[b][0] for b in sorted(fb))
    qc = sum(cells[c][1] ** 2 / cells[c][0] for c in sorted(cells))
    ssa, ssb = qa - cm, qb - cm
    ssab = qc - qa - qb + cm
    sse = syy - qc
    ka, kb, ncl = len(fa), len(fb), len(cells)
    mse = sse / (nn - ncl)
    got = REGISTRY["q355_two_way_anova"].fn(spark, SF).collect()
    assert len(got) == ncl
    for row in got:
        n, s = cells[(row.returnflag, row.linestatus)]
        assert row.n == n
        assert _close(row.cell_mean, s / n)
        assert math.isclose(row.ss_factor_a, ssa, rel_tol=1e-9)
        assert math.isclose(row.ss_factor_b, ssb, rel_tol=1e-9)
        assert math.isclose(row.ss_interaction, ssab, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(row.ss_error, sse, rel_tol=1e-9)
        assert math.isclose(row.f_a, (ssa / (ka - 1)) / mse, rel_tol=1e-9)
        assert math.isclose(row.f_b, (ssb / (kb - 1)) / mse, rel_tol=1e-9)
        assert math.isclose(
            row.f_interaction,
            (ssab / ((ka - 1) * (kb - 1))) / mse,
            rel_tol=1e-6,
            abs_tol=1e-6,
        )
    # sanity: the decomposition reassembles SST
    sst = syy - cm
    assert math.isclose(ssa + ssb + ssab + sse, sst, rel_tol=1e-9)
