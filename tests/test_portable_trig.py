"""Primitive-level pins for the round-5 portable transcendentals:
cos/sin (`_ptrig_stage`/`_ptrig_ctes`) and erfc (`_erfc_poly` × pexp).

Two properties, separately:
1. CROSS-ENGINE BIT-EQUALITY — Spark and DuckDB produce the identical
   double for every phase ratio the engine ever evaluates (exhaustive:
   all 464 (r, p) pairs with 2 ≤ p ≤ 30, 0 ≤ r < p). This is the
   property the oracles rely on.
2. SEMANTIC ACCURACY — the Taylor/A&S polynomials track the host's
   libm within their documented bounds (trig ≲ 1e-12 absolute over
   (−π,π]; erfc ≤ 1.5e-7 absolute), so the SPEC the engines share is
   also a faithful cos/sin/erfc.
"""

from __future__ import annotations

import math
import struct

import duckdb

from stock_data_pipeline_spark.queries import (
    _erfc_poly,
    _pexp_ctes,
    _ptrig_ctes,
    _ptrig_stage,
)

PAIRS = [(r, p) for p in range(2, 31) for r in range(p)]


def _duck_trig():
    con = duckdb.connect()
    vals = ", ".join(f"({r}, {p})" for r, p in PAIRS)
    sql = f"""
    WITH base AS (SELECT CAST(r AS BIGINT) AS r, CAST(p AS BIGINT) AS p
                  FROM (VALUES {vals}) t(r, p)),
    {_ptrig_ctes("base", "r", "p", "c", "s", "tg")}
    SELECT r, p, c, s FROM tg ORDER BY p, r
    """
    return {(r, p): (c, s) for r, p, c, s in con.execute(sql).fetchall()}


def test_trig_cross_engine_bit_equality(spark):
    duck = _duck_trig()
    df = spark.createDataFrame(PAIRS, "r long, p long")
    got = {
        (row.r, row.p): (row.c, row.s)
        for row in _ptrig_stage(df, "r", "p", "c", "s", "tg")
        .select("r", "p", "c", "s")
        .collect()
    }
    assert set(got) == set(duck)
    for key in PAIRS:
        dc, ds = duck[key]
        sc, ss = got[key]
        # bit-for-bit, not isclose: compare the raw IEEE encodings
        assert struct.pack("<d", dc) == struct.pack("<d", sc), key
        assert struct.pack("<d", ds) == struct.pack("<d", ss), key


def test_trig_tracks_host_libm():
    duck = _duck_trig()
    for (r, p), (c, s) in duck.items():
        ang = 2 * math.pi * r / p
        assert abs(c - math.cos(ang)) < 1e-11, (r, p)
        assert abs(s - math.sin(ang)) < 1e-11, (r, p)
        # exact identity the polynomial pair must respect closely
        assert abs((c * c + s * s) - 1.0) < 1e-11, (r, p)


def _duck_erfc(xs):
    con = duckdb.connect()
    vals = ", ".join(f"({x!r})" for x in xs)
    sql = f"""
    WITH base AS (SELECT CAST(x AS DOUBLE) AS xv FROM (VALUES {vals}) t(x)),
    tt AS (
        SELECT *, 1e0 / (1e0 + 3.275911e-1 * xv) AS tv, -(xv * xv) AS xa
        FROM base
    ), {_pexp_ctes("tt", "xa", "ex", "qe")}
    SELECT xv, {_erfc_poly("tv")} * ex FROM qe ORDER BY xv
    """
    return con.execute(sql).fetchall()


def test_erfc_tracks_host_libm():
    xs = [i / 16 for i in range(0, 97)]  # 0 .. 6 in 1/16 steps
    for x, got in _duck_erfc(xs):
        assert abs(got - math.erfc(x)) <= 1.6e-7, x
        assert got >= 0.0
    # monotone decreasing over the grid
    vals = [v for _, v in _duck_erfc(xs)]
    assert all(vals[i] >= vals[i + 1] - 1e-15 for i in range(len(vals) - 1))
