"""Unit tests for operators.indicators: EMA recurrence vs a Python
loop, drawdown invariants, Bollinger hand-check + min-periods NULLs,
RSI bounds and edge cases, VWAP hand-check."""

from __future__ import annotations

import math

from stock_data_pipeline_spark.operators import indicators


def _series(spark, prices, key="A"):
    rows = [(key, i, float(p)) for i, p in enumerate(prices)]
    return spark.createDataFrame(rows, ["k", "t", "p"])


def test_ema_matches_python_loop(spark):
    prices = [100.0, 104.0, 98.5, 101.25, 99.0, 107.0]
    out = (
        indicators.ema(_series(spark, prices), ["k"], ["t"], "p", alpha=0.25)
        .orderBy("t")
        .collect()
    )
    ref = prices[0]
    refs = [ref]
    for p in prices[1:]:
        ref = 0.25 * p + 0.75 * ref
        refs.append(ref)
    assert [r["ema"] for r in out] == refs  # bit-exact, same fold order


def test_ema_partitions_independent(spark):
    df = _series(spark, [10.0, 20.0]).union(_series(spark, [100.0, 100.0], key="B"))
    out = {(r["k"], r["t"]): r["ema"] for r in indicators.ema(df, ["k"], ["t"], "p").collect()}
    assert out[("A", 0)] == 10.0 and out[("A", 1)] == 0.25 * 20.0 + 0.75 * 10.0
    assert out[("B", 1)] == 100.0


def test_ema_fold_and_linear_bit_equal(spark):
    """The two physical strategies behind the ema dispatcher must be
    bit-identical (same IEEE op sequence) — multi-key, awkward values
    that don't round-trip through any decimal representation."""
    import random

    rng = random.Random(7)
    rows = [
        (k, t, rng.uniform(1.0, 500.0))
        for k in ("A", "B", "C")
        for t in range(400)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "p"])
    fold = {
        (r["k"], r["t"]): r["ema"]
        for r in indicators.ema_fold(df, ["k"], ["t"], "p", alpha=0.25).collect()
    }
    lin = {
        (r["k"], r["t"]): r["ema"]
        for r in indicators.ema_linear(df, ["k"], ["t"], "p", alpha=0.25).collect()
    }
    assert fold == lin  # exact ==, no tolerance


def test_ema_linear_100k_single_key(spark):
    """The production path must stay linear on the shape that kills the
    fold: one key, 10⁵ rows (the fold would re-scan ~5·10⁹ array
    elements here). Ground truth is the same Python recurrence."""
    import time

    n = 100_000
    prices = [float((i * 2654435761) % 100_000) / 100.0 + 1.0 for i in range(n)]
    df = spark.createDataFrame(
        [("A", i, p) for i, p in enumerate(prices)], ["k", "t", "p"]
    ).repartition(8)
    t0 = time.monotonic()
    out = (
        indicators.ema_linear(df, ["k"], ["t"], "p", alpha=0.25)
        .orderBy("t")
        .collect()
    )
    elapsed = time.monotonic() - t0
    acc = prices[0]
    refs = [acc]
    for p in prices[1:]:
        acc = 0.25 * p + 0.75 * acc
        refs.append(acc)
    assert [r["ema"] for r in out] == refs  # bit-exact at 1e5 rows
    assert elapsed < 60, f"linear path took {elapsed:.1f}s on 1e5 rows"


def test_ema_dispatcher_guard(spark):
    """expected_rows_per_key ≤ FOLD_MAX_ROWS_PER_KEY picks the all-JVM
    fold (no Arrow/Python in the plan); the default picks the
    batched-Arrow scan (MapInPandas in the plan)."""
    df = _series(spark, [1.0, 2.0, 3.0])
    folded = indicators.ema(df, ["k"], ["t"], "p", expected_rows_per_key=250)
    linear = indicators.ema(df, ["k"], ["t"], "p")
    assert "MapInPandas" not in folded._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" in linear._jdf.queryExecution().analyzed().toString()


def test_drawdown_invariants(spark):
    out = (
        indicators.drawdown(_series(spark, [100.0, 120.0, 90.0, 95.0, 130.0]), ["k"], ["t"], "p")
        .orderBy("t")
        .collect()
    )
    peaks = [r["peak"] for r in out]
    assert peaks == [100.0, 120.0, 120.0, 120.0, 130.0]  # monotone running max
    dds = [r["drawdown_pct"] for r in out]
    assert all(d <= 0 for d in dds)
    assert dds[2] == (90.0 - 120.0) / 120.0


def test_bollinger_hand_check_and_min_periods(spark):
    out = (
        indicators.bollinger(_series(spark, [10.0, 14.0, 12.0]), ["k"], ["t"], "p", n=3)
        .orderBy("t")
        .collect()
    )
    # row 0: single-row frame → bands NULL, mid = price
    assert out[0]["bb_mid"] == 10.0 and out[0]["bb_upper"] is None
    # row 2: mean 12, sample stddev of {10,14,12} = 2
    assert out[2]["bb_mid"] == 12.0
    assert math.isclose(out[2]["bb_upper"], 16.0, rel_tol=1e-12)
    assert math.isclose(out[2]["bb_lower"], 8.0, rel_tol=1e-12)


def test_rsi_bounds_and_edges(spark):
    up = indicators.rsi(_series(spark, [1.0, 2.0, 3.0]), ["k"], ["t"], "p", n=3).orderBy("t").collect()
    assert up[0]["rsi"] is None  # no prior row
    assert up[1]["rsi"] == 100.0 and up[2]["rsi"] == 100.0  # zero losses
    down = indicators.rsi(_series(spark, [3.0, 2.0, 1.0]), ["k"], ["t"], "p", n=3).orderBy("t").collect()
    assert down[1]["rsi"] == 0.0 and down[2]["rsi"] == 0.0  # zero gains
    mixed = indicators.rsi(_series(spark, [10.0, 13.0, 12.0]), ["k"], ["t"], "p", n=3).orderBy("t").collect()
    # gains 3.00, losses 1.00 → RSI = 100 - 100/(1+3) = 75
    assert math.isclose(mixed[2]["rsi"], 75.0, rel_tol=1e-12)


def test_vwap_hand_check(spark):
    df = spark.createDataFrame(
        [("g", 10.0, 1.0), ("g", 20.0, 3.0)], ["grp", "price", "qty"]
    )
    row = indicators.vwap(df, ["grp"], "price", "qty").collect()[0]
    assert row["vwap"] == (10.0 * 1 + 20.0 * 3) / 4.0  # 17.5
    assert row["total_qty"] == 4.0
