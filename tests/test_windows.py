"""Window operator edge semantics: pandas NULL-head for SMA, NULL lag at
series start, percent-vs-first."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.operators.windows import (
    lag_pct_change,
    pct_vs_first,
    simple_moving_average,
)


def _series(spark):
    rows = [("t1", i, float(10 + i)) for i in range(1, 6)] + [("t2", 1, 100.0)]
    return spark.createDataFrame(rows, ["ticker", "seq", "price"])


def test_sma_null_head(spark):
    out = (
        simple_moving_average(_series(spark), "price", 3, ["ticker"], [F.col("seq")], "sma3")
        .filter(F.col("ticker") == "t1")
        .orderBy("seq")
        .collect()
    )
    # pandas rolling(3).mean(): first two rows NaN, then full-window means
    assert [r["sma3"] for r in out] == [None, None, 12.0, 13.0, 14.0]


def test_sma_short_series_all_null(spark):
    out = (
        simple_moving_average(_series(spark), "price", 3, ["ticker"], [F.col("seq")], "sma3")
        .filter(F.col("ticker") == "t2")
        .collect()
    )
    assert [r["sma3"] for r in out] == [None]


def test_lag_pct_change_null_at_start(spark):
    out = (
        lag_pct_change(_series(spark), "price", ["ticker"], [F.col("seq")], "gap")
        .filter(F.col("ticker") == "t1")
        .orderBy("seq")
        .collect()
    )
    assert out[0]["gap"] is None
    assert abs(out[1]["gap"] - (12.0 - 11.0) / 11.0 * 100) < 1e-12


def test_pct_vs_first(spark):
    out = (
        pct_vs_first(_series(spark), "price", ["ticker"], [F.col("seq")], "pct")
        .filter(F.col("ticker") == "t1")
        .orderBy("seq")
        .collect()
    )
    assert out[0]["pct"] == 0.0
    assert abs(out[-1]["pct"] - (15.0 - 11.0) / 11.0 * 100) < 1e-12

def test_clamped_sum_fold_and_linear_equal(spark):
    """Both physical strategies of the clamped running sum must agree
    exactly (integer arithmetic) — multi-key, deltas that dip below the
    floor repeatedly, plus a NULL delta that must pass the balance
    through unchanged."""
    from stock_data_pipeline_spark.operators.windows import (
        clamped_running_sum_fold,
        clamped_running_sum_linear,
    )

    rows = []
    for k in (1, 2):
        for t in range(300):
            delta = ((t * 37 + k * 11) % 21) - 10  # swings -10..+10
            rows.append((k, t, delta if t % 50 else None))
    df = spark.createDataFrame(rows, "k int, t int, delta int")
    fold = {
        (r["k"], r["t"]): r["balance"]
        for r in clamped_running_sum_fold(df, ["k"], ["t"], "delta").collect()
    }
    lin = {
        (r["k"], r["t"]): r["balance"]
        for r in clamped_running_sum_linear(df, ["k"], ["t"], "delta").collect()
    }
    assert fold == lin


def test_clamped_sum_window_closed_form_equals_twins(spark):
    """The production path (prefix-sum / running-min closed form) must
    equal BOTH independently-derived twins exactly — multi-key, floor
    crossings, NULL deltas, and a negative floor."""
    from stock_data_pipeline_spark.operators.windows import (
        clamped_running_sum,
        clamped_running_sum_fold,
        clamped_running_sum_linear,
    )

    rows = []
    for k in (1, 2, 3):
        for t in range(257):
            delta = ((t * 37 + k * 11) % 21) - 10
            rows.append((k, t, delta if (t + k) % 41 else None))
    df = spark.createDataFrame(rows, "k int, t int, delta int")
    for floor in (0, -500):
        win = {
            (r["k"], r["t"]): r["balance"]
            for r in clamped_running_sum(df, ["k"], ["t"], "delta", floor=floor).collect()
        }
        fold = {
            (r["k"], r["t"]): r["balance"]
            for r in clamped_running_sum_fold(df, ["k"], ["t"], "delta", floor=floor).collect()
        }
        lin = {
            (r["k"], r["t"]): r["balance"]
            for r in clamped_running_sum_linear(df, ["k"], ["t"], "delta", floor=floor).collect()
        }
        assert win == fold == lin
    # the production plan must be pure JVM — no Arrow, no Python
    plan = clamped_running_sum(df, ["k"], ["t"], "delta")._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan


def test_clamped_sum_linear_100k_single_key(spark):
    """Scale shape that kills the O(n²) fold: one key, 10⁵ rows. The
    linear path must finish fast and match a Python replay exactly."""
    import time

    from stock_data_pipeline_spark.operators.windows import clamped_running_sum_linear

    n = 100_000
    deltas = [((i * 2654435761) % 2001) - 1000 for i in range(n)]
    df = spark.createDataFrame(
        [(1, i, d) for i, d in enumerate(deltas)], "k int, t int, delta long"
    ).repartition(8)
    t0 = time.monotonic()
    out = (
        clamped_running_sum_linear(df, ["k"], ["t"], "delta")
        .orderBy("t")
        .collect()
    )
    elapsed = time.monotonic() - t0
    bal, refs = 0, []
    for d in deltas:
        bal = max(0, bal + d)
        refs.append(bal)
    assert [r["balance"] for r in out] == refs
    assert elapsed < 60, f"linear path took {elapsed:.1f}s on 1e5 rows"
