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
