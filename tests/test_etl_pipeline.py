"""End-to-end daily pipeline (EP1→EP3 restatement): ingest gating,
idempotence, compute-only-missing refresh, wide export shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stock_data_pipeline_spark.pipeline.etl import run_daily_pipeline

D1, D2, D3 = dt.date(2026, 1, 5), dt.date(2026, 1, 6), dt.date(2026, 1, 10)  # Mon, Tue, Sat


def _world(spark):
    prices_state = spark.createDataFrame(
        [(D1, "aapl", 100.0), (D1, "msft", 200.0)], ["date", "ticker", "close"]
    )
    incoming = spark.createDataFrame(
        [
            (D1, "aapl", 999.0),   # overlap — must be dropped (idempotence)
            (D2, "aapl", 110.0),
            (D2, "msft", 190.0),
            (D3, "aapl", 50.0),    # Saturday — must be gated out
        ],
        ["date", "ticker", "close"],
    )
    shares = spark.createDataFrame(
        [(d, "xlk", t, s) for d in (D1, D2) for t, s in (("aapl", 10), ("msft", 5))],
        ["date", "sector", "ticker", "shares_held"],
    )
    outstanding = spark.createDataFrame(
        [(D1, "xlk", 100), (D2, "xlk", 100)],
        ["date", "sector", "shares_outstanding"],
    )
    history_state = spark.createDataFrame(
        [(D1, "xlk", 77.0)],  # D1 already computed → must NOT be overwritten
        "date date, sector string, calc_price double",
    )
    market_days = spark.createDataFrame([(D1,), (D2,)], ["date"])
    return prices_state, incoming, shares, outstanding, history_state, market_days


def test_daily_run_end_to_end(spark):
    prices_state, incoming, shares, outstanding, history_state, market_days = _world(spark)
    res = run_daily_pipeline(
        prices_state, incoming, shares, outstanding, history_state, market_days,
        tickers=["aapl", "msft"],
    )
    prices = {(r["date"], r["ticker"]): r["close"] for r in res.prices.collect()}
    # overlap dropped, Saturday gated, new day ingested
    assert prices[(D1, "aapl")] == 100.0
    assert (D3, "aapl") not in prices
    assert prices[(D2, "msft")] == 190.0

    hist = {r["date"]: r["calc_price"] for r in res.sector_history.collect()}
    assert hist[D1] == 77.0          # UPDATE-where-NULL: existing value kept
    assert hist[D2] == 20.5          # (110*10 + 190*5) / 100

    wide = {r["date"]: r for r in res.wide_export.collect()}
    assert wide[D2]["aapl"] == 110.0
    assert wide[D2]["xlk"] == 20.5
    assert set(res.wide_export.columns) == {"date", "aapl", "msft", "xlk"}


def test_refresh_fills_only_nulls_deterministically(spark):
    """The already-computed state value must survive regardless of
    partitioning: the refresh appends only keys absent from state (anti
    join), so there is no arbitrary-winner dedup that could let fresh's
    recomputation clobber state. Regression for the dropDuplicates
    nondeterminism (ADVICE r1)."""
    prices_state, incoming, shares, outstanding, history_state, market_days = _world(spark)
    # adversarial layouts: single partition, many partitions, key-skewed
    for n in (1, 7, 64):
        res = run_daily_pipeline(
            prices_state, incoming, shares, outstanding,
            history_state.repartition(n), market_days,
        )
        rows = res.sector_history.collect()
        keys = [(r["date"], r["sector"]) for r in rows]
        assert len(keys) == len(set(keys))  # exactly one row per key
        hist = {r["date"]: r["calc_price"] for r in rows}
        assert hist[D1] == 77.0  # state value kept, never fresh's 16.0 recompute
        assert hist[D2] == 20.5


def test_daily_run_is_idempotent(spark):
    prices_state, incoming, shares, outstanding, history_state, market_days = _world(spark)
    first = run_daily_pipeline(
        prices_state, incoming, shares, outstanding, history_state, market_days
    )
    again = run_daily_pipeline(
        first.prices, incoming, shares, outstanding, first.sector_history, market_days
    )
    assert again.prices.count() == first.prices.count()
    h1 = {(r["date"], r["sector"]): r["calc_price"] for r in first.sector_history.collect()}
    h2 = {(r["date"], r["sector"]): r["calc_price"] for r in again.sector_history.collect()}
    assert h1 == h2
