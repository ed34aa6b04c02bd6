"""Flagship sector-price pipeline (J1/EP3) on a literal fixture, incl.
the UPDATE-where-NULL refresh composed via coalesce_merge."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from stock_data_pipeline_spark.operators.merge import coalesce_merge
from stock_data_pipeline_spark.pipeline.sector import (
    calculate_sector_price,
    calculate_sector_price_strict,
)

D1, D2 = dt.date(2026, 1, 2), dt.date(2026, 1, 5)


def _fixture(spark):
    prices = spark.createDataFrame(
        [
            (D1, "aapl", 100.0),
            (D1, "msft", 200.0),
            (D2, "aapl", 110.0),
            (D2, "msft", 190.0),
        ],
        ["date", "ticker", "close"],
    )
    shares = spark.createDataFrame(
        [
            (D1, "xlk", "aapl", 10),
            (D1, "xlk", "msft", 5),
            (D2, "xlk", "aapl", 10),
            (D2, "xlk", "msft", 5),
        ],
        ["date", "sector", "ticker", "shares_held"],
    )
    outstanding = spark.createDataFrame(
        [(D1, "xlk", 100), (D2, "xlk", 100)],
        ["date", "sector", "shares_outstanding"],
    )
    return prices, shares, outstanding


def test_weighted_sector_price(spark):
    prices, shares, outstanding = _fixture(spark)
    out = {
        r["date"]: r["calc_price"]
        for r in calculate_sector_price(prices, shares, outstanding).collect()
    }
    # (100*10 + 200*5) / 100 = 20 ; (110*10 + 190*5) / 100 = 20.5
    assert out == {D1: 20.0, D2: 20.5}


def test_missing_outstanding_row_absent(spark):
    prices, shares, outstanding = _fixture(spark)
    out = calculate_sector_price(
        prices, shares, outstanding.filter(F.col("date") == D1)
    ).collect()
    assert {r["date"] for r in out} == {D1}  # D2 has no divisor → no row


def test_strict_nulls_date_with_missing_member(spark):
    """SQL-faithful variant: one missing constituent price NULLs the
    whole date (the reference's literal p1*s1 + p2*s2 + … expression —
    SQL + propagates NULL), while complete dates still compute."""
    prices, shares, outstanding = _fixture(spark)
    membership = shares.select("date", "sector", "ticker")
    out = {
        r["date"]: r["calc_price"]
        for r in calculate_sector_price_strict(
            prices.filter(~((F.col("date") == D2) & (F.col("ticker") == "msft"))),
            shares,
            outstanding,
            membership,
        ).collect()
    }
    assert out[D1] == 20.0
    assert out[D2] is None  # msft price missing on D2 → NULL, row kept


def test_update_where_null_refresh(spark):
    """Reference semantics (sector.py:98): only NULL calc prices get
    filled on re-run; existing values are left untouched."""
    prices, shares, outstanding = _fixture(spark)
    fresh = calculate_sector_price(prices, shares, outstanding)
    existing = spark.createDataFrame(
        [(D1, "xlk", 99.0), (D2, "xlk", None)],
        "date date, sector string, calc_price double",
    )
    merged = {
        r["date"]: r["calc_price"]
        for r in coalesce_merge(existing, fresh, ["date", "sector"], ["calc_price"]).collect()
    }
    assert merged[D1] == 99.0  # already computed → untouched
    assert merged[D2] == 20.5  # was NULL → filled
