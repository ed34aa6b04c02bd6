"""Edge semantics of the scalar function family (SURVEY.md §2-J),
mirroring the reference's behaviors on literal frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark.functions import scalars


def test_make_ticker_sql_compatible(spark):
    df = spark.createDataFrame([("BRK.B",), ("AAPL",), ("BF.B",)], ["t"])
    out = [r[0] for r in df.select(scalars.make_ticker_sql_compatible("t")).collect()]
    assert out == ["brk_b", "aapl", "bf_b"]


def test_make_ticker_yfinance_compatible(spark):
    df = spark.createDataFrame([("BRK.B",), ("brk_b",)], ["t"])
    out = [r[0] for r in df.select(scalars.make_ticker_yfinance_compatible("t")).collect()]
    assert out == ["BRK-B", "brk-b"]


def test_magnitude_parse_m_and_b(spark):
    df = spark.createDataFrame([("123.45 M",), ("1.04 B",), ("1,234.5 M",)], ["s"])
    out = [r[0] for r in df.select(scalars.convert_shares_outstanding("s")).collect()]
    assert out == [123450000, 1040000000, 1234500000]


def test_magnitude_parse_error_on_bad_suffix(spark):
    # reference raises on anything but M/B (sectors.py:122-132)
    df = spark.createDataFrame([("12 K",)], ["s"])
    with pytest.raises(Exception):
        df.select(scalars.convert_shares_outstanding("s")).collect()


@pytest.mark.parametrize(
    "date,expected",
    [
        ("2026-08-08", "2026-08-07"),  # Sat → Fri
        ("2026-08-09", "2026-08-07"),  # Sun → Fri
        ("2026-08-10", "2026-08-07"),  # Mon → prev Fri
        ("2026-08-11", "2026-08-10"),  # Tue → Mon
        ("2026-08-14", "2026-08-13"),  # Fri → Thu
    ],
)
def test_business_day_adjust(spark, date, expected):
    df = spark.createDataFrame([(date,)], ["d"]).select(F.to_date("d").alias("d"))
    out = df.select(F.date_format(scalars.business_day_adjust("d"), "yyyy-MM-dd")).first()[0]
    assert out == expected


def test_dollar_volume_is_plain_expr(spark):
    df = spark.createDataFrame([(10.0, 20.0, 100)], ["open", "close", "volume"])
    out = df.select(
        scalars.dollar_volume(F.col("open"), F.col("close"), F.col("volume")).alias("dv")
    ).first()[0]
    assert out == (20.0 + 10.0) / 2 * 100
