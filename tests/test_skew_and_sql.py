"""Salted-join correctness vs a plain join, Pandas-UDF SMA twin vs the
native window, and SQL-API ≡ DataFrame-API parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import register_views
from stock_data_pipeline_spark.operators.skew import salted_group_count, salted_join
from stock_data_pipeline_spark.operators.windows import (
    simple_moving_average,
    simple_moving_average_pandas,
)

SF = "/root/testdata/sf0.001"


def _skewed(spark):
    # 90% of rows share one hot key
    rows = [("hot", i, float(i)) for i in range(900)] + [
        (f"k{i}", i, float(i)) for i in range(100)
    ]
    left = spark.createDataFrame(rows, ["k", "seq", "v"])
    right = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k5", 3.0)], ["k", "w"]
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"]).select("k", "seq", "v", "w")
    salted = salted_join(left, right, ["k"], num_salts=8).select("k", "seq", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left, right = _skewed(spark)
    plain = left.join(right, ["k"], "left").select("k", "seq", "w")
    salted = salted_join(left, right, ["k"], num_salts=4, how="left").select("k", "seq", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_group_count(spark):
    left, _ = _skewed(spark)
    plain = {r["k"]: r["n"] for r in left.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r["k"]: r["count"] for r in salted_group_count(left, ["k"], 8).collect()}
    assert plain == salted


def test_pandas_sma_matches_native(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    native = simple_moving_average(
        o, "o_totalprice", 3, ["o_custkey"], [F.col("o_orderkey")], "sma3"
    )
    pandas_v = simple_moving_average_pandas(
        o, "o_totalprice", 3, ["o_custkey"], ["o_orderkey"], "sma3"
    )
    nv = {(r["o_custkey"], r["o_orderkey"]): r["sma3"] for r in native.collect()}
    pv = {(r["o_custkey"], r["o_orderkey"]): r["sma3"] for r in pandas_v.collect()}
    assert set(nv) == set(pv)
    for k, v in nv.items():
        if v is None:
            assert pv[k] is None or pv[k] != pv[k]  # pandas NaN
        else:
            assert abs(pv[k] - v) < 1e-9


def test_sql_api_equals_dataframe_api(spark):
    """spark.sql over registered views must plan to the same results as
    the DataFrame-built flagship (Catalyst parses both into one logical
    algebra)."""
    register_views(spark, SF)
    sql = spark.sql("""
        WITH mcap AS (
            SELECT date_format(o_orderdate, 'yyyy-MM-dd') AS date,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2))) AS market_cap
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1
        ), outst AS (
            SELECT date_format(o_orderdate, 'yyyy-MM-dd') AS date,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS outstanding
            FROM orders GROUP BY 1
        )
        SELECT m.date,
               CAST(m.market_cap AS DOUBLE) / CAST(o.outstanding AS DOUBLE) AS calc_price
        FROM mcap m JOIN outst o ON m.date = o.date
    """)
    from stock_data_pipeline_spark.queries import REGISTRY

    df_api = REGISTRY["q01_sector_calculated_price"].fn(spark, SF)
    a = {r["date"]: r["calc_price"] for r in sql.collect()}
    b = {r["date"]: r["calc_price"] for r in df_api.collect()}
    assert a == b
