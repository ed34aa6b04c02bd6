from stock_data_pipeline_spark.functions.scalars import (
    business_day_adjust,
    convert_shares_outstanding,
    date_to_string,
    dollar_volume,
    intraday_change_pct,
    make_ticker_sql_compatible,
    make_ticker_yfinance_compatible,
    parse_date,
    weight_normalize,
)

__all__ = [
    "business_day_adjust",
    "convert_shares_outstanding",
    "date_to_string",
    "dollar_volume",
    "intraday_change_pct",
    "make_ticker_sql_compatible",
    "make_ticker_yfinance_compatible",
    "parse_date",
    "weight_normalize",
]
