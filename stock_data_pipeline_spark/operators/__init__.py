from stock_data_pipeline_spark.operators.asof import asof_join
from stock_data_pipeline_spark.operators.calendar import densify_dates, market_day_filter
from stock_data_pipeline_spark.operators.incremental import (
    append_incremental,
    enforce_primary_key,
    filter_after,
    latest_value,
)
from stock_data_pipeline_spark.operators.merge import coalesce_merge
from stock_data_pipeline_spark.operators.pivoting import pivot_wide, unpivot_long
from stock_data_pipeline_spark.operators.setops import membership_diff
from stock_data_pipeline_spark.operators.topn import latest_row, tail_n, top_n_per_group
from stock_data_pipeline_spark.operators.windows import (
    lag_pct_change,
    pct_vs_first,
    simple_moving_average,
)

__all__ = [
    "append_incremental",
    "asof_join",
    "coalesce_merge",
    "densify_dates",
    "enforce_primary_key",
    "filter_after",
    "lag_pct_change",
    "latest_row",
    "latest_value",
    "market_day_filter",
    "membership_diff",
    "pct_vs_first",
    "pivot_wide",
    "simple_moving_average",
    "tail_n",
    "top_n_per_group",
    "unpivot_long",
]
