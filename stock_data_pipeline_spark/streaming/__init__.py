from stock_data_pipeline_spark.streaming.events import (
    read_events_stream,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "read_events_stream",
    "sessionize",
    "sliding_window_agg",
    "tumbling_window_agg",
]
