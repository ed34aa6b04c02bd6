"""Streaming surface: batch/stream parity for the window aggregates and
a real readStream smoke through the memory sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load_events
from stock_data_pipeline_spark.streaming.events import (
    read_events_stream,
    sessionize,
    tumbling_window_agg,
)

SF = "/root/testdata/sf0.001"


def test_tumbling_counts_sum_to_total(spark):
    ev = load_events(spark, SF)
    agg = tumbling_window_agg(ev, "1 hour")
    assert agg.agg(F.sum("n_events")).first()[0] == ev.count()


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),   # same session (10 min gap)
        (3, 100, "2024-01-01 01:00:00"),   # 50 min gap → new session
        (4, 200, "2024-01-01 00:00:00"),   # other user
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"]).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, gap_minutes=30)
    per_user = {(r["user_id"], r["session_id"]): r["n_events"] for r in out.collect()}
    assert per_user == {(100, 1): 2, (100, 2): 1, (200, 1): 1}


def test_readstream_tumbling_memory_sink(spark):
    stream = read_events_stream(spark, SF)
    assert stream.isStreaming
    agg = tumbling_window_agg(stream, "1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        total = spark.sql("SELECT sum(n_events) FROM tumbling_smoke").first()[0]
        assert total == load_events(spark, SF).count()
    finally:
        q.stop()
