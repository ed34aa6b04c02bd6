"""Structured Streaming surface over the ``events`` table.

The reference has no streaming at all (SURVEY.md §2-K — its
"incremental" is cron + ``date > MAX(date)``); this module is the
designed-for-scale extension: watermarked tumbling/sliding windows and
gap sessionization, written so the *same* transformation functions run
on a batch DataFrame (oracle-checkable) and on a readStream DataFrame
(production shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# Raw on-disk schema: ts is INT64 (ns or µs by fixture gen) → read as long
# (see catalog.load_events for the batch path + why integer division).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events fixture (1-file-per-trigger keeps local smoke
    tests deterministic). In production this is a Kafka source with the
    same downstream plan."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # FileStreamSource wants a directory; select just the events file
    # out of the shared fixture dir with a glob filter
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # keep TIMESTAMP (LTZ): watermarks reject TIMESTAMP_NTZ event time
    # (the batch loader uses NTZ for oracle comparability instead)
    from stock_data_pipeline_spark.catalog import events_ts_unit

    if events_ts_unit(f"{sf_dir}/events.parquet") == "ns":
        raw = raw.withColumn("ts", F.expr("ts div 1000"))
    return raw.withColumn("ts", F.expr("timestamp_micros(ts)"))


def tumbling_window_agg(events: DataFrame, width: str = "1 hour", watermark: str | None = None) -> DataFrame:
    """Tumbling-window count/sum per event_type. Works on batch and
    stream; pass ``watermark`` (e.g. "10 minutes") on the stream path so
    state is bounded and late data beyond the bound is dropped."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            # decimal sum → exact, order-independent, engine-reproducible
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window (overlapping) aggregate — each event lands in
    width/slide windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the
    previous event of the same user exceeds ``gap_minutes``. One shuffle
    (by user), in-partition sort, two window passes — lag to mark
    breaks, running sum to number sessions.

    (Streaming twin: ``session_window(ts, gap)`` groupBy — same output
    grain; batch form is used for the oracle because it is exactly
    expressible in ANSI SQL.)
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    marked = events.withColumn(
        "__new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
                > gap_s
            ),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_id", F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same event
    (at-least-once sources re-emit on retry) across micro-batches.

    ``dropDuplicatesWithinWatermark`` keeps first-seen per key and
    evicts key state once the watermark passes — bounded state, which
    plain ``dropDuplicates`` on a stream does not give you (its state
    grows forever). The batch twin of this operator is q13/q24-style
    ``groupBy(key).min`` — same semantics, oracle-checkable; this is
    the production stream shape.
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    # batch fallback: deterministic keep-first (no arbitrary-row
    # dropDuplicates — see the NULL-fill refresh lesson in etl.py)
    w = Window.partitionBy(*keys).orderBy("ts", *keys)
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def session_window_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Streaming-native sessionization via ``session_window`` (dynamic
    gap windows with watermarked state eviction)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
