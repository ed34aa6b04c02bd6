"""Exactly-once streaming sink pattern: foreachBatch + idempotent
(epoch-keyed overwrite) parquet writes. A retried/replayed micro-batch
must not duplicate rows in the sink — the pattern every production
Spark streaming job uses for non-transactional stores."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.streaming.events import read_events_stream

SF = "/root/testdata/sf0.001"


def test_foreachbatch_idempotent_sink(spark, tmp_path):
    out_dir = str(tmp_path / "sink")

    def write_batch(batch_df, epoch_id: int):
        # epoch-keyed partition overwrite = replay-safe: a retried epoch
        # rewrites its own partition instead of appending a duplicate
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )
        # simulate the at-least-once hazard: the framework retries the
        # same epoch after a "failure" — second write must be a no-op
        (
            batch_df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_dir)
        )

    stream = read_events_stream(spark, SF).select("event_id", "user_id", "value")
    q = stream.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    sunk = spark.read.parquet(out_dir)
    total = sunk.count()
    distinct = sunk.select("event_id").distinct().count()
    source_total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == distinct == source_total  # no dupes despite the double write


def test_foreachbatch_cdc_apply_matches_batch(spark, tmp_path):
    """Streaming CDC consumption: a change feed applied snapshot-by-
    snapshot via foreachBatch + apply_changes + publish_version must
    converge to the same table a single batch apply produces — the
    composition of the CDC operator, the versioned sink, and the
    micro-batch loop."""
    from stock_data_pipeline_spark.catalog import load_events
    from stock_data_pipeline_spark.io import publish_version, read_version
    from stock_data_pipeline_spark.operators.merge import apply_changes
    from stock_data_pipeline_spark.streaming.events import read_events_stream

    table_dir = str(tmp_path / "cdc_table")

    def to_changes(df):
        # deterministic change feed derived from events: key = user,
        # op = delete on 'error' events, else upsert of the value
        return df.select(
            F.col("user_id").alias("k"),
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
            F.col("value").alias("v"),
            "ts",
            "event_id",
        )

    base = spark.createDataFrame([], "k long, v double")
    publish_version(base.select("k", "v"), table_dir)

    def apply_batch(batch_df, epoch_id: int):
        state = read_version(spark, table_dir).select("k", "v")
        nxt = apply_changes(
            state,
            to_changes(batch_df),
            keys=["k"],
            seq_cols=["ts", "event_id"],
        )
        publish_version(nxt.select("k", "v"), table_dir)

    stream = read_events_stream(spark, SF).select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    q = stream.writeStream.foreachBatch(apply_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["k"]: r["v"] for r in read_version(spark, table_dir).collect()}
    want = {
        r["k"]: r["v"]
        for r in apply_changes(
            base, to_changes(load_events(spark, SF)), ["k"], ["ts", "event_id"]
        ).collect()
    }
    assert got == want
