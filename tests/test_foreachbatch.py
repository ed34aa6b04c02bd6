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
