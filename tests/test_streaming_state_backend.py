"""Production state-backend + exactly-once sink properties (r07).

Two at-scale streaming guarantees the rest of the suite assumed but
never pinned:

1. The stateful operators run on the RocksDB state store provider —
   the backend a 100-TB deployment actually uses (the default
   HDFS-backed store keeps every key's state on the executor HEAP;
   state for billions of keys only fits when it can spill, which is
   exactly what RocksDB provides). The provider changes serialization
   and lifecycle, not semantics — this test proves our
   applyInPandasWithState operator produces identical results,
   INCLUDING across a checkpoint restart on the same backend.

2. foreachBatch is at-least-once: after a crash between a sink write
   and the checkpoint commit, the SAME (batchId, data) is re-delivered
   on restart. The standard exactly-once recipe is an idempotent sink
   keyed by batchId (overwrite-by-batchId). The test re-invokes the
   sink with a duplicate (batchId, df) delivery — the documented
   failure replay — and asserts the output is byte-identical to a
   single delivery.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def _put(in_dir, name: str, rows: list[tuple[int, float]]) -> None:
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "value": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        in_dir / name,
    )


def test_stateful_on_rocksdb_store_with_restart(spark, tmp_path):
    from stock_data_pipeline_spark.streaming.stateful import running_totals_per_user

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run(query_name: str) -> list:
        collected: list = []
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        q = (
            running_totals_per_user(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
            .queryName(query_name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return collected

    base = spark.conf.get(PROVIDER_CONF, None)
    spark.conf.set(PROVIDER_CONF, ROCKSDB)
    try:
        _put(in_dir, "f1.parquet", [(1, 10.0), (2, 5.0)])
        _put(in_dir, "f2.parquet", [(1, 2.0)])
        run("rocksdb_run1")
        # restart on the SAME RocksDB checkpoint with new data
        _put(in_dir, "f3.parquet", [(1, 1.0), (2, 1.0)])
        run2 = run("rocksdb_run2")
    finally:
        if base is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, base)
    last = {}
    for r in run2:  # update mode: later rows supersede
        last[r["user_id"]] = (r["events_seen"], r["value_sum"])
    # state carried across the restart on the RocksDB backend:
    # counts/sums continue from run 1, equal the batch ground truth
    assert last == {1: (3, 13.0), 2: (2, 6.0)}


def test_foreachbatch_idempotent_sink_absorbs_replay(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = tmp_path / "out"
    ckpt = str(tmp_path / "ckpt")

    def idempotent_write(df, batch_id: int) -> None:
        # the exactly-once recipe: output is keyed by batchId and each
        # delivery OVERWRITES its own key — a replayed batch lands on
        # the same path instead of appending a duplicate
        df.write.mode("overwrite").parquet(str(out_dir / f"batch_id={batch_id}"))

    _put(in_dir, "f1.parquet", [(1, 10.0), (2, 5.0)])
    _put(in_dir, "f2.parquet", [(1, 2.0)])
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    agg = stream.groupBy("user_id").agg(F.sum("value").alias("s"))
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(idempotent_write)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    def read_out():
        return sorted(
            map(
                tuple,
                spark.read.option("basePath", str(out_dir))
                .parquet(str(out_dir))
                .select("batch_id", "user_id", "s")
                .collect(),
            )
        )

    once = read_out()
    batch_ids = sorted({r[0] for r in once})
    assert len(batch_ids) >= 2  # maxFilesPerTrigger=1 → one batch per file

    # simulate the at-least-once failure replay: the LAST batch is
    # re-delivered with the same batchId and the same rows (exactly
    # what a post-write pre-commit crash produces on restart)
    last_id = batch_ids[-1]
    replay_df = (
        spark.read.parquet(str(out_dir / f"batch_id={last_id}"))
        .select("user_id", "s")
        .withColumnRenamed("s", "value")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"))
    )
    idempotent_write(replay_df, last_id)

    assert read_out() == once, "a replayed (batchId, data) delivery changed the output"
