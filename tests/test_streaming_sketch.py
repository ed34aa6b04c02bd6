"""Mergeable sketches under streaming: a count-min sketch accumulated
micro-batch by micro-batch (foreachBatch appending per-batch partial
counter cells) must merge — by plain SUM, the sketch's merge operator —
to the identical counter array a one-shot batch build produces. This is
the property that lets a 100 TB pipeline maintain frequency/cardinality
summaries incrementally instead of rescanning: CMS/KMV merges are
commutative monoids, so partial sketches from any partitioning of the
data (micro-batches, shards, days) combine exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.catalog import load_events

SF = "/root/testdata/sf0.001"

_CMS_ROWS = [(48271, 11213), (69621, 28411), (40692, 52711)]
_W = 512
_P = 2147483647


def _cms_cells(df):
    """Per-(row, position) counter increments for user_id occurrences —
    the same double-affine portable hash family as q200."""
    from stock_data_pipeline_spark.operators.sketches import kmv_hash

    h = kmv_hash(F.col("user_id"))
    out = None
    for j, (a, b) in enumerate(_CMS_ROWS):
        pos = F.pmod(F.pmod(h * a + b, F.lit(_P).cast("long")), F.lit(_W))
        part = df.select(F.lit(j).alias("r"), pos.alias("pos"))
        out = part if out is None else out.unionByName(part)
    return out.groupBy("r", "pos").agg(F.count("*").cast("long").alias("c"))


def test_streaming_cms_merges_to_batch_sketch(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "cms_partials")

    events = load_events(spark, SF).select(F.col("user_id").cast("long"))
    # 5 files -> 5 micro-batches with maxFilesPerTrigger=1: the merge
    # property is only exercised when there is more than one partial
    events.repartition(5).write.parquet(src_dir)

    def write_batch(batch_df, epoch_id: int):
        (
            _cms_cells(batch_df)
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(sink_dir)
        )

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream.writeStream.foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    partials = spark.read.parquet(sink_dir)
    n_epochs = partials.select("epoch").distinct().count()
    assert n_epochs >= 2, "need multiple micro-batches to test the merge"

    merged = {
        (r.r, r.pos): r.c
        for r in partials.groupBy("r", "pos")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    }
    batch = {(r.r, r.pos): r.c for r in _cms_cells(events).collect()}
    assert merged == batch  # SUM-merge of partials == one-shot sketch


def test_streaming_hll_registers_merge_to_batch_sketch(spark, tmp_path):
    """HLL's merge operator is register-wise MAX: per-micro-batch
    register partials MAX-merged across epochs must equal the one-shot
    batch registers (the q224/q244 sketches maintained incrementally)."""
    from stock_data_pipeline_spark.queries import _hll_rank_col, _mix31_col, _HLL_M

    src_dir = str(tmp_path / "hll_src")
    sink_dir = str(tmp_path / "hll_partials")

    events = load_events(spark, SF).select(F.col("user_id").cast("long"))
    events.repartition(5).write.parquet(src_dir)

    def regs(df):
        h = _mix31_col(F.col("user_id"))
        idx = F.pmod(h, F.lit(_HLL_M).cast("long"))
        w = ((h - idx) / _HLL_M).cast("long")
        return (
            df.select(idx.alias("idx"), _hll_rank_col(w).alias("rank"))
            .groupBy("idx")
            .agg(F.max("rank").alias("m"))
        )

    def write_batch(batch_df, epoch_id: int):
        regs(batch_df).withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            sink_dir
        )

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream.writeStream.foreachBatch(write_batch).start()
    q.processAllAvailable()
    q.stop()

    partials = spark.read.parquet(sink_dir)
    assert partials.select("epoch").distinct().count() >= 2  # real merge exercised
    merged = {
        r.idx: r.m
        for r in partials.groupBy("idx").agg(F.max("m").alias("m")).collect()
    }
    batch = {r.idx: r.m for r in regs(spark.read.parquet(src_dir)).collect()}
    assert merged == batch


def test_streaming_mg_candidates_cover_true_heavy_hitters(spark, tmp_path):
    """The streaming Misra–Gries operator's FINAL per-shard candidate
    sets (latest emit_seq per shard) must contain every true heavy
    hitter of the full stream — the q305 losslessness argument carried
    across micro-batch state. A small k_budget forces real evictions."""
    from stock_data_pipeline_spark.streaming.stateful import (
        streaming_heavy_hitter_candidates,
    )

    src_dir = str(tmp_path / "mg_src")
    k_budget, n_shards = 16, 4

    batch = load_events(spark, SF).select(F.col("user_id").cast("long"))
    batch.repartition(5).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        streaming_heavy_hitter_candidates(
            stream, "user_id", n_shards=n_shards, k_budget=k_budget
        )
        .writeStream.format("memory")
        .queryName("mg_out")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM mg_out").collect()
    assert out, "stream emitted nothing"
    last_seq = {}
    for r in out:
        last_seq[r.shard] = max(last_seq.get(r.shard, 0), r.emit_seq)
    candidates = {r.key for r in out if r.emit_seq == last_seq[r.shard]}
    # state really is bounded: < k_budget live counters per shard at
    # every emission
    from collections import Counter
    per_emit = Counter((r.shard, r.emit_seq) for r in out)
    assert max(per_emit.values()) < k_budget

    n = batch.count()
    true_hh = {
        r.user_id
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") * k_budget > F.lit(n))
        .collect()
    }
    assert true_hh, "fixture has no heavy hitters at this k — test is vacuous"
    assert true_hh <= candidates, (
        f"missed heavy hitters: {sorted(true_hh - candidates)[:5]}"
    )
