"""Dynamic partition overwrite and small-file compaction sinks."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from stock_data_pipeline_spark.io import compact_parquet_table, overwrite_partitions


def _parquet_files(path: str) -> list[Path]:
    return [p for p in Path(path).rglob("*.parquet") if p.is_file()]


def test_overwrite_partitions_replaces_only_present(spark, tmp_path):
    path = str(tmp_path / "t")
    day1 = spark.createDataFrame([(1, "2024-01-01"), (2, "2024-01-02")], ["v", "d"])
    overwrite_partitions(day1, path, ["d"])
    # re-load day 2 with corrected values; day 1 must survive untouched
    fix2 = spark.createDataFrame([(99, "2024-01-02")], ["v", "d"])
    overwrite_partitions(fix2, path, ["d"])
    # partition values come back type-inferred (date), so compare as str
    got = {(str(r["d"]), r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}


def test_overwrite_partitions_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    day = spark.createDataFrame([(1, "2024-01-01")], ["v", "d"])
    overwrite_partitions(day, path, ["d"])
    overwrite_partitions(day, path, ["d"])  # re-run of the same job
    assert spark.read.parquet(path).count() == 1


def test_compact_reduces_file_count(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(10_000).withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    df.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64
    n_target = compact_parquet_table(spark, src, dst, target_file_bytes=10**9)
    assert n_target == 1
    assert len(_parquet_files(dst)) == 1
    assert spark.read.parquet(dst).count() == 10_000


def test_compact_respects_target_size(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "sized")
    spark.range(20_000).withColumn(
        "payload", F.sha2(F.col("id").cast("string"), 256)
    ).repartition(32).write.parquet(src)
    total = sum(p.stat().st_size for p in _parquet_files(src))
    target = total // 4  # ask for ~4 output files
    n_target = compact_parquet_table(spark, src, dst, target_file_bytes=target)
    assert 4 <= n_target <= 5  # ceil division of measured bytes
    assert len(_parquet_files(dst)) == n_target
    assert spark.read.parquet(dst).count() == 20_000


def test_compact_partitioned_keeps_layout(spark, tmp_path):
    src, dst = str(tmp_path / "p_small"), str(tmp_path / "p_compact")
    df = spark.range(5_000).withColumn("d", (F.col("id") % 3).cast("string"))
    df.repartition(24).write.partitionBy("d").parquet(src)
    assert len(_parquet_files(src)) > 24  # 24 per partition dir attempt
    compact_parquet_table(spark, src, dst, target_file_bytes=10**9, partition_by=["d"])
    out = spark.read.parquet(dst)
    assert out.count() == 5_000
    assert sorted(p.name for p in Path(dst).iterdir() if p.is_dir()) == [
        "d=0",
        "d=1",
        "d=2",
    ]
