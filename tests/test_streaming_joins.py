"""Stream-static enrichment and stream-stream interval joins: real
readStream runs through the memory sink, checked against the identical
function applied to the batch frames (one code path, two modes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_data_pipeline_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)

CLICK_COLS = ["user_id", "c_ts", "click_id"]
VIEW_COLS = ["user_id", "v_ts", "view_id"]

VIEWS = [
    (1, "2024-01-01 10:00:00", 100),
    (1, "2024-01-01 12:00:00", 101),
    (2, "2024-01-01 10:30:00", 102),
    (3, "2024-01-01 09:00:00", 103),
]
CLICKS = [
    (1, "2024-01-01 10:20:00", 900),  # within 1h of view 100
    (1, "2024-01-01 11:30:00", 901),  # >1h after 100, before 101 → no match
    (2, "2024-01-01 10:29:00", 902),  # BEFORE view 102 → no match (strict >)
    (2, "2024-01-01 11:30:00", 903),  # within 1h of 102
    (4, "2024-01-01 10:00:00", 904),  # no view for user 4
]
EXPECTED_PAIRS = {(100, 900), (102, 903)}


def _frames(spark):
    views = spark.createDataFrame(VIEWS, VIEW_COLS).withColumn("v_ts", F.to_timestamp("v_ts"))
    clicks = spark.createDataFrame(CLICKS, CLICK_COLS).withColumn("c_ts", F.to_timestamp("c_ts"))
    return views, clicks


def test_interval_join_batch_twin(spark):
    views, clicks = _frames(spark)
    out = stream_stream_interval_join(
        views, clicks, key="user_id", l_ts="v_ts", r_ts="c_ts", within="1 hour"
    )
    got = {(r["view_id"], r["click_id"]) for r in out.collect()}
    assert got == EXPECTED_PAIRS
    assert out.columns.count("user_id") == 1


def test_interval_join_stream_stream(spark, tmp_path):
    views, clicks = _frames(spark)
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.coalesce(1).write.parquet(vdir)
    clicks.coalesce(1).write.parquet(cdir)
    vs = spark.readStream.schema(views.schema).parquet(vdir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    out = stream_stream_interval_join(
        vs, cs, key="user_id", l_ts="v_ts", r_ts="c_ts", within="1 hour"
    )
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["view_id"], r["click_id"])
            for r in spark.sql("SELECT view_id, click_id FROM ssj_smoke").collect()
        }
        assert got == EXPECTED_PAIRS
    finally:
        q.stop()


def test_interval_join_rejects_same_ts_name(spark):
    views, clicks = _frames(spark)
    import pytest

    with pytest.raises(ValueError, match="rename"):
        stream_stream_interval_join(
            views, views, key="user_id", l_ts="v_ts", r_ts="v_ts"
        )


def test_stream_static_enrich(spark, tmp_path):
    views, _ = _frames(spark)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "tier"]
    )
    vdir = str(tmp_path / "views")
    views.coalesce(1).write.parquet(vdir)
    vs = spark.readStream.schema(views.schema).parquet(vdir)
    out = stream_static_enrich(vs, dim, "user_id", how="left")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sse_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT view_id, tier FROM sse_smoke").collect()
        tiers = {r["view_id"]: r["tier"] for r in rows}
        assert tiers == {100: "gold", 101: "gold", 102: "silver", 103: None}
    finally:
        q.stop()


def test_stream_static_rejects_right_outer(spark):
    views, _ = _frames(spark)
    dim = views.select("user_id").distinct()
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        stream_static_enrich(views, dim, "user_id", how="right")
