"""Versioned snapshot publishing (io.publish_version family): immutable
version dirs + an atomically-flipped _LATEST pointer = consistent
snapshots, history reads, and pointer-flip rollback on plain parquet."""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.io import (
    list_versions,
    publish_version,
    read_version,
    set_latest_version,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "versioned_table")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_publish_read_latest_and_history(spark, table_dir):
    v1_df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    v2_df = spark.createDataFrame([(1, "a2"), (3, "c")], "id long, v string")
    assert publish_version(v1_df, table_dir) == 1
    assert publish_version(v2_df, table_dir) == 2
    assert list_versions(spark, table_dir) == [1, 2]
    # latest follows the pointer; history stays readable and unchanged
    assert _rows(read_version(spark, table_dir)) == _rows(v2_df)
    assert _rows(read_version(spark, table_dir, version=1)) == _rows(v1_df)


def test_rollback_is_a_pointer_flip(spark, table_dir):
    publish_version(spark.createDataFrame([(1,)], "id long"), table_dir)
    publish_version(spark.createDataFrame([(2,)], "id long"), table_dir)
    set_latest_version(spark, table_dir, 1)  # rollback
    assert _rows(read_version(spark, table_dir)) == [(1,)]
    # publishing after a rollback continues the version sequence (no reuse)
    publish_version(spark.createDataFrame([(3,)], "id long"), table_dir)
    assert list_versions(spark, table_dir) == [1, 2, 3]
    assert _rows(read_version(spark, table_dir)) == [(3,)]


def test_versions_are_immutable(spark, table_dir):
    publish_version(spark.createDataFrame([(1,)], "id long"), table_dir)
    # a second write into an existing version dir must fail loudly
    with pytest.raises(Exception):
        spark.createDataFrame([(9,)], "id long").write.mode("error").parquet(
            f"{table_dir}/v1"
        )
