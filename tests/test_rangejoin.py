"""bucketed_range_join: exact point-in-interval semantics via bucket
equi-join + refine filter, equivalent to the naive BETWEEN join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark.operators.rangejoin import bucketed_range_join


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 17), (4, 23), (5, 100)], "pid long, ts long"
    )
    ivl = spark.createDataFrame(
        [
            (10, 0, 9),  # spans buckets 0-1 @ bucket=8
            (11, 8, 30),  # spans buckets 1-3
            (12, 17, 17),  # degenerate single-point interval
            (13, 40, 50),  # matches nothing
        ],
        "iid long, s long, e long",
    )
    return pts, ivl


def _naive(pts, ivl):
    return pts.join(ivl, (F.col("ts") >= F.col("s")) & (F.col("ts") <= F.col("e")))


def test_matches_naive_between_join(spark):
    pts, ivl = _fixtures(spark)
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(pts, ivl, "ts", "s", "e", bucket=8).collect()
    )
    want = sorted((r.pid, r.iid) for r in _naive(pts, ivl).collect())
    assert got == want
    # each match appears exactly once even when the interval spans
    # multiple buckets (the point lives in exactly one bucket)
    assert len(got) == len(set(got))


def test_bucket_size_invariance(spark):
    pts, ivl = _fixtures(spark)
    want = sorted((r.pid, r.iid) for r in _naive(pts, ivl).collect())
    for bucket in (1, 3, 64):
        got = sorted(
            (r.pid, r.iid)
            for r in bucketed_range_join(pts, ivl, "ts", "s", "e", bucket=bucket).collect()
        )
        assert got == want, f"bucket={bucket}"


def test_left_semi_and_extra_keys(spark):
    pts = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 50), (3, "b", 5), (4, "a", 15)],
        "pid long, k string, ts long",
    )
    # pid=4 (ts=15) shares bucket 1 with interval [8,9] but lies outside
    # it — the BETWEEN folded into the semi-join condition must reject it
    ivl = spark.createDataFrame([("a", 0, 9), ("a", 8, 9)], "k string, s long, e long")
    semi = bucketed_range_join(pts, ivl, "ts", "s", "e", bucket=8, extra_keys=["k"], how="left_semi")
    # left_semi keeps point columns only; extra key scopes the match to
    # k='a' (pid=3 has k='b'); pid=2 (ts=50) overlaps no bucket
    assert sorted(r.pid for r in semi.collect()) == [1]
    assert semi.columns == ["pid", "k", "ts"]


def test_rejects_outer_joins(spark):
    pts, ivl = _fixtures(spark)
    with pytest.raises(ValueError):
        bucketed_range_join(pts, ivl, "ts", "s", "e", bucket=8, how="left")


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, ivl = _fixtures(spark)
    plan = (
        bucketed_range_join(pts, ivl, "ts", "s", "e", bucket=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan[:2000]


def test_interval_overlap_matches_naive(spark):
    from stock_data_pipeline_spark.operators.rangejoin import (
        bucketed_interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(1, 0, 20), (2, 5, 9), (3, 30, 31), (4, 100, 100)],
        "aid long, a_s long, a_e long",
    )
    b = spark.createDataFrame(
        [(10, 8, 40), (11, 0, 3), (12, 99, 120), (13, 50, 60)],
        "bid long, b_s long, b_e long",
    )
    naive = sorted(
        (r.aid, r.bid)
        for r in a.join(
            b, (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e"))
        ).collect()
    )
    for bucket in (1, 4, 8, 1000):
        got = sorted(
            (r.aid, r.bid)
            for r in bucketed_interval_overlap_join(
                a, b, "a_s", "a_e", "b_s", "b_e", bucket=bucket
            ).collect()
        )
        assert got == naive, f"bucket={bucket}"
        # pairs spanning many shared buckets (e.g. [0,20]x[8,40]) still
        # appear exactly once — the max-start bucket rule dedups them
        assert len(got) == len(set(got))
