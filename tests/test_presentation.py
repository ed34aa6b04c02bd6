"""Chart-frame helpers (B6 data side): levels pivot and trailing-window
percent change, replaying the reference's chart math on its committed
data."""

from __future__ import annotations

import csv

from pyspark.sql import functions as F

from stock_data_pipeline_spark.pipeline.presentation import (
    percent_change_frame,
    sector_price_levels,
)


def _history(spark):
    rows = [
        ("2026-01-0%d" % d, s, float(base + d))
        for d in range(1, 6)
        for s, base in (("xlk", 100), ("xle", 50))
    ]
    return spark.createDataFrame(rows, ["date", "sector", "calc_price"])


def test_levels_wide_shape(spark):
    wide = sector_price_levels(_history(spark))
    assert set(wide.columns) == {"date", "xlk", "xle"}
    first = wide.first()
    assert first["xlk"] == 101.0 and first["xle"] == 51.0


def test_percent_change_window(spark):
    out = percent_change_frame(_history(spark), days=3)
    got = {
        (r["sector"], r["date"]): r["pct_change"] for r in out.collect()
    }
    # 3-day window = days 3..5; day 3 is the base (0%)
    assert got[("xlk", "2026-01-03")] == 0.0
    assert abs(got[("xlk", "2026-01-05")] - (105 - 103) / 103 * 100) < 1e-12
    assert abs(got[("xle", "2026-01-05")] - (55 - 53) / 53 * 100) < 1e-12
    assert ("xlk", "2026-01-02") not in got  # outside the window


def test_percent_change_replays_reference_chart_math(spark):
    """The reference's 5-day percent chart for a sector must be
    reproducible from its committed sector history CSV."""
    with open("/root/reference/data/xlu_sector_history.csv") as f:
        rows = [r for r in csv.DictReader(f) if r["xlu_calculated_price"] not in (None, "")]
    hist = spark.createDataFrame(
        [(r["date"], "xlu", float(r["xlu_calculated_price"])) for r in rows],
        ["date", "sector", "calc_price"],
    )
    out = {r["date"]: r["pct_change"] for r in percent_change_frame(hist, 5).collect()}
    assert len(out) == 5
    last5 = sorted(r["date"] for r in rows)[-5:]
    base = float([r for r in rows if r["date"] == last5[0]][0]["xlu_calculated_price"])
    for d in last5:
        expected = (float([r for r in rows if r["date"] == d][0]["xlu_calculated_price"]) - base) / base * 100
        assert abs(out[d] - expected) < 1e-9
