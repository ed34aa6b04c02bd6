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


def test_svg_chart_sink_renders_valid_chart(spark, tmp_path):
    """B6 end-to-end: wide levels frame → SVG file. The SVG must be
    well-formed XML with one polyline per sector whose point count
    matches the date count, x strictly increasing, and min/max values
    mapped to the plot edges within the 5% headroom."""
    import xml.etree.ElementTree as ET

    from stock_data_pipeline_spark.pipeline.presentation import write_chart_sink

    wide = sector_price_levels(_history(spark))
    out = str(tmp_path / "levels.svg")
    write_chart_sink(wide, out, title="sector levels")
    root = ET.parse(out).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    polys = root.findall(f"{ns}polyline")
    assert {p.attrib["data-series"] for p in polys} == {"xlk", "xle"}
    for p in polys:
        pts = [tuple(map(float, xy.split(","))) for xy in p.attrib["points"].split()]
        assert len(pts) == 5
        xs = [x for x, _ in pts]
        assert xs == sorted(xs) and len(set(xs)) == 5
        ys = [y for _, y in pts]
        # levels increase by date, so pixel y must strictly decrease
        assert ys == sorted(ys, reverse=True)
    # legend present for both series
    texts = [t.text for t in root.iter(f"{ns}text")]
    assert "xlk" in texts and "xle" in texts


def test_svg_chart_gaps_nulls(spark, tmp_path):
    """NULL points must break the polyline into segments, not be
    interpolated through (missing market days stay visible)."""
    import xml.etree.ElementTree as ET

    from stock_data_pipeline_spark.pipeline.presentation import write_chart_sink

    rows = [
        ("2026-01-01", 1.0), ("2026-01-02", 2.0), ("2026-01-03", None),
        ("2026-01-04", 4.0), ("2026-01-05", 5.0),
    ]
    df = spark.createDataFrame(rows, ["date", "xlk"])
    out = str(tmp_path / "gap.svg")
    write_chart_sink(df, out)
    root = ET.parse(out).getroot()
    ns = "{http://www.w3.org/2000/svg}"
    polys = root.findall(f"{ns}polyline")
    assert len(polys) == 2  # two segments around the gap
    assert [len(p.attrib["points"].split()) for p in polys] == [2, 2]
