"""Presentation-edge frames — SURVEY.md §2 B6 (chart sink), W4/F7.

The reference renders plotly JPEGs of (a) calculated sector price levels
and (b) percent change vs the start of a trailing N-day window
(sectors.py:134-265). Rendering is not an engine operator; the engine's
job is the chart-ready frame. These helpers produce exactly the frames
those charts consume — the caller hands them to ``df.toPandas()`` and
any plotting library.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_data_pipeline_spark.operators.topn import tail_n
from stock_data_pipeline_spark.operators.windows import pct_vs_first


def sector_price_levels(history: DataFrame) -> DataFrame:
    """(date, sector, calc_price) → wide (date, one column per sector) —
    the levels chart input (sectors.py:134-165)."""
    return (
        history.groupBy("date")
        .pivot("sector")
        .agg(F.first("calc_price"))
        .orderBy("date")
    )


def percent_change_frame(history: DataFrame, days: int) -> DataFrame:
    """Percent change vs the first day of the trailing ``days`` window,
    per sector (sectors.py:167-204: tail-N slice then
    (p − p₀)/p₀ × 100). Returns long (date, sector, pct_change);
    pivot with :func:`sector_price_levels`-style call for the wide
    chart shape."""
    tail = tail_n(history, "date", days, partition_by=["sector"])
    out = pct_vs_first(
        tail, "calc_price", ["sector"], [F.col("date")], out_name="pct_change"
    )
    return out.select("date", "sector", "pct_change")
