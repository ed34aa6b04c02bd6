"""Pivot / unpivot — SURVEY.md §2 G3.

The reference's canonical tables are *wide* (one column per ticker,
``{ticker}_price`` / ``{ticker}_shares`` — sector.py:167 pivots the
holdings workbook with ``pd.pivot``). Our canonical layout is long
(SURVEY.md §1.1); pivot/unpivot live at the presentation edge to
reproduce the reference's CSV shapes on demand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    index: str,
    key: str,
    value: str,
    values: list[str] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Long → wide. ``values`` (the explicit output column list) should
    always be passed at scale: it saves Spark a full pass to collect the
    distinct key set AND fixes the output schema (a requirement for
    streaming and for stable oracles).

    pandas ``pd.pivot`` *raises* on duplicate (index, key) cells
    (sector.py:167 relies on uniqueness); Spark's pivot silently
    aggregates. We keep ``first`` as the default but callers that need
    the reference's invariant should dedupe upstream
    (``operators.incremental.enforce_primary_key``).
    """
    agg_col = getattr(F, agg)(value)
    grouped = df.groupBy(index)
    piv = grouped.pivot(key, values) if values else grouped.pivot(key)
    return piv.agg(agg_col)


def unpivot_long(
    df: DataFrame,
    index: list[str],
    cols: list[str],
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long via the built-in ``unpivot`` (Spark ≥3.4; compiles to
    a generator expression — one scan, no shuffle, no UDF)."""
    return df.unpivot(index, cols, key_name, value_name)
