"""Set operations — SURVEY.md §2-I.

The reference diffs ETF membership with Python list comprehensions over
column names (new tickers: sector.py:170-171; delisted: main.py:135-137;
dedup: main.py:146-148). In long layout these are data-level anti-joins,
which scale (a left-anti join broadcasts the small side and never
shuffles the big one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def membership_diff(
    current: DataFrame, previous: DataFrame, key_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Return ``(added, removed)`` key sets between two snapshots.

    added   = keys in ``current`` not in ``previous``  (sector.py:170-171)
    removed = keys in ``previous`` not in ``current``  (main.py:135-137)
    """
    cur = current.select(*key_cols).distinct()
    prev = previous.select(*key_cols).distinct()
    added = cur.join(prev, on=key_cols, how="left_anti")
    removed = prev.join(cur, on=key_cols, how="left_anti")
    return added, removed
