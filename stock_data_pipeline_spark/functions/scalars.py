"""Scalar column functions — SURVEY.md §2-J (X1–X15).

Every function here is a pure Column→Column expression built from
``pyspark.sql.functions`` builtins, so it stays inside whole-stage
codegen (no Python on the hot path). Reference semantics are cited per
function (file:line under /root/reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MAGNITUDE_PATTERN = r"([\d,.]+)\s*([MB])"


def make_ticker_sql_compatible(col: Column | str) -> Column:
    """X1 — ``BRK.B`` → ``brk_b``.

    Reference: functions.py:144-145 (``replace(".","_").lower()``).
    """
    return F.lower(F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\.", "_"))


def make_ticker_yfinance_compatible(col: Column | str) -> Column:
    """X2 — ``BRK.B``/``brk_b`` → ``BRK-B``.

    Reference: functions.py:148-149 (``re.sub(r"[._]","-")``).
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"[._]", "-")


def convert_shares_outstanding(col: Column | str) -> Column:
    """X3 — parse scraped magnitude strings: ``"123.45 M"`` → 123450000.

    Strips commas/whitespace from the numeric part, multiplies by 1e6
    (M) or 1e9 (B), errors on any other suffix — mirroring the
    ``raise`` in the reference. Reference: sectors.py:122-132.
    """
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, MAGNITUDE_PATTERN, 1)
    sfx = F.upper(F.regexp_extract(c, MAGNITUDE_PATTERN, 2))
    value = F.regexp_replace(num, r"[,\s]", "").cast("double")
    return (
        F.when(sfx == "M", value * F.lit(1_000_000.0))
        .when(sfx == "B", value * F.lit(1_000_000_000.0))
        .otherwise(F.raise_error(F.concat(F.lit("shares outstanding magnitude not M/B: "), c)))
        .cast("long")
    )


def date_to_string(col: Column | str) -> Column:
    """X5 — ``strftime('%Y-%m-%d')``. Reference: load_yfinance_data.py:39-42."""
    return F.date_format(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd")


def parse_date(col: Column | str) -> Column:
    """X7 — string → date. Reference: functions.py:85."""
    return F.to_date(F.col(col) if isinstance(col, str) else col, "yyyy-MM-dd")


def business_day_adjust(col: Column | str) -> Column:
    """X8 — map a date to the last *completed* weekday:
    Sat→−1, Sun→−2, Mon→−3 (all land on Friday), Tue–Fri→−1.

    NB: intentionally ignores market holidays, exactly like the
    reference (X9 gates on the NYSE calendar separately).
    Reference: functions.py:107-117 (``get_todays_date``).
    """
    c = F.col(col) if isinstance(col, str) else col
    dow = F.dayofweek(c)  # Spark: 1=Sunday … 7=Saturday
    delta = (
        F.when(dow == 7, 1)  # Saturday → Friday
        .when(dow == 1, 2)  # Sunday → Friday
        .when(dow == 2, 3)  # Monday → previous Friday
        .otherwise(1)  # Tue–Fri → previous day
    )
    return F.date_sub(c, delta)


def weight_normalize(col: Column | str) -> Column:
    """X11 — percent → fraction. Reference: sector.py:165."""
    return (F.col(col) if isinstance(col, str) else col) / F.lit(100.0)


def dollar_volume(open_col: Column, close_col: Column, volume_col: Column) -> Column:
    """X12 — ``(close+open)/2 * volume``.

    The reference computes this with a row-wise ``df.apply`` lambda
    (load_yfinance_data.py:147-152) — its only UDF-shaped surface. In
    Spark it is a plain column expression: stays in codegen, no UDF.
    """
    return (close_col + open_col) / F.lit(2.0) * volume_col


def intraday_change_pct(open_col: Column, close_col: Column) -> Column:
    """W3 — on-peak percent change ``(close-open)/open*100``.
    Reference: load_yfinance_data.py:160-164."""
    return (close_col - open_col) / open_col * F.lit(100.0)
