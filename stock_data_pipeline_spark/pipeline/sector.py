"""Flagship analytical query — calculated sector price (SURVEY.md §2 J1,
§3 EP3).

Reference semantics (sector.py:87-110): per sector per date,

    calc_price = Σ_ticker( price_ticker × shares_ticker ) / shares_outstanding

executed there as a PostgreSQL ``UPDATE … FROM … JOIN`` that fills only
rows where the calculated price IS NULL (sector.py:98). Here it is one
lazy DataFrame DAG over the long canonical tables:

    prices ⋈ shares on (date, ticker)        [the only big-big shuffle]
      → groupBy(date, sector): Σ close×shares  [partial agg map-side]
      → ⋈ shares_outstanding on (date, sector) [small dim → broadcast]
      → mcap / shares_outstanding

Scale notes: the prices⋈shares join keys both sides on (date, ticker) —
bucketing both tables by ticker (or date-partitioning) makes it
co-located at 100 TB. ``shares_outstanding`` is ~sectors×days rows
(tiny) and is broadcast explicitly. The UPDATE-where-NULL refresh
semantics are provided by composing with
``operators.merge.coalesce_merge`` — order-independent and idempotent,
unlike the in-place UPDATE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calculate_sector_price(
    prices: DataFrame,
    shares: DataFrame,
    shares_outstanding: DataFrame,
    price_col: str = "close",
) -> DataFrame:
    """Return ``(date, sector, calc_price)``.

    ``prices``: (date, ticker, …, close, …) long table.
    ``shares``: (date, sector, ticker, shares_held).
    ``shares_outstanding``: (date, sector, shares_outstanding).

    NULL semantics match the reference: a (date, sector) with no price
    rows or no outstanding row simply doesn't appear (inner joins) —
    the reference leaves those NULL and fills them on a later run;
    compose with ``coalesce_merge`` for that refresh behavior.
    """
    mcap = (
        prices.select("date", "ticker", price_col)
        .join(shares.select("date", "sector", "ticker", "shares_held"), ["date", "ticker"])
        .groupBy("date", "sector")
        .agg(F.sum(F.col(price_col) * F.col("shares_held")).alias("market_cap"))
    )
    return (
        mcap.join(F.broadcast(shares_outstanding), ["date", "sector"])
        .withColumn(
            "calc_price", F.col("market_cap") / F.col("shares_outstanding")
        )
        .select("date", "sector", "calc_price")
    )


def calculate_sector_price_strict(
    prices: DataFrame,
    shares: DataFrame,
    shares_outstanding: DataFrame,
    membership: DataFrame,
    price_col: str = "close",
) -> DataFrame:
    """SQL-faithful variant: the reference's UPDATE builds a literal
    ``p1*s1 + p2*s2 + …`` expression over the *current* constituent list
    (sector.py:88-95), so one NULL price or share NULLs the whole date
    (SQL ``+`` propagates NULL). This matters for golden-file replay
    against the reference's committed CSVs.

    ``membership``: (date, sector, ticker) — the constituents expected
    per date. Groups where any member's price or shares is missing/NULL
    produce calc_price = NULL (but the row is kept, like the UPDATE
    leaves the row with a NULL column).
    """
    joined = (
        membership.join(prices.select("date", "ticker", price_col), ["date", "ticker"], "left")
        .join(shares.select("date", "sector", "ticker", "shares_held"), ["date", "sector", "ticker"], "left")
    )
    per_date = joined.groupBy("date", "sector").agg(
        F.count("*").alias("n_members"),
        F.count(F.col(price_col) * F.col("shares_held")).alias("n_present"),
        F.sum(F.col(price_col) * F.col("shares_held")).alias("market_cap"),
    )
    return (
        per_date.join(F.broadcast(shares_outstanding), ["date", "sector"])
        .withColumn(
            "calc_price",
            F.when(
                F.col("n_members") == F.col("n_present"),
                F.col("market_cap") / F.col("shares_outstanding"),
            ),  # else NULL — mirrors SQL NULL propagation
        )
        .select("date", "sector", "calc_price")
    )
