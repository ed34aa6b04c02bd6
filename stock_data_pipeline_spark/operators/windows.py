"""Window / analytic operators — SURVEY.md §2 W1–W4.

All are single-shuffle plans: one exchange on the partition key, then
in-partition sorted evaluation. pandas NULL-edge semantics are
reproduced exactly (leading NULLs for an incomplete SMA window, NULL
lag at a series head).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _window(partition_by: list[str], order_by: list[Column | str]):
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def simple_moving_average(
    df: DataFrame,
    value: str,
    n: int,
    partition_by: list[str],
    order_by: list[Column | str],
    out_name: str | None = None,
    exact_sum_div: bool = False,
) -> DataFrame:
    """W1 — n-row simple moving average with pandas ``rolling(n).mean()``
    semantics: the first n−1 rows of each series are NULL (pandas emits
    NaN until the window fills — load_yfinance_data.py:143-145).

    ``exact_sum_div``: compute as sum(value)/n cast to double instead of
    ``avg`` — with a decimal-typed value this makes the windowed mean
    exact and engine-reproducible (only defined rows have a full window
    of n, so sum/n ≡ avg there).
    """
    out_name = out_name or f"sma_{n}"
    w = _window(partition_by, order_by)
    frame = w.rowsBetween(-(n - 1), 0)
    if exact_sum_div:
        mean = F.sum(F.col(value)).over(frame).cast("double") / F.lit(float(n))
    else:
        mean = F.avg(F.col(value)).over(frame)
    return df.withColumn(
        out_name,
        F.when(F.row_number().over(w) >= n, mean),  # else NULL — pandas NaN head
    )


def simple_moving_average_pandas(
    df: DataFrame,
    value: str,
    n: int,
    partition_by: list[str],
    order_by: list[str],
    out_name: str | None = None,
) -> DataFrame:
    """The Pandas-UDF escape hatch twin of :func:`simple_moving_average`
    — ``applyInPandas`` running literal ``pandas.rolling(n).mean()`` per
    group. Exists to document the slow-path discipline: use it ONLY when
    an operator genuinely can't be expressed with built-in window
    functions (this one can — the native version is the production
    path; Arrow batching makes this ~10× a native window, row-at-a-time
    UDFs would be ~100×)."""
    import pandas as pd

    out_name = out_name or f"sma_{n}"
    out_fields = df.schema.fields
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += f", {out_name} double"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by)
        pdf[out_name] = pdf[value].rolling(n).mean()
        return pdf

    return df.groupBy(*partition_by).applyInPandas(per_group, schema=schema)


def lag_pct_change(
    df: DataFrame,
    value: str,
    partition_by: list[str],
    order_by: list[Column | str],
    out_name: str = "gap_pct",
) -> DataFrame:
    """W2 — percent change vs the previous row:
    ``(v − lag(v)) / lag(v) × 100``; NULL on each series' first row.

    Reference: append_gap_up_off_peak, load_yfinance_data.py:154-158
    (the "off-peak" gap reads the previous day's *open* — same shape).
    """
    w = _window(partition_by, order_by)
    prev = F.lag(F.col(value), 1).over(w)
    return df.withColumn(out_name, (F.col(value) - prev) / prev * F.lit(100.0))


def pct_vs_first(
    df: DataFrame,
    value: str,
    partition_by: list[str],
    order_by: list[Column | str],
    out_name: str = "pct_vs_start",
) -> DataFrame:
    """W4/G4 — percent change vs the first row of the series window:
    ``(v − v₀) / v₀ × 100`` (the reference seeds v₀ with
    ``sector_prices[0]`` — sectors.py:176-181)."""
    w = _window(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    v0 = F.first(F.col(value)).over(w)
    return df.withColumn(out_name, (F.col(value) - v0) / v0 * F.lit(100.0))


def clamped_running_sum(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    delta_col: str,
    floor: int = 0,
    out_col: str = "balance",
    expected_rows_per_key: int | None = None,
) -> DataFrame:
    """Running sum clamped at a floor: balₜ = max(floor, balₜ₋₁ + Δₜ),
    starting from balance = floor (so bal₀ = max(floor, floor + Δ₀)) —
    inventory/credit-balance semantics where stock can't go negative.

    Although the clamp makes every row depend on the previous RESULT,
    the one-sided max HAS a window-expressible closed form: with
    b = bal − floor and S the plain prefix sum of Δ,

        bₜ = Sₜ − min(0, min_{j≤t} Sⱼ)

    (the running minimum "absorbs" every time the floor would have
    been crossed). So the production plan is two cumulative frames —
    SUM and MIN over the same (key, order) window, ONE exchange, all
    JVM, O(n) per key, no Python — strictly better than both the O(n²)
    fold and the Arrow scan at every scale. Exact int64 arithmetic, so
    it satisfies q147's recursive-CTE oracle bit-for-bit.

    :func:`clamped_running_sum_fold` (collect_list left fold) and
    :func:`clamped_running_sum_linear` (Arrow per-key scan) remain as
    independently-derived verification twins — all three are asserted
    equal in tests/test_windows.py; ``expected_rows_per_key`` is kept
    for API compatibility but no longer selects a strategy.
    """
    del expected_rows_per_key  # closed form wins at every key size
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.sum(F.col(delta_col).cast("long")).over(w)
    df = df.withColumn("_s", F.coalesce(s, F.lit(0).cast("long")))
    runmin = F.min(F.col("_s")).over(w)
    bal = (
        F.lit(floor).cast("long")
        + F.col("_s")
        - F.least(F.lit(0).cast("long"), runmin)
    )
    return df.withColumn(out_col, bal).drop("_s")


def clamped_running_sum_fold(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    delta_col: str,
    floor: int = 0,
    out_col: str = "balance",
) -> DataFrame:
    """Short-series strategy: cumulative ``collect_list`` +
    ``F.aggregate`` left fold, all JVM-side (zero Python). O(n²) work
    and memory per key — each row's array holds its whole prefix — so
    only for series the dispatcher's guard admits."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list(F.col(delta_col).cast("long")).over(w)
    fold = F.aggregate(
        arr,
        F.lit(floor).cast("long"),
        lambda acc, x: F.greatest(F.lit(floor).cast("long"), acc + x),
    )
    return df.withColumn(out_col, fold)


def clamped_running_sum_linear(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    delta_col: str,
    floor: int = 0,
    out_col: str = "balance",
) -> DataFrame:
    """Production strategy: ``applyInPandas`` per-key O(n) scan.

    One shuffle on the key (the same exchange the fold needs), one
    Arrow round-trip, then a linear integer fold per series — Python
    ints are unbounded so the arithmetic is exact like the JVM fold's
    BIGINT path (the result must still fit in long for the output
    column, as it must in the fold). NULL deltas mirror the fold's
    ``collect_list`` semantics: the balance passes through unchanged.
    Memory is one key's rows per task, O(n) not O(n²).
    """
    import pandas as pd

    sort_cols = list(order_cols)
    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = f"{fields}, {out_col} bigint"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols)
        out = []
        bal = floor
        for x in pdf[delta_col]:
            if not pd.isna(x):
                bal = max(floor, bal + int(x))
            out.append(bal)
        pdf[out_col] = pd.array(out, dtype="int64")
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(per_group, schema=schema)
