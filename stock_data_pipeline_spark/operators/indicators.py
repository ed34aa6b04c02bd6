"""Technical-indicator operators: VWAP, EMA, drawdown, Bollinger bands,
RSI.

Domain extension of the reference's window family — it charts 5/10/20/50
day sector trends (reference ``sectors.py:167-204``, tail-N slices at
``sectors.py:176-177``) and computes a weighted sector price
(``sector.py:87-110``); these are the standard next indicators a stock
pipeline adds, expressed Spark-first.

Oracle discipline (matches queries.py): anything *summed* runs in exact
integer cents (2-dp money → BIGINT) so partial aggregation is
order-independent under any partitioning; only the final closed-form
expression runs in floating point, on identical operands in both
engines. The EMA is inherently sequential, so it runs as a per-row
left fold in frame order with exactly-representable coefficients —
both engines execute the identical IEEE op sequence, giving
bit-identical doubles with no rounding fudge.

Scale notes: every operator here is a window over ``partition_cols`` —
one hash shuffle on the series key, then all arithmetic is
narrow/per-row (whole-stage codegen, no Python). The one exception is
the EMA recurrence, which has TWO physical strategies behind one
dispatcher (:func:`ema`):

- ``ema_fold`` — cumulative ``collect_list`` + ``F.aggregate`` left
  fold, all JVM-side, zero Python. O(n²) work/memory per key (each row
  re-folds its prefix): unbeatable for short bounded series (daily
  stock data: 250 rows/yr) because it never leaves codegen, fatal for
  hot keys at scale.
- ``ema_linear`` — ``applyInPandas`` per-key O(n) scan replaying the
  IDENTICAL IEEE op sequence (αx + (1−α)acc in double), so the two
  paths are bit-equal (asserted in tests/test_batch6_indicators.py)
  and either satisfies the same recursive-CTE oracle. One Arrow
  round-trip; memory is one key's series per task.

The dispatcher defaults to the scale-safe linear path and picks the
fold only when the caller asserts a small per-key bound
(``expected_rows_per_key <= FOLD_MAX_ROWS_PER_KEY``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Above this per-key series length the O(n²) collect_list fold loses
#: to the O(n) Arrow path (and its last-row array holds the whole
#: series, so memory is O(n²) per key too). 4096² ≈ 17M folded
#: elements ≈ the break-even measured on local[32].
FOLD_MAX_ROWS_PER_KEY = 4096


def _cents(col) -> Column:
    """2-dp money double → exact integer cents (see queries._dec)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,2)") * 100).cast("long")


def _cents_dec(col) -> Column:
    """Exact cents as DECIMAL(18,0) — for sums whose operand count grows
    with data size (group aggregates, unbounded frames): products stay
    exact in decimal(37,0) and sums widen to decimal(38,0), where BIGINT
    cents² would overflow (ANSI throw) around sf1. Frame-bounded sums
    (n-row windows) keep the cheaper int64 path."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,2)") * 100).cast("decimal(18,0)")


def _d(c: Column) -> Column:
    return c.cast("double")


def vwap(
    df: DataFrame,
    group_cols: list[str | Column],
    price_col: str,
    qty_col: str,
) -> DataFrame:
    """Volume-weighted average price per group: Σ(p·q)/Σ(q).

    Both moment sums are exact integer cents in DECIMAL(38,0)
    accumulators (group size is unbounded, so int64 cents×cents would
    overflow at scale), map-side partial aggregation safe at any
    parallelism; one shuffle on the group key, division happens once per
    group in double.
    """
    pc, qc = _cents_dec(price_col), _cents_dec(qty_col)
    agg = df.groupBy(*group_cols).agg(
        F.sum(pc * qc).alias("_spv"),
        F.sum(qc).alias("_sv"),
    )
    return (
        agg.withColumn("vwap", _d(F.col("_spv")) / _d(F.col("_sv")) / F.lit(100.0))
        .withColumn("total_qty", _d(F.col("_sv")) / F.lit(100.0))
        .drop("_spv", "_sv")
    )


def ema(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
    alpha: float = 0.25,
    out_col: str = "ema",
    expected_rows_per_key: int | None = None,
) -> DataFrame:
    """Exponential moving average: ema₀ = p₀; emaₜ = α·pₜ + (1−α)·emaₜ₋₁.

    Dispatcher over two bit-equal physical strategies (module
    docstring): the scale-safe O(n)-per-key :func:`ema_linear` by
    default, or the all-JVM :func:`ema_fold` when the caller asserts
    the per-key series length stays ≤ ``FOLD_MAX_ROWS_PER_KEY`` (the
    guard is a *caller assertion*, not a runtime probe — probing would
    launch a job at plan-construction time, which the plan-hygiene
    contract forbids).

    ``alpha`` should be exactly representable in binary (0.25, 0.5,
    0.125…) when bit-exact cross-engine parity is required; the
    recurrence is then an identical IEEE op sequence in every engine
    that folds in frame order — both strategies here, and the
    recursive-CTE oracle.
    """
    if (
        expected_rows_per_key is not None
        and expected_rows_per_key <= FOLD_MAX_ROWS_PER_KEY
    ):
        return ema_fold(df, partition_cols, order_cols, price_col, alpha, out_col)
    return ema_linear(df, partition_cols, order_cols, price_col, alpha, out_col)


def ema_fold(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
    alpha: float = 0.25,
    out_col: str = "ema",
) -> DataFrame:
    """Short-series EMA strategy: cumulative ``collect_list`` window +
    ``F.aggregate`` left fold, entirely JVM-side (no Python, no Arrow).

    O(n²) work and memory per key — each row's array holds its whole
    prefix — so this is ONLY for series bounded by
    ``FOLD_MAX_ROWS_PER_KEY``; the dispatcher enforces that policy.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list(_d(F.col(price_col))).over(w)
    df = df.withColumn("_parr", arr)
    rest = F.filter(F.col("_parr"), lambda x, i: i > 0)  # PySpark 4: 2-arg lambda = (elem, idx)
    fold = F.aggregate(
        rest,
        F.element_at(F.col("_parr"), 1),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return df.withColumn(out_col, fold).drop("_parr")


def ema_linear(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
    alpha: float = 0.25,
    out_col: str = "ema",
) -> DataFrame:
    """Production EMA strategy: ONE ``mapInPandas`` pass over
    key-partitioned, key-sorted data.

    Physical shape: ``repartition(keys)`` + ``sortWithinPartitions(keys,
    order)`` — the same single exchange the fold needs — then each Arrow
    batch is processed by pandas' GROUPED ewm C kernel (one cython scan
    across all groups in the batch, not a Python call per group). The
    earlier ``applyInPandas`` formulation paid ~0.5-1 ms of Python
    per GROUP (15k customer keys at sf0.1 → ~10 s of pure dispatch);
    this path is one Python call per ~10k-row Arrow batch.

    Bit-exactness: for an ``alpha`` whose (alpha, 1−alpha) pair is
    exactly representable (0.25, 0.5, …), pandas ``ewm(adjust=False,
    ignore_na=True)`` evaluates ``(1−α)·acc + α·x`` then divides by the
    exact 1.0 — the identical IEEE product/sum (addition commutes
    bitwise) as the JVM fold and the recursive-CTE oracle, so all three
    stay bit-identical (asserted in tests). NaN inputs neither update
    nor seed the statistic — the fold's NULL semantics.

    A key spanning an Arrow batch boundary (or several) is continued by
    carrying the accumulator: the next batch's leading segment of the
    same key re-runs ewm SEEDED with the carried value (prepend + drop,
    exact continuation). Memory is one Arrow batch per task — not even
    one full key's series — so a 10⁸-row hot key streams through in
    bounded memory; only its sort spills, which Spark handles.
    """
    keys = list(partition_cols)
    sort_cols = list(order_cols)
    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = f"{fields}, {out_col} double"
    out_fields = [f.name for f in df.schema.fields] + [out_col]
    # cast Spark-side so decimal→double happens with the same rounding
    # the fold's _d() uses (the pandas frame then carries exact doubles)
    with_pd = (
        df.withColumn("_pd", _d(F.col(price_col)))
        .repartition(*keys)
        .sortWithinPartitions(*keys, *sort_cols)
    )

    def per_partition(pdfs):
        carry_key: tuple | None = None
        carry_acc = float("nan")
        for pdf in pdfs:
            if pdf.empty:
                continue
            g = pdf.groupby(keys, sort=False, dropna=False)["_pd"]
            ema = (
                g.ewm(alpha=alpha, adjust=False, ignore_na=True)
                .mean()
                .droplevel(list(range(len(keys))))
                .reindex(pdf.index)
            )
            first_key = tuple(pdf.iloc[0][k] for k in keys)
            if carry_key is not None and first_key == carry_key and not pd.isna(carry_acc):
                # exact continuation: re-run the leading same-key segment
                # seeded with the carried accumulator (prepend + drop)
                is_first = pd.Series(True, index=pdf.index)
                for k, v in zip(keys, first_key):
                    is_first &= pdf[k] == v
                seg = pdf.loc[is_first, "_pd"]
                seeded = pd.concat(
                    [pd.Series([carry_acc], dtype="float64"), seg], ignore_index=True
                )
                cont = (
                    seeded.ewm(alpha=alpha, adjust=False, ignore_na=True)
                    .mean()
                    .iloc[1:]
                )
                cont.index = seg.index
                ema.loc[seg.index] = cont
            last_key = tuple(pdf.iloc[-1][k] for k in keys)
            last_val = ema.iloc[-1]
            carry_key, carry_acc = last_key, (
                float(last_val) if not pd.isna(last_val) else float("nan")
            )
            pdf[out_col] = ema.astype("float64")
            yield pdf[out_fields]

    return with_pd.mapInPandas(per_partition, schema=schema)


def drawdown(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
) -> DataFrame:
    """Running peak and drawdown-from-peak fraction (≤ 0).

    ``max`` over a cumulative frame is exact on any dtype, and the
    final ``(p − peak)/peak`` divides identical doubles — no rounding
    needed for cross-engine parity.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = _d(F.col(price_col))
    peak = F.max(p).over(w)
    return df.withColumn("peak", peak).withColumn(
        "drawdown_pct", (p - F.col("peak")) / F.col("peak")
    )


def bollinger(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
    n: int = 20,
) -> DataFrame:
    """Bollinger bands over a trailing n-row frame: mid = mean, bands =
    mid ± 2·sample-stddev. NULL until the frame holds ≥ 2 rows (sample
    variance undefined), mirroring pandas ``rolling(n, min_periods=2)``.

    The window sums run in exact integer cents with decimal
    accumulators for the squared term (order-independent, and immune to
    int64 overflow even for large ``n`` or extreme prices); variance
    uses the closed form n·Σx² − (Σx)² evaluated in double on those
    exact operands — identical sequence in any engine, so no rounding
    is applied (same technique as queries.q57).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    xd = _cents_dec(price_col)
    cnt = _d(F.count(F.col(price_col)).over(w))
    sx = _d(F.sum(xd).over(w))
    sxx = _d(F.sum(xd * xd).over(w))
    mid = sx / cnt / F.lit(100.0)
    var = F.when(
        cnt >= 2, (cnt * sxx - sx * sx) / (cnt * (cnt - F.lit(1.0))) / F.lit(10000.0)
    )
    band = F.lit(2.0) * F.sqrt(var)
    return (
        df.withColumn("bb_mid", mid)
        .withColumn("bb_upper", mid + band)
        .withColumn("bb_lower", mid - band)
    )


def rsi(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
    n: int = 14,
) -> DataFrame:
    """Relative Strength Index (Cutler's simple-average form) over a
    trailing n-row frame: RSI = 100 − 100/(1 + Σgain/Σloss), with
    RSI = 100 when the window has moves but zero losses, NULL until a
    prior row exists. Gains/losses are exact cent deltas; only the
    final ratio runs in double.
    """
    wo = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    wf = wo.rowsBetween(-(n - 1), Window.currentRow)
    xc = _cents(price_col)
    diff = xc - F.lag(xc).over(wo)
    zero = F.lit(0).cast("long")
    gain = F.when(diff.isNotNull(), F.greatest(diff, zero))
    loss = F.when(diff.isNotNull(), F.greatest(zero - diff, zero))
    sg = F.sum(gain).over(wf)
    sl = F.sum(loss).over(wf)
    out = F.when(sl == 0, F.lit(100.0)).otherwise(
        F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + _d(sg) / _d(sl))
    )
    return df.withColumn("rsi", out)


def holt_linear(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    price_col: str,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing (α=β=0.5):

        l₁ = y₁, b₁ = 0
        lₜ = 0.5·yₜ + 0.5·(lₜ₋₁ + bₜ₋₁)
        bₜ = 0.5·(lₜ − lₜ₋₁) + 0.5·bₜ₋₁

    Appends ``level``, ``trend``, ``forecast`` (= level + trend, the
    one-step-ahead prediction). The EMA-family recurrence with a second
    coupled accumulator — no pandas C kernel exists for it, so the
    per-key scan is a numpy loop inside ONE ``mapInPandas`` pass over
    key-partitioned, key-sorted Arrow batches (same physical shape as
    :func:`ema_linear`: one exchange, batches stream, state carried
    across batch boundaries per key). Still O(n) per key with ~µs/row
    Python cost; a production deployment would drop the loop into a
    compiled kernel, but the plan shape — and the bit-exact IEEE
    sequence, since 0.5 is exactly representable and the op order
    matches the recursive-CTE oracle — would not change.
    """
    keys = list(partition_cols)
    sort_cols = list(order_cols)
    fields = ", ".join(f.name + " " + f.dataType.simpleString() for f in df.schema.fields)
    schema = f"{fields}, level double, trend double, forecast double"
    out_fields = [f.name for f in df.schema.fields] + ["level", "trend", "forecast"]
    with_pd = (
        df.withColumn("_pd", _d(F.col(price_col)))
        .repartition(*keys)
        .sortWithinPartitions(*keys, *sort_cols)
    )

    def per_partition(pdfs):
        carry_key: tuple | None = None
        carry_l = carry_b = float("nan")
        for pdf in pdfs:
            if pdf.empty:
                continue
            ys = pdf["_pd"].to_numpy()
            key_rows = list(zip(*(pdf[k].to_numpy() for k in keys)))
            levels = [0.0] * len(ys)
            trends = [0.0] * len(ys)
            prev_key, l, b = carry_key, carry_l, carry_b
            for i, (ky, y) in enumerate(zip(key_rows, ys)):
                y = float(y)
                if ky != prev_key:
                    l, b = y, 0.0
                    prev_key = ky
                else:
                    l_new = 0.5 * y + 0.5 * (l + b)
                    b = 0.5 * (l_new - l) + 0.5 * b
                    l = l_new
                levels[i] = l
                trends[i] = b
            carry_key, carry_l, carry_b = prev_key, l, b
            pdf["level"] = levels
            pdf["trend"] = trends
            pdf["forecast"] = [lv + tr for lv, tr in zip(levels, trends)]
            yield pdf[out_fields]

    return with_pd.mapInPandas(per_partition, schema=schema)
