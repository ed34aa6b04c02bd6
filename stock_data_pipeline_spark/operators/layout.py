"""Data-layout operators: Z-order (Morton) clustering and zone-map
pruning estimation.

At 100 TB the dominant cost is the scan, and the dominant scan
optimization is SKIPPING: files carry min/max statistics per column
(parquet row-group stats, Delta/Iceberg zone maps) and a predicate
prunes every file whose range doesn't intersect. A single sort order
only prunes on its leading column; interleaving the bits of two
columns (Z-order / Morton order) gives every file a tight range in
BOTH dimensions, so 2-D predicates prune well on either or both.

These operators compute the layout and MEASURE its pruning power
declaratively — pure integer bit arithmetic (exactly reproducible in
any ANSI engine), one aggregate for the dimension ranges (broadcast),
one pass to assign file ids, one aggregate for the zone maps. No data
is rewritten; the operator emits the assignment a writer would use
with ``df.repartitionByRange/partitionBy`` + ``sortWithinPartitions``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the Morton code (16+16 → 32-bit z-value)
ZBITS = 16


def norm16(col: Column, vmin: Column, vmax: Column) -> Column:
    """((v − min)·65535) div (max − min) as exact BIGINT arithmetic.
    Implemented as (a − a mod b)/b so the division is exact (the
    numerator is a multiple of b) — no floating-point rounding to
    reconcile across engines."""
    span = F.greatest(vmax - vmin, F.lit(1).cast("long"))
    scaled = (col.cast("long") - vmin) * F.lit((1 << ZBITS) - 1).cast("long")
    return ((scaled - F.pmod(scaled, span)) / span).cast("long")


def morton2(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of x (even positions) and y (odd
    positions) into a 32-bit Morton code: Σᵢ bitᵢ(x)·4ⁱ + 2·bitᵢ(y)·4ⁱ.
    Statically unrolled to 32 shift-mask-shift terms — exact integer
    adds (order-free), whole-stage-codegen'd, identical closed form in
    any SQL engine."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def zorder_assignment(
    df: DataFrame,
    col_x: str,
    col_y: str,
    n_files: int = 256,
) -> DataFrame:
    """Assign each row a Z-order file id: normalize both dimensions to
    16 bits over their observed [min, max] (one broadcast aggregate),
    interleave into a Morton code, and take the top log2(n_files) bits
    — equal-width buckets along the space-filling curve.

    Returns the input plus ``zval`` and ``file_id``. The range
    aggregate is one row (broadcast); the assignment is a narrow
    projection — no shuffle at all until a writer repartitions by
    ``file_id``."""
    assert n_files & (n_files - 1) == 0, "n_files must be a power of two"
    shift = 2 * ZBITS - n_files.bit_length() + 1  # 32 - log2(n_files)
    rng = df.agg(
        F.min(F.col(col_x).cast("long")).alias("_xmin"),
        F.max(F.col(col_x).cast("long")).alias("_xmax"),
        F.min(F.col(col_y).cast("long")).alias("_ymin"),
        F.max(F.col(col_y).cast("long")).alias("_ymax"),
    )
    out = df.crossJoin(F.broadcast(rng))
    zx = norm16(F.col(col_x), F.col("_xmin"), F.col("_xmax"))
    zy = norm16(F.col(col_y), F.col("_ymin"), F.col("_ymax"))
    z = morton2(zx, zy)
    return (
        out.withColumn("zval", z)
        .withColumn("file_id", F.shiftright(F.col("zval"), shift).cast("long"))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def zone_maps(
    assigned: DataFrame, file_col: str, stat_cols: list[str]
) -> DataFrame:
    """Per-file min/max statistics for ``stat_cols`` plus the row count
    — the skipping index a lakehouse writer would persist. One
    map-side-combinable aggregate on the file id."""
    aggs = [F.count("*").alias("n_rows")]
    for c in stat_cols:
        aggs.append(F.min(F.col(c).cast("long")).alias(f"{c}_lo"))
        aggs.append(F.max(F.col(c).cast("long")).alias(f"{c}_hi"))
    return assigned.groupBy(F.col(file_col)).agg(*aggs)


def with_hilbert(df: DataFrame, x_col: str, y_col: str, out_col: str = "hval") -> DataFrame:
    """Hilbert-curve index of 16-bit (x, y) — the locality-preserving
    alternative to :func:`morton2`: the Z-curve makes long diagonal
    jumps between quadrants, while the Hilbert curve visits adjacent
    cells consecutively, so equal-width file cuts along the curve get
    tighter 2-D zone maps (measured by q248).

    Statically unrolled form of the classic xy2d walk (16 levels): at
    each scale s the quadrant bits (rx, ry) contribute s²·((3rx)⊕ry)
    to the index and the frame reflects/swaps for the next level. Each
    level is ONE projection materializing the state (x, y, d) as named
    columns — without that, the when() chains would double the
    expression tree per level (2¹⁶ nodes by the last). Pure integer
    bit-ops, whole-stage codegen, no shuffle."""
    n1 = F.lit((1 << ZBITS) - 1).cast("long")
    passthrough = [c for c in df.columns]
    out = df.withColumn("_hx", F.col(x_col).cast("long")).withColumn(
        "_hy", F.col(y_col).cast("long")
    ).withColumn("_hd", F.lit(0).cast("long"))
    for lvl in range(ZBITS - 1, -1, -1):
        s2 = F.lit(1 << (2 * lvl)).cast("long")  # s*s
        cx, cy = F.col("_hx"), F.col("_hy")
        rx = F.shiftright(cx, lvl).bitwiseAND(F.lit(1))
        ry = F.shiftright(cy, lvl).bitwiseAND(F.lit(1))
        swap0 = (ry == 0) & (rx == 0)
        swap1 = (ry == 0) & (rx == 1)
        out = out.select(
            *passthrough,
            F.when(swap1, n1 - cy).when(swap0, cy).otherwise(cx).alias("_hx"),
            F.when(swap1, n1 - cx).when(swap0, cx).otherwise(cy).alias("_hy"),
            (F.col("_hd") + s2 * (rx * 3).bitwiseXOR(ry)).alias("_hd"),
        )
    return out.select(*passthrough, F.col("_hd").alias(out_col))
