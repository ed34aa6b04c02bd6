"""UPDATE-where-NULL merge — SURVEY.md §2 J1/F5.

The reference's flagship UPDATE fills ``{sector}_calculated_price`` only
where it IS NULL (sector.py:87-110, the ``WHERE ... IS NULL`` guard at
sector.py:98). In Spark that in-place UPDATE becomes a pure
coalesce-merge producing a new table — order-independent and retryable,
which is exactly what an idempotent 100 TB backfill wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    existing: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE-style upsert on plain DataFrames: rows in ``updates``
    replace matching-key rows in ``existing``; unmatched update rows are
    inserted (the reference's ``to_sql(if_exists='replace')`` +
    re-append dance — sector.py:138-145 — done without dropping the
    table). Emulates Delta's ``MERGE WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT`` as anti-join + union: one shuffle on the key,
    retry-safe (re-running the same updates is a no-op).
    """
    kept = existing.join(updates.select(*keys), on=keys, how="left_anti")
    return kept.unionByName(updates)


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC changelog to a snapshot (Delta's ``APPLY CHANGES`` /
    Debezium-consumer semantics on plain DataFrames).

    ``changes`` carries full row images plus ``op_col`` ('U'/'I' upsert,
    'D' delete) and ``seq_cols`` (change order — e.g. commit timestamp +
    LSN). Per key only the LATEST change (max seq) wins: stale updates
    arriving late are ignored, an out-of-order delete-then-update
    resolves to the update. Deletes remove the key; upserts replace the
    base row or insert a new one.

    One shuffle on the key serves the latest-change window AND both
    joins; re-applying the same changelog is a no-op (idempotent
    backfill). At 100 TB the snapshot side stays partitioned/bucketed by
    key and only touched keys rewrite — pair with
    ``io.overwrite_partitions`` for the physical layout.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in seq_cols])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    kept = base.join(latest.select(*keys), on=keys, how="left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*base.columns)
    return kept.unionByName(upserts)


def coalesce_merge(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    fill_cols: list[str],
) -> DataFrame:
    """Left-join ``updates`` onto ``target`` by ``keys``; for each column
    in ``fill_cols`` keep the target's value when present, else take the
    update's (i.e. only NULL targets are written — Delta's
    ``WHEN MATCHED AND target.c IS NULL THEN UPDATE`` emulated on plain
    DataFrames).

    Scale: if ``updates`` is the small side (a daily delta vs years of
    history) Catalyst broadcast-joins it; both sides keyed on the same
    columns means no extra shuffle when the target is bucketed by key.
    """
    upd = updates.select(
        *keys, *[F.col(c).alias(f"__upd_{c}") for c in fill_cols]
    )
    out = target.join(upd, on=keys, how="left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__upd_{c}"))).drop(
            f"__upd_{c}"
        )
    return out
