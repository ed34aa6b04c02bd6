"""Skew mitigation — salted joins.

At 100 TB a handful of hot keys (one ticker with 1000× the rows, one
viral document) turn a shuffle join into a single straggler task. AQE's
skew-join handles sort-merge cases (`spark.sql.adaptive.skewJoin` is on
in our session factory); explicit salting is the portable fallback and
the only option when the skew is in an aggregation key.

``salted_join``: split each hot left-side key into ``num_salts``
sub-keys deterministically; replicate the right side once per salt.
Correct for any 1:N equi-join (each left row still meets every matching
right row exactly once, in exactly one salt bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's keys salted ``num_salts`` ways.

    The salt is derived from a hash of the whole left row (not a random
    number — deterministic across retries, no RNG state), so each hot
    key's rows spread uniformly over ``num_salts`` sub-keys. The right
    side is exploded ×num_salts — use only when the right side is much
    smaller than the skew it removes (or feed the hot-key subset only;
    at that point prefer AQE for SMJ).

    Sizing: sub-keys land on shuffle partitions by hash, so with
    ``num_salts`` ≪ ``spark.sql.shuffle.partitions`` collisions can
    stack several salts on one reducer — pick ``num_salts`` at or above
    the partition count for full spread (replication cost of the small
    side scales with it). Note Spark broadcasts genuinely small right
    sides anyway (no shuffle, no skew) — salting only matters for
    big-big joins.

    ``how`` is restricted to left-preserving joins (inner / left /
    left_semi / left_anti): the right side is exploded once per salt, so
    a right- or full-outer join would emit each unmatched right row
    ``num_salts`` times. Salt the other side for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}, got {how!r}: "
            "the salted-replicated right side would duplicate unmatched right rows"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(num_salts)]))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def salted_group_count(df: DataFrame, key_cols: list[str], num_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for a skewed groupBy key: partial count per
    (key, salt) then final sum per key. Spark's hash aggregate already
    does map-side partial aggregation — this explicit form is for
    high-cardinality-payload aggs (collect_list-ish) where the partial
    combine doesn't shrink data and one hot key floods a reducer."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial").alias("count"))
