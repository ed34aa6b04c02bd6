"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster where it
translates (AQE, adaptive coalescing/skew-join, Arrow transfers); the
shuffle-partition count is sized to cores locally but on a 1000-executor
cluster would be left to AQE's coalescing with a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "stock_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` (driver contract) overrides core count.
    ``extra_confs``: creation-time confs that cannot be set at runtime
    (e.g. ``spark.ui.retainedStages`` for the bench's CPU-time
    accounting) — ignored if a session already exists in-process.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # SCALE.md §14 / SKEW_r08.json: plans that aggregate ON the join
        # key (q90 shape) reuse the join's hash distribution, the planner
        # elides the exchange between join and agg, and OptimizeSkewedJoin
        # REVERTS rather than break that reuse — so without force the
        # designed skew mitigation silently never fires on exactly the
        # plans that reuse partitioning hardest. Force trades one extra
        # exchange for the split, and only acts at all once AQE has
        # already judged a partition skewed (factor x median AND above
        # the byte threshold) — at that point a straggler owning a
        # zipf-head key costs far more than the exchange. No-op on
        # non-skewed runs and below-threshold local tests.
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs the engine relies on to a session we
    did not create (the driver hands us one in ``__spark_entry__``).

    - ``nanosAsLong``: lets the parquet reader accept an events fixture
      generated with TIMESTAMP(NANOS) (unit varies by generation —
      harmless for MICROS fixtures; see ``catalog.load_events``).
    - UTC session timezone: keeps ``date_format`` / LTZ casts stable and
      comparable with DuckDB's naive timestamps.
    - ``forceOptimizeSkewedJoin``: the SKEW_r08 mitigation (see the
      factory's comment) is runtime-settable and must hold on DRIVER
      sessions too — the q90-shape distribution-reuse trap does not
      care who built the session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    return spark
