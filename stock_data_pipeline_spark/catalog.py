"""Table catalog: explicit schemas + loaders for the shared test tables
and for reference-shaped domain tables (FIXTURES.md).

Scans are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning; loaders never cache or
collect. At 100 TB these tables would be date-partitioned
(``partitionBy("date")``) so incremental loads prune to new partitions —
the loaders take directories, not files, so that layout drops in
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXT_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXT_TABLES

# Reference-shaped canonical long tables (SURVEY.md §1.1 inverted to
# long layout; money is DECIMAL(10,2) to mirror NUMERIC(10, 2) at
# /root/reference/stock_data_pipeline/definitions.py:13).
PRICES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("ticker", T.StringType(), False),
        T.StructField("open", T.DecimalType(10, 2), True),
        T.StructField("high", T.DecimalType(10, 2), True),
        T.StructField("low", T.DecimalType(10, 2), True),
        T.StructField("close", T.DecimalType(10, 2), True),
        T.StructField("volume", T.LongType(), True),
    ]
)
SHARES_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("sector", T.StringType(), False),
        T.StructField("ticker", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("shares_held", T.LongType(), True),
    ]
)
SHARES_OUTSTANDING_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("sector", T.StringType(), False),
        T.StructField("shares_outstanding", T.LongType(), True),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one shared test table. ``events`` needs special handling
    (TIMESTAMP(NANOS) parquet type — see :func:`load_events`)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture: parquet stores ``ts`` as INT64 TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects. Read nanos as long
    (legacy conf) and convert with *integer* division — ``ts div 1000``
    — so the ns→µs truncation matches DuckDB's read of the same file.
    (Float division would lose precision: epoch-nanos needs 61 bits,
    double mantissa has 53.)
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    return raw


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every shared table as a temp view for the SQL API."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
