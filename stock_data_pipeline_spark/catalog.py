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


# Explicit schemas for the shared test tables. Schema-on-read matters
# twice: (a) ``spark.read.parquet`` without a schema runs a footer-read
# Spark job at PLAN time — one cluster round-trip per table per query
# before any real work; (b) at 100 TB the catalog, not the files, should
# own the contract (a stray file with a drifted schema fails loudly at
# scan, not silently at merge). ``events.ts`` is declared LONG because
# the file stores TIMESTAMP(NANOS), which the vectorized reader only
# accepts via the nanosAsLong conf (see load_events).
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampNTZType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one shared test table with its catalog schema (no footer
    probe — plan construction stays action-free). ``events`` needs
    special handling (TIMESTAMP(NANOS) parquet type — see
    :func:`load_events`)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture: parquet stores ``ts`` as INT64 TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects. Read nanos as long
    (legacy conf) and convert with *integer* division — ``ts div 1000``
    — so the ns→µs truncation matches DuckDB's read of the same file.
    (Float division would lose precision: epoch-nanos needs 61 bits,
    double mantissa has 53.)
    """
    raw = load_events_raw(spark, sf_dir)
    return raw.withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
    )


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` left as raw int64 nanoseconds — for queries
    that do exact integer µs arithmetic (``ts div 1000``) instead of
    timestamp semantics."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.schema(TABLE_SCHEMAS["events"]).parquet(f"{sf_dir}/events.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in ALL_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every shared table as a temp view for the SQL API."""
    for name in ALL_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
