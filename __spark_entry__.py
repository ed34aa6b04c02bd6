"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``stock_data_pipeline_spark.queries`` — the registry
pairs every implemented operator from SURVEY.md §2 (and the LLM-pipeline
extensions) with a DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stock_data_pipeline_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J1 sector calculated price analog) on sf0.001."""
    return _q.q01_sector_calculated_price(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
