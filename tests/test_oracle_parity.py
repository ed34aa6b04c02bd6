"""The local mirror of the driver's correctness gate: every registered
query with an oracle must hash-match DuckDB at sf0.001 (fast; the
driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from stock_data_pipeline_spark.oracle import compare_query, register_duckdb_views
from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_duckdb_views(con, SF)
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    result = compare_query(spark, duck, name, SF)
    if REGISTRY[name].oracle is None:
        assert result["status"] == "rows_only"
        assert result["spark_rows"] >= 0
    else:
        assert result["status"] == "MATCH", result
