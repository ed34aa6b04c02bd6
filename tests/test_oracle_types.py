"""Registry-wide oracle output-type allow-list.

The r04 driver window failed 8 queries whose DuckDB oracles emitted
HUGEINT output columns (an un-CAST integer SUM): the driver's
pandas/Arrow result export renders int128-backed values as
float64/decimal128 and the value hash diverges from Spark's BIGINT
even though the values are equal. The local ``fetchall()`` mirror was
structurally blind to it. This test DESCRIBEs EVERY declared oracle
and rejects any output column whose DuckDB type is outside the
driver-proven-safe set, so the class cannot be reintroduced.
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest

from stock_data_pipeline_spark.oracle import (
    _type_class,
    duck_type_allowed,
    oracle_output_types,
    register_duckdb_views,
)
from stock_data_pipeline_spark.queries import REGISTRY

# Registry-wide sweep (399 tests): slow tier (r10 — see pytest.ini).
pytestmark = pytest.mark.slow

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    register_duckdb_views(con, SF)
    return con


def test_allow_list_boundaries():
    assert duck_type_allowed("BIGINT")
    assert duck_type_allowed("DOUBLE")
    assert duck_type_allowed("VARCHAR")
    assert duck_type_allowed("BOOLEAN")
    assert duck_type_allowed("DATE")
    assert duck_type_allowed("TIMESTAMP")
    assert duck_type_allowed("TIMESTAMP_NS")
    assert duck_type_allowed("DECIMAL(18,2)")
    # int128-backed types: the r04 failure class
    assert not duck_type_allowed("HUGEINT")
    assert not duck_type_allowed("UHUGEINT")
    assert not duck_type_allowed("DECIMAL(38,0)")
    assert not duck_type_allowed("DECIMAL(38,19)")
    assert not duck_type_allowed("DECIMAL(19,0)")


def test_type_class_distinguishes_driver_renderings():
    # int vs Decimal is exactly the Spark-BIGINT vs DuckDB-HUGEINT drift
    assert _type_class(3) != _type_class(decimal.Decimal("3"))
    assert _type_class(3) != _type_class(3.0)
    assert _type_class(True) != _type_class(1)
    assert _type_class(datetime.date(2020, 1, 1)) != _type_class(
        datetime.datetime(2020, 1, 1)
    )


@pytest.mark.parametrize(
    "name", sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
)
def test_oracle_output_types_allowed(duck, name):
    offending = [
        (col, typ)
        for col, typ in oracle_output_types(duck, REGISTRY[name].oracle)
        if not duck_type_allowed(typ)
    ]
    assert not offending, (
        f"{name}: oracle output columns {offending} are outside the "
        "driver-proven-safe type set — CAST integer SUMs to BIGINT, or "
        "emit >int64 exact values as VARCHAR digit strings (see "
        "VERDICT.md r04, HUGEINT class)"
    )
