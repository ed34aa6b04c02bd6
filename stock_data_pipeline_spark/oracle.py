"""Local mirror of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark plan and the oracle SQL on the
same parquet fixtures, then compare row count + sorted-column value
hash (order-insensitive). Used by tests/test_oracle_parity.py and by
``python -m stock_data_pipeline_spark.oracle [sf_dir]`` while iterating.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import re
import sys

import duckdb
from pyspark.sql import DataFrame, SparkSession

from stock_data_pipeline_spark.catalog import ALL_TABLES
from stock_data_pipeline_spark.queries import REGISTRY

# DuckDB output types proven safe through the driver's result pipeline.
# Anything int128-backed (HUGEINT, DECIMAL with precision > 18) is
# rendered as float64/decimal128 by DuckDB's pandas/Arrow exports and
# hash-diverges from Spark's BIGINT even when values are equal — the
# root cause of the 8 r04 driver-only fails (VERDICT r04). Oracles must
# CAST such outputs to BIGINT (or VARCHAR digit strings when > int64).
_SAFE_DUCK_TYPE = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT|VARCHAR|BOOLEAN|DATE"
    r"|TIMESTAMP(_NS| WITH TIME ZONE)?)$"
)
_DECIMAL_TYPE = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def duck_type_allowed(duck_type: str) -> bool:
    """True iff a DuckDB DESCRIBE type is in the driver-proven-safe set."""
    if _SAFE_DUCK_TYPE.match(duck_type):
        return True
    m = _DECIMAL_TYPE.match(duck_type)
    return bool(m) and int(m.group(1)) <= 18


def oracle_output_types(
    con: duckdb.DuckDBPyConnection, oracle_sql: str
) -> list[tuple[str, str]]:
    """(column, DuckDB type) pairs for an oracle query, via DESCRIBE."""
    return [(c, t) for c, t, *_ in con.execute(f"DESCRIBE {oracle_sql}").fetchall()]


def _type_class(v) -> str:
    """Coarse Python type class for cross-engine type-drift detection."""
    if isinstance(v, bool):  # before int: bool subclasses int
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, datetime.datetime):  # before date: datetime subclasses date
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def _col_type_classes(rows: list[tuple], idx: int) -> set[str]:
    return {_type_class(row[idx]) for row in rows if row[idx] is not None}


def _norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr() of the double — both engines hand back Python floats,
        # identical bits → identical repr.
        return repr(v)
    return str(v)


def _value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x1f".join(_norm_cell(row[i]) for i in col_order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str
) -> dict:
    spec = REGISTRY[name]
    sdf: DataFrame = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    result = {"query": name, "spark_rows": len(s_rows), "oracle": spec.oracle is not None}
    if spec.oracle is None:
        result["status"] = "rows_only"
        return result
    # Fetch the DuckDB side via Arrow, not fetchall(): fetchall folds
    # HUGEINT/DECIMAL(38,x) to plain Python int/Decimal and is
    # structurally blind to the type drift that broke 8 queries in the
    # driver's r04 window. Arrow preserves the exported logical type
    # (HUGEINT -> decimal128), so the class check below catches it.
    otab = con.execute(spec.oracle).fetch_arrow_table()
    o_cols = list(otab.column_names)
    _cols_py = [c.to_pylist() for c in otab.columns]
    o_rows = [tuple(vals) for vals in zip(*_cols_py)] if otab.num_rows else []
    result["oracle_rows"] = len(o_rows)
    if sorted(s_cols) != sorted(o_cols):
        result["status"] = "SCHEMA_MISMATCH"
        result["spark_cols"] = s_cols
        result["oracle_cols"] = o_cols
        return result
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    o_order = [o_cols.index(c) for c in sorted(o_cols)]
    drift = {}
    for si, oi in zip(s_order, o_order):
        sc, oc = _col_type_classes(s_rows, si), _col_type_classes(o_rows, oi)
        if sc and oc and sc != oc:
            drift[s_cols[si]] = {"spark": sorted(sc), "oracle": sorted(oc)}
    if drift:
        result["status"] = "TYPE_MISMATCH"
        result["type_drift"] = drift
        return result
    if len(s_rows) != len(o_rows):
        result["status"] = "ROWCOUNT_MISMATCH"
        return result
    sh, oh = _value_hash(s_rows, s_order), _value_hash(o_rows, o_order)
    result["status"] = "MATCH" if sh == oh else "VALUE_MISMATCH"
    return result


def register_duckdb_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def run_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[dict]:
    con = duckdb.connect()
    register_duckdb_views(con, sf_dir)
    out = []
    for name in names or list(REGISTRY):
        try:
            out.append(compare_query(spark, con, name, sf_dir))
        except Exception as exc:  # keep iterating; report the failure
            out.append({"query": name, "status": "ERROR", "error": str(exc)[:500]})
    return out


if __name__ == "__main__":
    from stock_data_pipeline_spark.session import ensure_engine_confs, get_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = ensure_engine_confs(get_session("oracle-parity", cpus=8))
    results = run_all(spark, sf_dir, names)
    bad = 0
    for r in results:
        flag = "ok" if r["status"] in ("MATCH", "rows_only") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"{flag:4} {r['query']:32} {r['status']}", {k: v for k, v in r.items() if k not in ('query', 'status')})
    print(f"\n{len(results) - bad}/{len(results)} passing")
    sys.exit(1 if bad else 0)
