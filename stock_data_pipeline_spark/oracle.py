"""Local mirror of the driver's DuckDB-oracle correctness gate.

For each registered query: run the Spark plan and the oracle SQL on the
same parquet fixtures, then compare row count + sorted-column value
hash (order-insensitive). Used by tests/test_oracle_parity.py and by
``python -m stock_data_pipeline_spark.oracle [sf_dir]`` while iterating.
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
from pyspark.sql import DataFrame, SparkSession

from stock_data_pipeline_spark.catalog import ALL_TABLES
from stock_data_pipeline_spark.queries import REGISTRY


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
    ores = con.execute(spec.oracle)
    o_cols = [d[0] for d in ores.description]
    o_rows = ores.fetchall()
    result["oracle_rows"] = len(o_rows)
    if sorted(s_cols) != sorted(o_cols):
        result["status"] = "SCHEMA_MISMATCH"
        result["spark_cols"] = s_cols
        result["oracle_cols"] = o_cols
        return result
    s_order = [s_cols.index(c) for c in sorted(s_cols)]
    o_order = [o_cols.index(c) for c in sorted(o_cols)]
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
