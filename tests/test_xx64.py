"""functions/xx64.py: the Python and generated-SQL ports of Spark's
xxhash64 must be BIT-EXACT against Spark itself — they are what gives
the xxhash64 fast twins (q26/q27/q29) independent value oracles (r06
VERDICT item 4). Coverage: every byte-tail length (0..44 spans all
stripe/word/4-byte/byte-tail combinations), multi-byte UTF-8, the
32-byte stripe boundary, int/long column chaining, and the q29 weight
derivation."""

from __future__ import annotations

import random
import string as st

import duckdb
import pytest
from pyspark.sql import functions as F

from stock_data_pipeline_spark.functions.xx64 import (
    spark_xxhash64,
    xx64_sql_string_signed,
    xx64_sql_string_u31,
)


def _corpus() -> list[str]:
    random.seed(0xC0FFEE)
    out = [""]
    for length in list(range(1, 45)) + [63, 64, 65, 100, 257]:
        out.append(
            "".join(random.choice(st.ascii_letters + " 0123456789_-") for _ in range(length))
        )
    out += [
        "héllo wörld",          # 2-byte UTF-8 in the tail
        "データパイプライン",     # 3-byte UTF-8, length%8 != 0
        "a" * 31, "b" * 32, "c" * 33,  # stripe boundary
        "naïve café " * 5,      # >32B with multi-byte
    ]
    return out


def test_python_port_matches_spark_strings(spark):
    strs = _corpus()
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    bad = [s for s in strs if got[s] != spark_xxhash64(s)]
    assert not bad, f"python port diverges on {bad[:3]!r}"


def test_python_port_matches_spark_int_chain(spark):
    """The q29 weight shape: xxhash64(lit('plane'), int, int, int) —
    INT columns take the 4-byte path and chain left to right."""
    rows = [(t, p, i) for t in range(4) for p in range(3) for i in range(6)]
    df = spark.createDataFrame(rows, "t int, p int, i int")
    got = df.select(
        "t", "p", "i", F.xxhash64(F.lit("plane"), "t", "p", "i").alias("h")
    ).collect()
    bad = [r for r in got if r["h"] != spark_xxhash64("plane", r["t"], r["p"], r["i"])]
    assert not bad


def test_python_port_matches_spark_longs(spark):
    vals = [0, 1, -1, 7, 2**40, -(2**40), 12345678901, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    bad = [v for v in vals if got[v] != spark_xxhash64(("long", v))]
    assert not bad


def test_sql_port_matches_python_port():
    """The generated single-expression DuckDB SQL (what the q26/q27
    oracles embed) against the Spark-pinned Python port — pure DuckDB,
    no Spark session needed."""
    strs = _corpus()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strs])
    got = dict(
        con.execute(f"SELECT s, {xx64_sql_string_signed('s')} FROM t").fetchall()
    )
    bad = [s for s in strs if got[s] != spark_xxhash64(s)]
    assert not bad, f"SQL port diverges on {bad[:3]!r}"


def test_sql_u31_is_unsigned_shift():
    con = duckdb.connect()
    expr = xx64_sql_string_u31("'hello world'")
    got = con.execute("SELECT " + expr).fetchone()[0]
    expected = (spark_xxhash64("hello world") & ((1 << 64) - 1)) >> 33
    assert got == expected
    assert 0 <= got < (1 << 31)


def test_xxhash_plane_weights_match_spark(spark):
    """Pre-evaluated q29 oracle weights == the Spark hashed path."""
    from stock_data_pipeline_spark.llm.similarity import (
        _plane_weight,
        xxhash_plane_weights,
    )

    ws = xxhash_plane_weights(3, 3, 8)
    rows = [(t, p, i) for t in range(3) for p in range(3) for i in range(8)]
    df = spark.createDataFrame(rows, "t int, p int, i int")
    got = df.select(
        "t", "p", "i", _plane_weight(F.col("t"), F.col("p"), F.col("i")).alias("w")
    ).collect()
    bad = [r for r in got if r["w"] != ws[r["t"]][r["p"]][r["i"]]]
    assert not bad
    flat = [w for t in ws for p in t for w in p]
    assert all(-1.0 <= w < 1.0 for w in flat)
    # dyadic: repr round-trips exactly (what the SQL literal relies on)
    assert all(float(repr(w)) == w for w in flat)


def test_unsupported_operand_raises():
    with pytest.raises(TypeError):
        spark_xxhash64(object())
