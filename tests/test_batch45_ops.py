"""Unit tests for batch-4/5 operators: connected components, chunking,
deterministic sampling stability, monthly OHLC edges, set ops."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from stock_data_pipeline_spark.llm import dedup, text


# ---------------------------------------------------------------------------
# connected_components
# ---------------------------------------------------------------------------

def test_cc_chain_is_one_cluster(spark):
    # a-b, b-c, c-d: transitivity requires ≥2 propagation rounds
    edges = spark.createDataFrame([(2, 3), (3, 4), (4, 5)], ["id_a", "id_b"])
    out = {r["vertex"]: r["cluster_id"] for r in dedup.connected_components(edges).collect()}
    assert out == {2: 2, 3: 2, 4: 2, 5: 2}


def test_cc_disjoint_components(spark):
    edges = spark.createDataFrame([(1, 2), (10, 11), (11, 12)], ["id_a", "id_b"])
    out = {r["vertex"]: r["cluster_id"] for r in dedup.connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_cc_min_label_regardless_of_direction(spark):
    # edge written high→low: the min label must still win
    edges = spark.createDataFrame([(9, 1), (5, 9)], ["id_a", "id_b"])
    out = {r["vertex"]: r["cluster_id"] for r in dedup.connected_components(edges).collect()}
    assert out == {1: 1, 9: 1, 5: 1}


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.slow  # 180 s: 60 random graphs through both CC variants (r10 tier split)
def test_cc_variants_match_union_find_on_random_graphs(spark):
    """Both the to-convergence loop and the fixed-round lazy variant
    must agree with a driver-side union-find on adversarial shapes:
    long chains (diameter stress for pointer jumping), stars, cliques,
    and a deterministic pseudo-random graph."""
    import random

    rng = random.Random(7)
    shapes = {
        # chain of diameter 40: pointer jumping must converge in
        # O(log 40) ≈ 7 loop rounds, not 40
        "chain": [(i, i + 1) for i in range(40)],
        "star": [(0, i) for i in range(1, 30)],
        "clique": [(i, j) for i in range(8) for j in range(i + 1, 8)],
        "random": [(rng.randrange(60), rng.randrange(60)) for _ in range(80)],
    }
    # the lazy fixed-round variant (reach 2^4 = 16 at default rounds)
    # is only exercised on the bounded-diameter shapes it is meant for
    fixed_ok = {"star", "clique"}
    for name, pairs in shapes.items():
        pairs = [(a, b) for a, b in pairs if a != b]
        expected = _union_find_oracle(pairs)
        edges = spark.createDataFrame(pairs, ["id_a", "id_b"])
        loop = {r["vertex"]: r["cluster_id"]
                for r in dedup.connected_components(edges).collect()}
        assert loop == expected, f"loop variant wrong on {name}"
        if name in fixed_ok:
            fixed = {r["vertex"]: r["cluster_id"]
                     for r in dedup.connected_components_fixed(edges).collect()}
            assert fixed == expected, f"fixed variant wrong on {name}"


# ---------------------------------------------------------------------------
# chunking semantics (mirrors q64's expression)
# ---------------------------------------------------------------------------

def _chunk(spark, n_tokens: int, chunk: int = 50, stride: int = 40):
    toks = " ".join(f"t{i}" for i in range(n_tokens))
    doc = spark.createDataFrame([(1, toks)], ["doc_id", "text"])
    sized = (
        doc.select("doc_id", text.tokens(F.col("text")).alias("tk"))
        .withColumn("n_tok", F.size("tk"))
        .filter(F.col("n_tok") > 0)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.floor((F.col("n_tok") - 1) / stride).cast("int")),
        lambda i: F.array_join(F.slice("tk", i * stride + 1, F.lit(chunk)), " "),
    )
    return (
        sized.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .orderBy("chunk_idx")
        .collect()
    )


def test_chunking_short_doc_single_chunk(spark):
    rows = _chunk(spark, 10)
    assert len(rows) == 1
    assert rows[0]["chunk_text"].split() == [f"t{i}" for i in range(10)]


def test_chunking_exact_boundary(spark):
    # 41 tokens → starts at 0 and 40 → 2 chunks; second has 1 token
    rows = _chunk(spark, 41)
    assert len(rows) == 2
    assert rows[1]["chunk_text"] == "t40"


def test_chunking_overlap(spark):
    rows = _chunk(spark, 90)
    assert len(rows) == 3
    first, second = rows[0]["chunk_text"].split(), rows[1]["chunk_text"].split()
    # stride 40, chunk 50 → 10-token overlap
    assert first[40:] == second[:10]


# ---------------------------------------------------------------------------
# deterministic sampling is partitioning-invariant
# ---------------------------------------------------------------------------

def test_deterministic_sample_stable_under_repartition(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    mixed = F.pmod(F.col("k") * F.lit(2654435761), F.lit(4294967296))
    s1 = {r["k"] for r in df.filter(mixed < 214748365).collect()}
    s2 = {r["k"] for r in df.repartition(13).filter(mixed < 214748365).collect()}
    assert s1 == s2
    assert 0 < len(s1) < 10_000


# ---------------------------------------------------------------------------
# monthly OHLC edge: single tick → open=high=low=close
# ---------------------------------------------------------------------------

def test_monthly_ohlc_single_tick(spark):
    from stock_data_pipeline_spark.queries import q55_monthly_ohlc  # noqa: F401  (shape via registry)
    import datetime

    ev = spark.createDataFrame(
        [(1, datetime.datetime(2024, 3, 5, 12, 0, 0), 7, "x", 42.5)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    wa = F.date_trunc("month", "ts")
    out = (
        ev.groupBy("user_id", F.date_format(wa, "yyyy-MM").alias("month"))
        .agg(F.min("value").alias("low"), F.max("value").alias("high"))
        .collect()
    )
    assert out[0]["low"] == out[0]["high"] == 42.5
