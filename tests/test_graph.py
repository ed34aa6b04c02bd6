"""operators.graph.pagerank_fixed — unrolled declarative PageRank.

The bit-exactness contract (pinned left-to-right contribution folds,
exact integer weight ratios) is what lets q110 carry a full value
oracle; these tests replay the identical arithmetic in plain Python
and assert EXACT float equality, not approximate closeness.
"""

from __future__ import annotations

from stock_data_pipeline_spark.operators.graph import pagerank_fixed


def _python_pagerank(edges, rounds=3, damping=0.85):
    """Reference loop with the same op order as the Spark plan:
    teleport + d * (left-to-right fold of contribs sorted by src)."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    p = {(s, d): w / outw[s] for s, d, w in edges}
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(rounds):
        nxt = {}
        for v in nodes:
            acc = 0.0
            for s in sorted(nodes):
                if (s, v) in p:
                    acc = acc + pr[s] * p[(s, v)]
            nxt[v] = (1.0 - damping) / n + damping * acc
        pr = nxt
    return pr


def _run(spark, edges, rounds=3):
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r["node"]: r["pr"] for r in pagerank_fixed(df, rounds=rounds).collect()}
    want = _python_pagerank(edges, rounds=rounds)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == want[v], (v, got[v], want[v])  # exact, not approx
    return got


def test_pagerank_cycle_uniform(spark):
    # symmetric 3-cycle: ranks must stay exactly uniform every round
    got = _run(spark, [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)])
    assert all(abs(v - 1 / 3) < 1e-15 for v in got.values())


def test_pagerank_weighted_star(spark):
    # hub feeding two spokes with 3:1 weights plus a back edge
    got = _run(
        spark,
        [("hub", "x", 3), ("hub", "y", 1), ("x", "hub", 1), ("y", "hub", 1)],
    )
    assert got["x"] > got["y"]  # 3x the transition mass


def test_pagerank_dangling_and_sourceless(spark):
    # b is dangling (mass leaks, documented); a has no in-edges →
    # teleport term only
    got = _run(spark, [("a", "b", 2)])
    assert got["a"] == (1.0 - 0.85) / 2


def test_pagerank_single_round_matches_hand_calc(spark):
    edges = [("a", "b", 1), ("b", "a", 1), ("a", "a", 1)]
    got = _run(spark, edges, rounds=1)
    # a: teleport + d*(pr(a)*w_aa/outw_a + pr(b)*1)
    tp = 0.15000000000000002 / 2  # 1.0 - 0.85 in IEEE
    exp_a = tp + 0.85 * (0.5 * 0.5 + 0.5 * 1.0)
    assert got["a"] == exp_a
