"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures.

Examples are capped low — each case spins Spark jobs; the point is
randomized structure (dup clusters, overlap patterns), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from stock_data_pipeline_spark.llm import dedup

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=10),
    min_size=2,
    max_size=8,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(docs=docs_strategy)
@SETTINGS
def test_prefix_filter_is_lossless(spark, docs):
    """AllPairs prefix filtering must return exactly the brute-force
    Jaccard pair set on arbitrary corpora (incl. exact dups, empty
    overlaps, subset relations)."""
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)], ["doc_id", "text"]
    )
    brute = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in dedup.ngram_jaccard_pairs_prefix(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    assert brute == fast


@given(
    existing=st.lists(st.integers(1, 20), max_size=8),
    incoming=st.lists(st.integers(1, 20), min_size=1, max_size=8),
)
@SETTINGS
def test_append_incremental_never_duplicates_dates(spark, existing, incoming):
    """After an incremental append, no date at-or-before the sink's
    prior max may gain rows, and re-appending the same batch is a
    no-op."""
    import datetime as dt

    from stock_data_pipeline_spark.operators.incremental import append_incremental

    mk = lambda days: [(dt.date(2026, 1, 1) + dt.timedelta(days=d), float(d)) for d in days]
    ex = spark.createDataFrame(mk(sorted(set(existing))), "date date, v double")
    inc = spark.createDataFrame(mk(sorted(set(incoming))), "date date, v double")
    once = append_incremental(ex, inc, "date")
    # dates are unique (both inputs deduped, overlap dropped)
    assert once.count() == once.select("date").distinct().count()
    twice = append_incremental(once, inc, "date")
    assert twice.count() == once.count()
