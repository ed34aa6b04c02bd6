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


clamp_strategy = st.lists(
    st.one_of(st.integers(min_value=-50, max_value=50), st.none()),
    min_size=1,
    max_size=40,
)


@given(deltas=clamp_strategy, floor=st.integers(min_value=-20, max_value=5))
@SETTINGS
def test_clamped_sum_closed_form_matches_reference_fold(spark, deltas, floor):
    """The prefix-sum/running-min closed form must equal the sequential
    recurrence bal_t = max(floor, bal_{t-1} + d) for ANY delta pattern
    (NULLs pass the balance through) and any floor."""
    from stock_data_pipeline_spark.operators.windows import clamped_running_sum

    df = spark.createDataFrame(
        [(1, i, d) for i, d in enumerate(deltas)], "k int, t int, delta int"
    )
    out = {
        r["t"]: r["balance"]
        for r in clamped_running_sum(df, ["k"], ["t"], "delta", floor=floor).collect()
    }
    bal, refs = floor, {}
    for i, d in enumerate(deltas):
        if d is not None:
            bal = max(floor, bal + d)
        refs[i] = bal
    assert out == refs


@given(
    xs=st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=12),
    ys=st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=12),
)
@SETTINGS
def test_morton_preserves_coordinates(spark, xs, ys):
    """The Morton code must be invertible: de-interleaving the even and
    odd bits recovers (x, y) exactly for any 16-bit inputs."""
    from pyspark.sql import functions as F
    from stock_data_pipeline_spark.operators.layout import morton2

    n = min(len(xs), len(ys))
    df = spark.createDataFrame(list(zip(xs[:n], ys[:n])), "x long, y long")
    rows = df.select("x", "y", morton2(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        x = y = 0
        for i in range(16):
            x |= ((r.z >> (2 * i)) & 1) << i
            y |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r.x, r.y)


@given(
    keys=st.lists(st.integers(min_value=1, max_value=30), min_size=5, max_size=60),
)
@SETTINGS
def test_bloom_membership_never_false_negative(spark, keys):
    """Any key folded into the Bloom words must probe positive — for
    arbitrary key multisets (the one guarantee a Bloom filter makes)."""
    from pyspark.sql import functions as F
    from stock_data_pipeline_spark.operators.sketches import kmv_hash

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    h = kmv_hash(F.col("k"))
    p = F.lit(2147483647).cast("long")
    h2 = F.pmod(h * F.lit(2654435761).cast("long"), p)
    probes = df.select(
        "k", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"), h.alias("h"), h2.alias("h2")
    ).select("k", F.pmod(F.col("h") + F.col("j") * F.col("h2"), F.lit(4096)).alias("pos"))
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 62 AS INT))")
    words = {
        r.word_idx: r.bits
        for r in probes.select((F.col("pos") / 62).cast("long").alias("word_idx"), mask.alias("m"))
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    }
    cells = probes.select("k", (F.col("pos") / 62).cast("long").alias("w"), mask.alias("m")).collect()
    by_key: dict[int, bool] = {}
    for c in cells:
        hit = (words.get(c.w, 0) & c.m) != 0
        by_key[c.k] = by_key.get(c.k, True) and hit
    assert all(by_key.values())
