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


# --- round-3 portable primitives ------------------------------------------


@given(keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True))
@SETTINGS
def test_mix31_matches_host_reference_and_spreads(spark, keys):
    """The q224 multiply-mod/xor-shift mixer must (a) equal the host
    reference bit-for-bit for any key, (b) stay within 31 bits."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.queries import _mix31_col

    P = 2147483647

    def ref(u):
        a = (u * 48271 + 11) % P
        a ^= a >> 16
        b = (a * 69621) % P
        b ^= b >> 16
        return b

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k: r.h for r in df.select("k", _mix31_col(F.col("k")).alias("h")).collect()}
    for k in keys:
        assert got[k] == ref(k)
        assert 0 <= got[k] < (1 << 31)


@given(zs=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=100))
@SETTINGS
def test_varint_byte_table_matches_leb128(spark, zs):
    """The generated varint threshold CASE must agree with real LEB128
    encoding lengths for any unsigned value (capped at 9 for >=2^56,
    where true LEB128 needs 9-10 — documented approximation)."""
    from pyspark.sql import functions as F

    from stock_data_pipeline_spark.queries import _varint_bytes_col

    def leb128_len(z):
        n = 1
        while z >= 1 << (7 * n):
            n += 1
        return min(n, 9)

    df = spark.createDataFrame([(z,) for z in zs], "z long")
    got = [r.b for r in df.select(_varint_bytes_col(F.col("z")).alias("b")).collect()]
    assert got == [leb128_len(z) for z in zs]


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
@SETTINGS
def test_hilbert_bijective_on_samples_and_matches_reference(spark, pts):
    """with_hilbert must equal the canonical xy2d walk for arbitrary
    16-bit points, and distinct points must get distinct indexes
    (injectivity — the property that makes it a valid sort key)."""
    from stock_data_pipeline_spark.operators.layout import with_hilbert

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = n - 1 - x
                    y = n - 1 - y
                x, y = y, x
            s //= 2
        return d

    df = spark.createDataFrame(list(pts), "x long, y long")
    got = {(r.x, r.y): r.hval for r in with_hilbert(df, "x", "y").collect()}
    vals = set()
    for (x, y), h in got.items():
        assert h == xy2d(65536, x, y)
        assert h not in vals
        vals.add(h)


def test_rrf_term_table_is_exact_division(spark):
    """Every RRF term literal must be exactly L/(60+r) — i.e., the LCM
    actually clears every denominator (no silent rounding in the
    generated table)."""
    from stock_data_pipeline_spark.queries import _RRF_DEPTH, _RRF_K, _RRF_L

    for r in range(1, _RRF_DEPTH + 1):
        assert _RRF_L % (_RRF_K + r) == 0


def test_rbo_coefficients_are_monotone_and_positive(spark):
    """C[m] = Σ_{d>=m} p^(d-1)·L/d must be strictly decreasing in m and
    positive — the structural property the per-doc lookup relies on."""
    from decimal import Decimal

    from stock_data_pipeline_spark.queries import _RBO_C

    vals = [Decimal(_RBO_C[m]) for m in range(1, 21)]
    assert all(v > 0 for v in vals)
    assert all(a > b for a, b in zip(vals, vals[1:]))


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_decode_inverts_any_filtered_encoding(w, h, data):
    """decode_png_raster must invert a spec-conformant encoder for ANY
    raster and ANY per-row choice of the five PNG filter types (the
    synthesizer only ever emits filter 0 — this covers the rest of the
    spec surface the decoder claims)."""
    import struct
    import zlib

    from stock_data_pipeline_spark.llm.multimodal import decode_png_raster

    raster = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    ftypes = data.draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=h, max_size=h)
    )

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    stride = w * 3
    out, prev = b"", bytes(stride)
    for y in range(h):
        line = raster[y * stride:(y + 1) * stride]
        ft = ftypes[y]
        enc = bytearray()
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b_ = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b_
            elif ft == 3:
                pred = (a + b_) >> 1
            else:
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
            enc.append((line[i] - pred) & 0xFF)
        out += bytes([ft]) + bytes(enc)
        prev = line
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(out))
        + chunk(b"IEND", b"")
    )
    assert decode_png_raster(png) == raster


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    top_down=st.booleans(),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_bmp_decode_normalizes_any_raster(w, h, top_down, data):
    """decode_bmp_raster must recover the same top-down RGB raster from
    either storage direction, for ANY pixel content and any padding."""
    import struct

    from stock_data_pipeline_spark.llm.multimodal import decode_bmp_raster

    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    stride = ((w * 3 + 3) // 4) * 4
    rows = range(h) if top_down else range(h - 1, -1, -1)
    pixels = b""
    for y in rows:
        line = bytearray()
        for x in range(w):
            r, g, b_ = rgb[3 * (y * w + x):3 * (y * w + x) + 3]
            line += bytes([b_, g, r])
        pixels += bytes(line) + bytes(stride - 3 * w)
    fh = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    ih = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h,
        1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    assert decode_bmp_raster(fh + ih + pixels) == rgb


@given(
    a=st.integers(min_value=1, max_value=10**18),
    b=st.integers(min_value=1, max_value=10**18),
)
@settings(max_examples=300, deadline=None)
def test_floor_log2_ratio_equals_bin_length_of_integer_division(a, b):
    """q306's core identity: for integers a ≥ b ≥ 1,
    floor(log2(a/b)) == bit_length(a div b) − 1 — proven by
    2^k ≤ a/b < 2^(k+1) ⟺ 2^k ≤ a//b < 2^(k+1); verified here against
    an exact integer-comparison floor-log2 (no floats anywhere, so no
    boundary lies)."""
    if a < b:
        a, b = b, a
    # exact floor(log2(a/b)): largest k with (b << k) <= a
    k = 0
    while (b << (k + 1)) <= a:
        k += 1
    assert (a // b).bit_length() - 1 == k
