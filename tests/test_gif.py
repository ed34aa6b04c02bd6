"""GIF tier-3b codec (llm/multimodal.py): the LZW round trip must be
spec-anchored, not merely self-consistent — a hand-computed bitstream
vector pins the LSB-first packing and code semantics, hostile inputs
must degrade to None (never raise), and the Spark-side stats must
equal a brute-force Python recompute."""

from __future__ import annotations

import random

import pytest

from stock_data_pipeline_spark.llm.multimodal import (
    _gif_palette,
    _gif_pixel,
    _lzw_decode,
    _lzw_encode,
    decode_gif_pixels,
    decode_gif_raster,
    synthesize_gif,
    synthesize_gifs,
)


def _expected_raster(w: int, h: int) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(_gif_palette(_gif_pixel(x, y)))
    return bytes(out)


def test_hand_computed_bitstream_vector():
    """Pixels [1,1,1] at min code size 2: clear(100)=4, literal 1,
    then the (1,1) dict entry (code 6), then EOI(101)=5, all 3-bit
    LSB-first -> exactly bytes 0x8C 0x0B. Pins bit order and code
    layout to the GIF89a spec, independent of the decoder."""
    assert _lzw_encode([1, 1, 1]) == bytes([0x8C, 0x0B])
    assert _lzw_decode(bytes([0x8C, 0x0B])) == [1, 1, 1]


def test_lzw_round_trip_sizes_and_patterns():
    rng = random.Random(7)
    for n in [1, 2, 5, 17, 100, 1000, 12345, 300000]:
        px = [rng.randrange(4) for _ in range(n)]
        assert _lzw_decode(_lzw_encode(px)) == px, n
    # degenerate/repetitive streams exercise the KwKwK unseen-code case
    for px in ([0] * 5000, [0, 1] * 4000, [1, 1, 1], [2], [3, 3]):
        assert _lzw_decode(_lzw_encode(px)) == px


def test_width_boundary_at_final_code():
    """Regression: when the code-width boundary falls exactly on the
    last data code, the decoder's implicit final table append used to
    desynchronize the EOI width (w=2, h=7 was the failing shape)."""
    for w, h in [(2, 7), (1, 1), (11, 5)]:
        assert decode_gif_raster(synthesize_gif(w, h)) == _expected_raster(w, h)


def test_container_round_trip_all_query_dims():
    # every (w, h) the q394 synthesis can produce: w in 1..11, h in 1..5
    for w in range(1, 12):
        for h in range(1, 6):
            assert decode_gif_raster(synthesize_gif(w, h)) == _expected_raster(w, h)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda g: g[:-1],                      # missing trailer
        lambda g: g[:20],                      # truncated mid-structure
        lambda g: b"NOTGIF" + g[6:],           # bad signature
        lambda g: bytes([255]) * 64,           # garbage
        lambda g: g[:13] + g[25:],             # color table ripped out
        lambda g: b"",                         # empty
    ],
)
def test_hostile_inputs_return_none(mutate):
    g = synthesize_gif(9, 4)
    assert decode_gif_raster(mutate(g)) is None


def test_corrupt_lzw_never_raises():
    g = bytearray(synthesize_gif(9, 4))
    for i in range(25, len(g) - 1):
        mutated = bytes(g[:i]) + bytes([g[i] ^ 0xFF]) + bytes(g[i + 1 :])
        decode_gif_raster(mutated)  # any result, no exception


def test_spark_stats_match_bruteforce(spark):
    docs = spark.range(0, 60).selectExpr("id as doc_id", "'x' as text")
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_gif_pixels(synthesize_gifs(docs, "doc_id")).collect()
    }
    assert len(got) == 60
    for i in range(60):
        raster = _expected_raster(i % 11 + 1, i % 5 + 1)
        row = got[i]
        assert row["n_raster_bytes"] == len(raster)
        assert row["byte_sum"] == sum(raster)
        x = 0
        for b in raster:
            x ^= b
        assert row["byte_xor"] == x
        assert row["pos_weighted_sum"] == sum((j + 1) * b for j, b in enumerate(raster))
