"""Engine-independent port of Spark's ``xxhash64`` expression.

Spark's ``F.xxhash64(cols...)`` (seed 42) is XXH64 as implemented in
``org.apache.spark.sql.catalyst.expressions.XXH64``. Semantics pinned
EMPIRICALLY against Spark 4.1 (tests/test_xx64.py, random strings of
every tail length + multi-byte UTF-8): byte inputs follow the
reference xxHash layout (32-byte stripes, full-length add, 8-byte
words, one 4-byte chunk, byte tail); INT columns take the 4-byte
``hashInt`` path (not a long promotion); LONG/DOUBLE take the 8-byte
path. Multi-column calls CHAIN: the hash of column *i* seeds column
*i+1*.

This module reproduces that algorithm two ways:

1. **Pure Python** (`spark_xxhash64`): used to pre-compute
   data-independent hash constants (the q29 hyperplane weights are a
   pure function of ``(table, plane, dim)`` indices) and as the test
   reference. Verified bit-exact against Spark over random inputs in
   ``tests/test_xx64.py``.
2. **Pure ANSI-ish DuckDB SQL** (`xx64_sql_string`): a generated
   single-expression SQL equivalent over a VARCHAR column, so the
   xxhash64-based registry queries (q26/q27) carry full value oracles
   any bare DuckDB connection can run — no Python UDF registration,
   no multi-statement setup. 64-bit wrap arithmetic is emulated in
   HUGEINT (int128) with 32×64→64-bit split multiplication; the UTF-8
   bytes come from ``hex(encode(s))`` digit parsing.

Reference parity note: the reference pipeline has no hash-based
operators; these back the LLM-scale dedup/ANN extensions (SURVEY §2
extension rows; VERDICT r06 item 4 ordered the independent oracle).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
SEED = 42  # Spark's fixed xxhash64 seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M64
    h ^= h >> 29
    h = (h * P3) & _M64
    h ^= h >> 32
    return h


def xx64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt: a 4-byte value (int/short/byte/float bits
    are all routed here), read as the unsigned 32-bit pattern."""
    h = (seed + P5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * P1) & _M64
    h = (_rotl(h, 23) * P2 + P3) & _M64
    return _fmix(h)


def xx64_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong: an 8-byte value (long/double bits)."""
    h = (seed + P5 + 8) & _M64
    h ^= (_rotl((v & _M64) * P2 & _M64, 31) * P1) & _M64
    h = (_rotl(h, 27) * P1 + P4) & _M64
    return _fmix(h)


def xx64_bytes(b: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes (strings hash their UTF-8 bytes).

    Structure: 32-byte stripes over the word-aligned prefix, full
    length added, remaining 8-byte words, one optional 4-byte chunk,
    byte tail, avalanche — byte-exact vs Spark (tests/test_xx64.py)."""
    length = len(b)
    aligned = length & -8
    if aligned >= 32:
        v1 = (seed + P1 + P2) & _M64
        v2 = (seed + P2) & _M64
        v3 = seed & _M64
        v4 = (seed - P1) & _M64
        off = 0
        while off <= aligned - 32:
            v1 = (_rotl((v1 + int.from_bytes(b[off : off + 8], "little") * P2) & _M64, 31) * P1) & _M64
            v2 = (_rotl((v2 + int.from_bytes(b[off + 8 : off + 16], "little") * P2) & _M64, 31) * P1) & _M64
            v3 = (_rotl((v3 + int.from_bytes(b[off + 16 : off + 24], "little") * P2) & _M64, 31) * P1) & _M64
            v4 = (_rotl((v4 + int.from_bytes(b[off + 24 : off + 32], "little") * P2) & _M64, 31) * P1) & _M64
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & _M64, 31) * P1) & _M64
            h = (h * P1 + P4) & _M64
    else:
        h = (seed + P5) & _M64
        off = 0
    h = (h + length) & _M64
    while off <= aligned - 8:
        k1 = int.from_bytes(b[off : off + 8], "little")
        h ^= (_rotl((k1 * P2) & _M64, 31) * P1) & _M64
        h = (_rotl(h, 27) * P1 + P4) & _M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(b[off : off + 4], "little") * P1) & _M64
        h = (_rotl(h, 23) * P2 + P3) & _M64
        off += 4
    while off < length:
        h ^= (b[off] * P5) & _M64
        h = (_rotl(h, 11) * P1) & _M64
        off += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# DuckDB single-expression SQL generation
# ---------------------------------------------------------------------------
#
# One self-contained SQL EXPRESSION (no macros, no UDF registration, no
# multi-statement setup — the driver runs each oracle as a single
# statement on a bare connection). 64-bit modular arithmetic rides in
# HUGEINT; every intermediate is rebound through a one-element
# list_transform so the generated text grows linearly, not
# exponentially, with algorithm depth.

_MOD = str(1 << 64)  # 18446744073709551616


def _bind(var: str, expr: str, body: str) -> str:
    """SQL let-binding: evaluate ``expr`` once, name it ``var`` inside
    ``body`` (DuckDB lambdas close over enclosing lambda params, so
    binds nest)."""
    return f"list_transform([({expr})], {var} -> ({body}))[1]"


def _mul(a: str, b: str) -> str:
    """(a * b) mod 2^64 for HUGEINT operands in [0, 2^64): 32×64 split
    keeps every intermediate under 2^97, inside int128."""
    return (
        f"(((({a}) % 4294967296) * ({b})"
        f" + (((({a}) // 4294967296) * ({b})) % 4294967296) * 4294967296)"
        f" % {_MOD})"
    )


def _rot(x: str, r: int) -> str:
    return f"((({x}) * {1 << r} + ({x}) // {1 << (64 - r)}) % {_MOD})"


def _xor(a: str, b: str) -> str:
    return f"xor(({a}), ({b}))"


def _hexd(pos: str) -> str:
    return f"(strpos('0123456789ABCDEF', substr(hx, CAST({pos} AS BIGINT), 1)) - 1)"


def _byte(off: str) -> str:
    """Byte (0-based offset ``off``) of the hashed UTF-8 bytes, parsed
    from the bound hex dump ``hx`` — as HUGEINT."""
    return (
        f"CAST({_hexd(f'2*({off})+1')} * 16 + {_hexd(f'2*({off})+2')} AS HUGEINT)"
    )


def _word(off: str) -> str:
    """Little-endian 8-byte word at 0-based byte offset ``off``."""
    return "(" + " + ".join(
        f"{_byte(f'({off}) + {k}')} * {1 << (8 * k)}" for k in range(8)
    ) + ")"


def _int32(off: str) -> str:
    """Little-endian 4-byte value at 0-based byte offset ``off``."""
    return "(" + " + ".join(
        f"{_byte(f'({off}) + {k}')} * {1 << (8 * k)}" for k in range(4)
    ) + ")"


def _fmix_sql(h: str) -> str:
    """XXH64 avalanche, inside-out binds so ``h`` is evaluated once."""
    s4 = _bind("f4", _mul("f3", str(P3)), _xor("f4", f"f4 // {1 << 32}"))
    s3 = _bind("f3", _xor("f2", f"f2 // {1 << 29}"), s4)
    s2 = _bind("f2", _mul("f1", str(P2)), s3)
    s1 = _bind("f1", _xor("hz", f"hz // {1 << 33}"), s2)
    return _bind("hz", h, s1)


def _round_sql(v: str, w_expr: str) -> str:
    """XXH64 stripe round: rotl31(v + w*P2) * P1, all mod 2^64."""
    inner = _bind("t", f"(({v}) + {_mul('w', str(P2))}) % {_MOD}", _mul(_rot("t", 31), str(P1)))
    return _bind("w", w_expr, inner)


def _merge_sql(h: str, v: str) -> str:
    """XXH64 merge round: (h ^ round0(v)) * P1 + P4."""
    r0 = _bind("mr", _mul(v, str(P2)), _mul(_rot("mr", 31), str(P1)))
    return _bind(
        "mh", _xor(h, r0), f"({_mul('mh', str(P1))} + {P4}) % {_MOD}"
    )


def xx64_sql_string(expr: str, seed: int = SEED) -> str:
    """DuckDB SQL expression: Spark ``xxhash64(expr)`` (a VARCHAR SQL
    expression) as the UNSIGNED hash in [0, 2^64) — HUGEINT. Verified
    byte-exact against both Spark and the Python port over random
    multi-length UTF-8 corpora (tests/test_xx64.py)."""
    init = [
        (seed + P1 + P2) & _M64,
        (seed + P2) & _M64,
        seed & _M64,
        (seed - P1) & _M64,
    ]
    init_sql = "[" + ", ".join(f"CAST({v} AS HUGEINT)" for v in init) + "]"
    # stripe fold: acc = [v1,v2,v3,v4]; element si = stripe number (1-based)
    stripe_elem = "list_transform(generate_series(1, CAST(st AS BIGINT)), si -> [CAST(si AS HUGEINT)])"
    stripe_lambda = "[" + ", ".join(
        _round_sql(f"a[{k + 1}]", _word(f"(x[1] - 1) * 32 + {8 * k}"))
        for k in range(4)
    ) + "]"
    stripes = (
        f"list_reduce(list_prepend({init_sql}, {stripe_elem}), (a, x) -> {stripe_lambda})"
    )
    # merged hash when stripes ran, else seed + P5
    merged_sum = (
        f"({_rot('vv[1]', 1)} + {_rot('vv[2]', 7)} + {_rot('vv[3]', 12)}"
        f" + {_rot('vv[4]', 18)}) % {_MOD}"
    )
    merged = _bind("vv", stripes, _bind(
        "m0", merged_sum,
        _bind("m1", _merge_sql("m0", "vv[1]"),
              _bind("m2", _merge_sql("m1", "vv[2]"),
                    _bind("m3", _merge_sql("m2", "vv[3]"), _merge_sql("m3", "vv[4]")))),
    ))
    h_base = f"CASE WHEN st = 0 THEN CAST({(seed + P5) & _M64} AS HUGEINT) ELSE {merged} END"
    # + full length, then the remaining aligned 8-byte words
    h_len = f"(({h_base}) + nn) % {_MOD}"
    word_step = _bind(
        "k1r", _bind("k1", _word("st * 32 + (x[1] - 1) * 8"), _mul(_rot(_mul("k1", str(P2)), 31), str(P1))),
        f"[({_mul(_rot(_xor('a[1]', 'k1r'), 27), str(P1))} + {P4}) % {_MOD}]",
    )
    word_elem = "list_transform(generate_series(1, CAST((al - st * 32) // 8 AS BIGINT)), wi -> [CAST(wi AS HUGEINT)])"
    h_words = (
        f"list_reduce(list_prepend([({h_len})], {word_elem}), (a, x) -> {word_step})[1]"
    )
    # optional 4-byte chunk at offset al
    chunk = _bind(
        "c4", f"({_int32('al')} * {P1}) % {_MOD}",
        f"({_mul(_rot(_xor('h4', 'c4'), 23), str(P2))} + {P3}) % {_MOD}",
    )
    h_chunk = _bind(
        "h4", h_words, f"CASE WHEN nn - al >= 4 THEN {chunk} ELSE h4 END"
    )
    # byte tail (0-3 bytes), starting at tb = al + (4 if chunk else 0)
    def tail_step(h: str, idx: int) -> str:
        step = _bind(
            "bv", f"({_byte(f'tb + {idx}')} * {P5}) % {_MOD}",
            _mul(_rot(_xor(f"t{idx}", "bv"), 11), str(P1)),
        )
        return _bind(
            f"t{idx}", h, f"CASE WHEN nn - tb >= {idx + 1} THEN {step} ELSE t{idx} END"
        )
    h_tail = tail_step(tail_step(tail_step(h_chunk, 0), 1), 2)
    core = _bind("tb", "al + CASE WHEN nn - al >= 4 THEN 4 ELSE 0 END", _fmix_sql(h_tail))
    with_st = _bind("st", "CASE WHEN al >= 32 THEN al // 32 ELSE CAST(0 AS HUGEINT) END", core)
    with_al = _bind("al", "nn - nn % 8", with_st)
    with_n = _bind("nn", "CAST(length(hx) // 2 AS HUGEINT)", with_al)
    return _bind("hx", f"hex(encode({expr}))", with_n)


def xx64_sql_string_signed(expr: str, seed: int = SEED) -> str:
    """Spark ``xxhash64(expr)`` as the SIGNED BIGINT Spark returns."""
    return _bind(
        "uh", xx64_sql_string(expr, seed),
        f"CAST(CASE WHEN uh >= {1 << 63} THEN uh - {1 << 64} ELSE uh END AS BIGINT)",
    )


def xx64_sql_string_u31(expr: str, seed: int = SEED) -> str:
    """``shiftrightunsigned(xxhash64(expr), 33)`` — the 31-bit
    non-negative shingle hash the MinHash fast path uses — as BIGINT."""
    return f"CAST(({xx64_sql_string(expr, seed)}) // {1 << 33} AS BIGINT)"


def spark_xxhash64(*values, seed: int = SEED) -> int:
    """``F.xxhash64(*cols)`` for a row of Python values, as Spark's
    SIGNED 64-bit result. ints are hashed with Spark's INT path (the
    common literal/index case); pass ``("long", v)`` to force the
    8-byte path, ``("double", v)`` / ``("float", v)`` for FP bit
    patterns, str/bytes for the UTF-8 path. Columns chain left to
    right, each result seeding the next (NULLs leave the seed
    unchanged — pass None)."""
    import struct

    h = seed
    for v in values:
        kind = None
        if isinstance(v, tuple):
            kind, v = v
        if v is None:
            continue
        if kind == "long":
            h = xx64_long(v, h)
        elif kind == "double":
            h = xx64_long(struct.unpack("<q", struct.pack("<d", v))[0], h)
        elif kind == "float":
            h = xx64_int(struct.unpack("<i", struct.pack("<f", v))[0], h)
        elif isinstance(v, bool):
            h = xx64_int(int(v), h)
        elif isinstance(v, int):
            h = xx64_int(v, h) if kind is None else xx64_long(v, h)
        elif isinstance(v, str):
            h = xx64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xx64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported xxhash64 operand: {type(v)}")
    return _to_signed(h)
