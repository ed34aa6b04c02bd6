"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Decode has THREE tiers by capability:

1. ``decode_image_features`` — deterministic byte-math stand-in for
   feature extraction (no codec at all); exercises batch/shape
   contracts, value-verifiable cross-engine (q35).
2. ``decode_image_headers`` — REAL binary-format decode, pure Python:
   parses actual PNG (signature + IHDR, CRC-checked) and BMP
   (BITMAPINFOHEADER) payloads for format/dimensions/bit depth; the
   matching ``synthesize_images`` emits spec-valid files (zlib IDAT,
   correct CRCs) so the round trip is oracle-checkable end-to-end
   (q185) without any image library.
3. ``decode_image_pixels`` — REAL full pixel decode, stdlib only:
   zlib-inflates PNG IDAT streams and reconstructs all five PNG filter
   types; de-pads BMP rows and normalizes bottom-up BGR to top-down
   RGB. Emits exact integer raster statistics (count/sum/xor plus a
   position-weighted sum that pins byte ORDER), so the whole decode is
   value-verifiable cross-engine (q301's oracle recomputes the expected
   raster closed-form from the synthesis parameters).
4. ``_real_decode`` — arbitrary-codec decode (JPEG/WebP/…), gated
   ``NotImplementedError`` until PIL exists in the environment.

Everything Spark-side — schema, batch shape, ``mapInPandas``
signature, partition sizing — is real and tested, so swapping tier 3
in is a one-function change.

Scale notes: binary payloads ride in the same parquet row-group as
their metadata; filters on metadata (width, mime, n_bytes) push down so
the scan never materializes payloads it won't decode. Decoding is
``mapInPandas`` (per-partition Arrow batches) — tune
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id long, payload binary, mime string, n_bytes long, checksum string"
)
FEATURE_SCHEMA = f"doc_id long, n_bytes long, feature array<double>"


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata —
    the shape an image/audio table would have. (In production the
    payload comes from the storage layer; here we synthesize it so the
    plumbing is exercised end-to-end.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def _real_decode(payload: bytes) -> list[float]:
    """The real decoder — requires an image library not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decode requires PIL/pillow, not available in this environment; "
            "use decode_image_features (deterministic stub) instead"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: k-strided byte
    means. Stable across runs; exercises the exact batch/shape contract
    a real extractor would have."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(sum(payload[i::FEATURE_DIM]) % 997) for i in range(FEATURE_DIM)
    ]


def synthesize_png(width: int, height: int) -> bytes:
    """A spec-valid 8-bit RGB PNG: signature, IHDR, one zlib IDAT of
    filter-0 scanlines with deterministic pixels, IEND — correct chunk
    lengths and CRCs throughout (stdlib only)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((x * 3 + y * 7) % 256 for x in range(width * 3))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synthesize_bmp(width: int, height: int) -> bytes:
    """A spec-valid 24-bit uncompressed BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-aligned rows of deterministic pixels."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    pixels = bytes(
        (y * stride + i) % 251 for y in range(height) for i in range(stride)
    )
    file_header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixels), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def parse_image_header(data: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Tier-2 real decode: (format, width, height, bit_depth) from the
    binary payload. PNG: signature + IHDR fields, with the IHDR CRC
    verified so truncated/corrupt payloads classify as unknown. BMP:
    BITMAPINFOHEADER fields (height may be negative = top-down; the
    magnitude is the pixel height). Anything else → ('unknown', NULLs)
    — never raises, bad rows are data, not errors."""
    import struct
    import zlib

    data = bytes(data or b"")
    if (
        len(data) >= 33
        and data[:8] == b"\x89PNG\r\n\x1a\n"
        and data[12:16] == b"IHDR"
    ):
        expect_crc = struct.unpack(">I", data[29:33])[0]
        if zlib.crc32(data[12:29]) & 0xFFFFFFFF == expect_crc:
            w, h = struct.unpack(">II", data[16:24])
            return ("png", w, h, data[24])
    if len(data) >= 30 and data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        bpp = struct.unpack("<H", data[28:30])[0]
        return ("bmp", w, abs(h), bpp)
    return ("unknown", None, None, None)


IMAGE_META_SCHEMA = (
    "doc_id long, format string, width int, height int, bit_depth int"
)


def synthesize_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table of REAL image files: odd ids get a PNG,
    even ids a BMP, dimensions derived from the id (width = id%13+1,
    height = id%7+1). mapInPandas because the PNG encoder needs zlib —
    this stands in for the storage layer that would supply payloads in
    production."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = [
                synthesize_png(i % 13 + 1, i % 7 + 1)
                if i % 2
                else synthesize_bmp(i % 13 + 1, i % 7 + 1)
                for i in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


def decode_image_headers(media: DataFrame) -> DataFrame:
    """Tier-2 decode over the media table: mapInPandas batches of
    binary payloads → parsed (format, width, height, bit_depth). The
    payload column is dropped at the Python boundary — only metadata
    crosses back."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "bit_depth": pd.array([p[3] for p in parsed], dtype="Int32"),
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def decode_png_raster(data: bytes) -> bytes | None:
    """Tier-3 real PNG decode (stdlib only): walk the chunk stream,
    zlib-inflate the concatenated IDAT payload, and reconstruct the
    scanlines through the full PNG filter set (None/Sub/Up/Average/
    Paeth — the complete 8-bit truecolor spec, not just the filter-0
    subset our synthesizer emits). Returns the top-down row-major RGB
    raster, or None for malformed payloads (bad magic, bad IHDR CRC,
    unsupported color type, inflate error, short raster) — bad rows are
    data, not errors."""
    import struct
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            return None
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and struct.unpack(">I", crc)[0] != (
            zlib.crc32(tag + body) & 0xFFFFFFFF
        ):
            return None
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, bit_depth, color_type, compression, filter_method, interlace = (
        struct.unpack(">IIBBBBB", ihdr[:13])
    )
    if bit_depth != 8 or color_type != 2 or w == 0 or h == 0:
        return None  # only 8-bit truecolor in scope (what we synthesize)
    if compression != 0 or filter_method != 0 or interlace != 0:
        # Adam7-interlaced (or exotic method) files are spec-legal but
        # out of scope — decoding them as sequential scanlines would
        # return a WRONG raster as if valid; classify unknown instead
        return None
    bpp, stride = 3, w * 3
    expect = h * (1 + stride)
    # cap the inflate at the raster size (+1 to detect overruns): a
    # decompression-bomb payload must not materialize gigabytes in a
    # path that promises "bad rows are data, never raise"
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expect + 1)
    except zlib.error:
        return None
    # strict both ways, mirroring the CRC checks: too little output is
    # truncation; excess output (len > expect), input still unconsumed
    # at the cap, or a stream that never reached its terminator is a
    # spec-invalid IDAT — don't silently decode its first `expect`
    # bytes as valid
    if len(raw) != expect or d.unconsumed_tail or d.unused_data or not d.eof:
        return None
    out = bytearray()
    prev = bytes(stride)
    for y in range(h):
        base = y * (1 + stride)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        out += line
        prev = line
    return bytes(out)


def decode_bmp_raster(data: bytes) -> bytes | None:
    """Tier-3 real BMP decode (24-bit uncompressed BITMAPINFOHEADER):
    strip headers and row padding and normalize the stored bottom-up
    BGR rows to the same top-down row-major RGB raster the PNG path
    produces (negative biHeight = already top-down, per spec). Returns
    None for malformed/unsupported payloads."""
    import struct

    if len(data) < 54 or data[:2] != b"BM":
        return None
    (pixel_off,) = struct.unpack("<I", data[10:14])
    header_size, w, h_raw = struct.unpack("<Iii", data[14:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if header_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        return None
    stride = ((w * 3 + 3) // 4) * 4
    pixels = data[pixel_off : pixel_off + stride * h]
    if len(pixels) < stride * h:
        return None
    out = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for row in rows:
        line = pixels[row * stride : row * stride + w * 3]
        for x in range(w):  # BGR -> RGB
            out += line[3 * x + 2 : 3 * x + 3]
            out += line[3 * x + 1 : 3 * x + 2]
            out += line[3 * x : 3 * x + 1]
    return bytes(out)


PIXEL_SCHEMA = (
    "doc_id long, format string, width int, height int, "
    "n_pixel_bytes long, byte_sum long, byte_xor long, pos_weighted_sum long"
)


def decode_image_pixels(media: DataFrame) -> DataFrame:
    """Tier-3 decode over the media table: mapInPandas batches of binary
    payloads → REAL decoded rasters (PNG: chunk walk + zlib inflate +
    filter reconstruction; BMP: de-pad + BGR/bottom-up normalization)
    reduced to exact integer statistics over the normalized top-down
    RGB byte stream:

    - ``n_pixel_bytes`` / ``byte_sum`` / ``byte_xor`` — content,
      order-independent;
    - ``pos_weighted_sum`` = Σ (i+1)·byteᵢ — pins the byte ORDER, so a
      decoder that got filter reconstruction or row direction wrong
      cannot match.

    Undecodable payloads emit ('unknown', NULL stats) — never raise.
    Only the fixed-width stats cross back over the Arrow boundary; the
    raster itself dies inside the batch (no payload amplification).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "format", "width", "height",
                "n_pixel_bytes", "byte_sum", "byte_xor", "pos_weighted_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                fmt, w, h, _ = parse_image_header(data)
                raster = None
                if fmt == "png":
                    raster = decode_png_raster(data)
                elif fmt == "bmp":
                    raster = decode_bmp_raster(data)
                out["doc_id"].append(doc_id)
                if raster is None:
                    out["format"].append("unknown")
                    for k in ("width", "height", "n_pixel_bytes", "byte_sum",
                              "byte_xor", "pos_weighted_sum"):
                        out[k].append(None)
                    continue
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixel_bytes"].append(len(raster))
                out["byte_sum"].append(sum(raster))
                x = 0
                for b in raster:
                    x ^= b
                out["byte_xor"].append(x)
                out["pos_weighted_sum"].append(
                    sum((i + 1) * b for i, b in enumerate(raster))
                )
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "format": out["format"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "n_pixel_bytes": pd.array(out["n_pixel_bytes"], dtype="Int64"),
                    "byte_sum": pd.array(out["byte_sum"], dtype="Int64"),
                    "byte_xor": pd.array(out["byte_xor"], dtype="Int64"),
                    "pos_weighted_sum": pd.array(out["pos_weighted_sum"], dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, schema=PIXEL_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary, n_bytes long"


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling plumbing: explode each binary payload
    into up to ``max_frames`` fixed-stride chunks (1 input row → N
    output rows — the exact shape a real video decoder produces, with
    the decode itself stubbed as byte-slicing since no codec libs exist
    in this container).

    Scale notes: the explode multiplies rows BEFORE the Python boundary
    is crossed again — downstream per-frame feature extraction batches
    over frames, not videos, so one 2-hour video can't skew a task.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                for idx in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[idx * every_n_bytes : (idx + 1) * every_n_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(chunk)
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def decode_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode: binary payload → fixed-dim feature vector.

    Batch contract: each Arrow batch arrives as a pandas DataFrame with
    the full media schema; we return only (doc_id, n_bytes, feature) so
    the heavy payload column is dropped as early as possible (column
    pruning at the Python boundary).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": pdf["payload"].map(_fake_features),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


AUDIO_FRAME_SCHEMA = "doc_id long, frame_idx int, n_samples long, energy long, peak long"


def audio_frame_energy(media: DataFrame, frame_bytes: int = 32) -> DataFrame:
    """Audio-style windowing plumbing: treat each binary payload as a
    PCM sample stream, split into fixed non-overlapping frames
    (ceil(len/frame_bytes) of them, last one partial), and emit exact
    integer per-frame statistics — sample count, energy (Σ unsigned
    byte values), peak. The real resample/filterbank step would slot in
    where the byte sums are (no audio libs in this container); the
    1→N frame fan-out, Arrow batch shape, and early payload drop are
    the production contract.

    Scale: frames multiply rows at the Python boundary exactly once;
    downstream per-frame work batches over frames so one long file
    can't skew a task. All statistics are exact integers → the whole
    Pandas-UDF path is value-verifiable cross-engine (q142).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "n_samples": [], "energy": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(n_frames):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_samples"].append(len(chunk))
                    out["energy"].append(sum(chunk))
                    out["peak"].append(max(chunk))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Tier-3b: GIF with a REAL LZW codec (r05 verdict item 9 — stdlib only).
# The synthesizer emits spec-valid GIF89a files (header, logical screen
# descriptor, 4-entry global color table, image descriptor, variable-
# width LSB-first LZW stream in 255-byte sub-blocks, trailer); the
# decoder walks the same container and runs a full GIF-LZW decompressor
# (code-width growth, CLEAR resets, the prev+first-char unseen-code
# case). The q394 oracle recomputes every decoded raster byte
# closed-form from the pixel/palette formulas, so a MATCH certifies the
# actual LZW round trip. The bit packing is anchored to the spec by a
# hand-computed bitstream vector in tests/test_gif.py, not just by
# encoder/decoder self-consistency.

_GIF_NCOLORS = 4  # min LZW code size 2 — width growth kicks in early


def _gif_palette(i: int) -> tuple[int, int, int]:
    return ((i * 53 + 11) % 256, (i * 97 + 23) % 256, (i * 193 + 47) % 256)


def _gif_pixel(x: int, y: int) -> int:
    return (x * 5 + y * 11) % _GIF_NCOLORS


def _lzw_encode(pixels: list[int], min_code: int = 2) -> bytes:
    """GIF-variant LZW: variable code width starting min_code+1,
    LSB-first bit packing, CLEAR emitted up front and again on table
    overflow (4096)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return {(i,): i for i in range(1 << min_code)}, eoi + 1, min_code + 1

    table, next_free, width = fresh()
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for s in pixels:
        cand = seq + (s,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_free
        next_free += 1
        # the NEXT emitted code may reference any entry < next_free:
        # widen as soon as next_free exceeds the current width's range
        if next_free > (1 << width) and width < 12:
            width += 1
        seq = (s,)
        if next_free == 4096:
            emit(clear, width)
            table, next_free, width = fresh()
    if seq:
        emit(table[seq], width)
        # the decoder appends a table entry after this final code too
        # (it cannot know EOI follows) — mirror its growth check or the
        # EOI is written one bit narrower than the decoder reads it
        next_free += 1
        if next_free > (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int = 2) -> list[int] | None:
    """Full GIF-LZW decompression (inverse of _lzw_encode, but written
    against the spec: handles the unseen-code prev+prev[0] case and
    CLEAR resets). Returns None on malformed streams (code beyond
    table, missing EOI)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    pos = 0
    bitbuf = 0
    nbits = 0
    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = min_code + 1
    prev: tuple[int, ...] | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [(i,) for i in range(1 << min_code)] + [(), ()]
        width = min_code + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                return None  # ran out of bits before EOI
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or code >= clear:
                return None  # first code must be a literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)  # the KwKwK case
            table.append(entry)
        else:
            return None  # code beyond table: corrupt stream
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry


def synthesize_gif(width: int, height: int) -> bytes:
    """A spec-valid GIF89a: 4-color global table from _gif_palette,
    pixel indices from _gif_pixel, REAL LZW-compressed raster in
    255-byte sub-blocks."""
    import struct

    gct = b"".join(bytes(_gif_palette(i)) for i in range(_GIF_NCOLORS))
    # packed: GCT present (0x80) | color resolution 1 (0x10) | GCT size
    # 2^(1+1)=4 entries (0x01)
    lsd = struct.pack("<HHBBB", width, height, 0x91, 0, 0)
    img_desc = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    pixels = [_gif_pixel(x, y) for y in range(height) for x in range(width)]
    lzw = _lzw_encode(pixels)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"GIF89a" + lsd + gct + img_desc + bytes([2]) + bytes(blocks) + b"\x3B"


def decode_gif_raster(data: bytes) -> bytes | None:
    """Tier-3b real GIF decode (stdlib only): validate the container,
    read the global color table, reassemble the LZW stream from its
    sub-blocks, decompress, and palette-map to the top-down row-major
    RGB raster. Returns None for malformed payloads (bad signature,
    truncated structures, interlaced or locally-tabled images we never
    emit, LZW stream errors, pixel-count mismatch)."""
    import struct

    if len(data) < 13 or data[:6] not in (b"GIF89a", b"GIF87a"):
        return None
    width, height, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if not packed & 0x80:
        return None  # no global color table
    ncol = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * ncol > len(data):
        return None
    palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(ncol)]
    pos += 3 * ncol
    if pos >= len(data) or data[pos] != 0x2C:
        return None  # extensions unsupported (never emitted)
    if pos + 10 > len(data):
        return None
    _, left, top, iw, ih, ipacked = struct.unpack("<BHHHHB", data[pos : pos + 10])
    pos += 10
    if (left, top) != (0, 0) or (iw, ih) != (width, height) or ipacked & 0xC0:
        return None  # offset/interlace/local-table: not ours
    if pos >= len(data):
        return None
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        return None
    lzw = bytearray()
    while True:
        if pos >= len(data):
            return None
        n = data[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(data):
            return None
        lzw += data[pos : pos + n]
        pos += n
    if pos >= len(data) or data[pos] != 0x3B:
        return None  # missing trailer
    indices = _lzw_decode(bytes(lzw), min_code)
    if indices is None or len(indices) != width * height:
        return None
    if any(i >= ncol for i in indices):
        return None
    raster = bytearray()
    for i in indices:
        raster += bytes(palette[i])
    return bytes(raster)


def synthesize_gifs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table of REAL GIF files: width = id%11+1,
    height = id%5+1 (different dimension formulas than the PNG/BMP
    family so the two tiers can't mask each other)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].tolist()
            payloads = [synthesize_gif(i % 11 + 1, i % 5 + 1) for i in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(id_col).mapInPandas(batches, schema="doc_id long, payload binary")


GIF_PIXEL_SCHEMA = (
    "doc_id long, width int, height int, n_raster_bytes long, "
    "byte_sum long, byte_xor long, pos_weighted_sum long"
)


def decode_gif_pixels(media: DataFrame) -> DataFrame:
    """Tier-3b decode over the media table: real LZW decompression per
    payload, reduced to the q301-style exact integer stats (count /
    sum / xor / position-weighted sum — the last pins byte order, so a
    wrong code-width rule or palette order cannot match). Undecodable
    payloads emit NULL stats; only fixed-width integers cross the
    Arrow boundary back."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "n_raster_bytes",
                "byte_sum", "byte_xor", "pos_weighted_sum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload or b"")
                raster = decode_gif_raster(data)
                out["doc_id"].append(doc_id)
                if raster is None:
                    for k in ("width", "height", "n_raster_bytes", "byte_sum",
                              "byte_xor", "pos_weighted_sum"):
                        out[k].append(None)
                    continue
                import struct

                w, h = struct.unpack("<HH", data[6:10])
                out["width"].append(w)
                out["height"].append(h)
                out["n_raster_bytes"].append(len(raster))
                out["byte_sum"].append(sum(raster))
                x = 0
                for b in raster:
                    x ^= b
                out["byte_xor"].append(x)
                out["pos_weighted_sum"].append(
                    sum((i + 1) * b for i, b in enumerate(raster))
                )
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "n_raster_bytes": pd.array(out["n_raster_bytes"], dtype="Int64"),
                    "byte_sum": pd.array(out["byte_sum"], dtype="Int64"),
                    "byte_xor": pd.array(out["byte_xor"], dtype="Int64"),
                    "pos_weighted_sum": pd.array(out["pos_weighted_sum"], dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, schema=GIF_PIXEL_SCHEMA)
