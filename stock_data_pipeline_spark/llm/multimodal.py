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
3. ``_real_decode`` — full pixel decode, gated ``NotImplementedError``
   until PIL exists in the environment.

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
