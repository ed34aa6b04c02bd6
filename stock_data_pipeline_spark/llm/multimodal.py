"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (this container has no image/audio
libraries): ``decode_image_features`` produces deterministic fake
features derived from the payload bytes, and the real decoder raises
``NotImplementedError`` behind an import-try. Everything Spark-side —
schema, batch shape, ``mapInPandas`` signature, partition sizing — is
real and tested, so swapping in a real decoder is a one-function change.

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
