"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``binary`` columns travelling next to
typed metadata; all transformations are Arrow-batched ``mapInPandas``
kernels so the Spark-side plumbing (schema, partition sizing, UDF
signature, batch shape) is identical to what a real decoder would use.
The actual codec step is STUBBED — image/audio libraries are not in
this environment — behind ``decoder=`` hooks: the default raises
``NotImplementedError``; ``decoder="fake"`` substitutes a deterministic
byte-histogram feature so the pipeline is testable end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing table (deterministic, no external libs)
_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav-or-avi"),
    (b"ID3", "audio/mp3"),
    (b"\x1aE\xdf\xa3", "video/webm"),
    (b"\x00\x00\x00", "video/mp4-ish"),
]


def sniff_type(data: bytes | None) -> str:
    if not data:
        return "empty"
    for magic, label in _MAGIC:
        if data[: len(magic)] == magic:
            return label
    return "application/octet-stream"


def binary_meta(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """Typed metadata for a binary media column.

    Columns: id, n_bytes, sha1, sha256, sniffed_type. One Arrow pass;
    bytes never leave the executor."""

    def _meta(pdf_iter):
        for pdf in pdf_iter:
            datas = pdf["data"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": [len(d) if d is not None else 0 for d in datas],
                    "sha1": [
                        hashlib.sha1(d).hexdigest() if d is not None else "" for d in datas
                    ],
                    "sha256": [
                        hashlib.sha256(d).hexdigest() if d is not None else "" for d in datas
                    ],
                    "sniffed_type": [sniff_type(d) for d in datas],
                }
            )

    src = df.select(F.col(id_col).alias("id"), F.col(data_col).alias("data"))
    return src.mapInPandas(
        _meta, schema="id long, n_bytes long, sha1 string, sha256 string, sniffed_type string"
    )


def _fake_decode_features(data: bytes, n_bins: int = 8) -> list[float]:
    """Deterministic stand-in for image decode + feature extraction:
    normalized byte-value histogram. Same shape/contract as a real
    embedding head."""
    if not data:
        return [0.0] * n_bins
    arr = np.frombuffer(data, dtype=np.uint8)
    # bin index = value * n_bins / 256 — for n_bins=8 this is exactly
    # the historical (arr >> 5), and it stays length-correct for any
    # n_bins (a hardcoded shift returned 8 bins regardless)
    idx = (arr.astype(np.int32) * n_bins) >> 8
    hist = np.bincount(idx, minlength=n_bins).astype(np.float64)
    return list(hist / hist.sum())


def _pillow_decode_features(data: bytes, n_bins: int = 8) -> list[float]:
    """Real image decode path (used when Pillow is importable): decode,
    convert to grayscale, and emit the normalized pixel-intensity
    histogram — same shape/contract as the fake byte-histogram, so the
    Spark plumbing (schema, batching, partitioning) is identical."""
    import io

    from PIL import Image

    if not data:
        return [0.0] * n_bins
    try:
        with Image.open(io.BytesIO(data)) as im:
            arr = np.asarray(im.convert("L"), dtype=np.uint8).ravel()
    except Exception:  # undecodable payload -> zero vector, not a crash
        return [0.0] * n_bins
    if arr.size == 0:
        return [0.0] * n_bins
    idx = (arr.astype(np.int32) * n_bins) >> 8
    hist = np.bincount(idx, minlength=n_bins).astype(np.float64)
    return list(hist / hist.sum())


def _resolve_decoder(decoder: str) -> str:
    """``auto`` probes for a real codec library at runtime and falls back
    to the loud stub when none is present — the stub stays the honest
    default, but an environment WITH Pillow gets real decoding without a
    code change (VERDICT r3 next#10)."""
    if decoder != "auto":
        return decoder
    try:
        import PIL.Image  # noqa: F401
        return "pillow"
    except ImportError:
        return "stub"


def decode_features(
    df: DataFrame, id_col: str, data_col: str, *, decoder: str = "stub", n_bins: int = 8
) -> DataFrame:
    """Decode + feature-extract a media column -> (id, features array).

    ``decoder="stub"`` raises NotImplementedError (real image/audio libs
    are not available in this environment); ``decoder="fake"`` produces
    the deterministic byte-histogram feature for pipeline testing;
    ``decoder="auto"`` resolves to the real Pillow path when the library
    is importable and the stub otherwise; ``decoder="pillow"`` forces
    the real path (ImportError if absent).
    """
    decoder = _resolve_decoder(decoder)
    if decoder == "stub":
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in "
            "this environment; use decoder='fake' for the deterministic test path"
        )
    if decoder == "pillow":
        import PIL.Image  # noqa: F401 - fail on the driver, not in tasks
        kernel = _pillow_decode_features
    elif decoder == "fake":
        kernel = _fake_decode_features
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    def _decode(pdf_iter):
        for pdf in pdf_iter:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "features": [kernel(d, n_bins) for d in pdf["data"]],
                }
            )

    src = df.select(F.col(id_col).alias("id"), F.col(data_col).alias("data"))
    return src.mapInPandas(_decode, schema="id long, features array<double>")


def frame_sample(
    df: DataFrame, id_col: str, data_col: str, *, frame_bytes: int = 1024, every: int = 4
) -> DataFrame:
    """Deterministic frame sampling for "video" payloads: treat the byte
    stream as fixed-size frames, keep every ``every``-th. Real frame
    decoding is stubbed the same way as ``decode_features``; the
    partition/fan-out shape (one row per sampled frame) is the real one.

    Columns: id, frame_no, frame (binary)."""

    def _sample(pdf_iter):
        for pdf in pdf_iter:
            ids, frame_nos, frames = [], [], []
            for doc_id, data in zip(pdf["id"], pdf["data"]):
                if data is None:
                    continue
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_frames, every):
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    frames.append(bytes(data[fno * frame_bytes : (fno + 1) * frame_bytes]))
            yield pd.DataFrame({"id": ids, "frame_no": frame_nos, "frame": frames})

    src = df.select(F.col(id_col).alias("id"), F.col(data_col).alias("data"))
    return src.mapInPandas(_sample, schema="id long, frame_no int, frame binary")
