"""Multimodal column plumbing: opaque binary payloads + typed metadata.

At 100 TB, image/audio/video ride along as ``binary`` columns with a typed
metadata struct; decode and feature extraction run as Arrow-batched
``mapInPandas`` stages so the (large) payload bytes never round-trip
through per-row Python pickling. The decode step itself is STUBBED here —
the sandbox ships no image/audio codecs — behind ``decode_image``:
``NotImplementedError`` by default, a deterministic fake in tests. The
Spark-side plumbing (schema, Arrow batch shape, partition flow, feature
extraction over real bytes) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAYLOAD_SCHEMA = (
    "id long, payload binary, meta struct<modality: string, n_bytes: long>"
)
MULTI_PAYLOAD_SCHEMA = (
    "id long, payload binary, meta struct<modality: string, n_bytes: long, "
    "sample_rate: long, n_frames: long>"
)
FEATURE_SCHEMA = "id long, n_bytes long, first_byte long, header_ok boolean"

_MAGIC = b"GPMM"  # fake container header for the deterministic payloads


def with_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach a deterministic binary payload column derived from the text
    (header + UTF-8 bytes) plus a typed metadata struct.

    Stand-in for reading real image/audio bytes from a blob store column;
    derivation is a JVM-side projection (concat/encode), no Python.
    """
    payload = F.concat(F.lit(_MAGIC), F.encode(F.col(text_col), "UTF-8"))
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/fake").alias("modality"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def with_multimodal_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Like ``with_payload`` but with a three-way modality mix (image /
    audio / video by id mod 3) and the typed per-modality metadata a real
    multimodal table carries: audio rows get a sample_rate and video rows a
    frame count; fields that don't apply are null. Pure JVM projection."""
    payload = F.concat(F.lit(_MAGIC), F.encode(F.col(text_col), "UTF-8"))
    m = F.pmod(F.col(id_col).cast("long"), F.lit(3))
    modality = (
        F.when(m == 0, F.lit("image")).when(m == 1, F.lit("audio")).otherwise(F.lit("video"))
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.when(m == 1, F.lit(16000)).cast("long").alias("sample_rate"),
            F.when(m == 2, F.lit(4)).cast("long").alias("n_frames"),
        ).alias("meta"),
    )


def audio_features(payloads: DataFrame) -> DataFrame:
    """Fake-PCM audio feature stage: the payload body (after the container
    header) is interpreted as little-endian int16 samples — a deterministic
    stand-in for a real audio decode, with the REAL distributed shape: Arrow
    binary batches into vectorized numpy, no per-row Python in the math.

    Returns (id, n_samples, amp_sum) with amp_sum = Σ|sample| — integers a
    local recompute can match exactly."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ns, amps = [], []
            for b in pdf["payload"]:
                body = bytes(b)[len(_MAGIC):]
                pcm = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2")
                ns.append(len(pcm))
                amps.append(int(np.abs(pcm.astype(np.int64)).sum()))
            yield pd.DataFrame(
                {"id": pdf["id"].astype("int64"), "n_samples": ns, "amp_sum": amps}
            )

    return payloads.select("id", "payload").mapInPandas(
        stage, "id long, n_samples long, amp_sum long"
    )


def video_frame_features(
    payloads: DataFrame, n_frames: int = 4, fake: bool = False
) -> DataFrame:
    """Video path plumbing: frame-sample (stubbed decode per frame) → resize
    → per-clip pixel sums across the sampled frames. Same Arrow-batched
    mapInPandas shape a real ffmpeg-backed stage would use."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sums, frames = [], []
            for b in pdf["payload"]:
                fs = frame_sample(bytes(b), n_frames=n_frames, fake=fake)
                px = sum(int(resize_image(f, 8, 8).astype(np.int64).sum()) for f in fs)
                sums.append(px)
                frames.append(len(fs))
            yield pd.DataFrame(
                {"id": pdf["id"].astype("int64"), "n_frames": frames, "px_sum": sums}
            )

    return payloads.select("id", "payload").mapInPandas(
        stage, "id long, n_frames long, px_sum long"
    )


def extract_binary_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Features are intentionally simple (length, first content byte, header
    check) so the DuckDB oracle can recompute them from the source text —
    what is being exercised is the real distributed plumbing: Arrow binary
    transfer, batch iteration, vectorized numpy over buffers.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = pdf["payload"]
            n_bytes = raw.str.len().astype("int64")
            header_ok = raw.apply(lambda b: bytes(b[:4]) == _MAGIC)

            def _first_codepoint(b) -> int:
                # first CHARACTER's codepoint, not the first UTF-8 byte:
                # the oracle (and any text-side consumer) sees codepoints,
                # and for a multi-byte leading char the raw byte (0xC3 for
                # 'é') diverges from the codepoint (233). 0 for empty,
                # matching ascii('') in both SQL dialects.
                body = bytes(b[4:8]).decode("utf-8", errors="ignore")
                return ord(body[0]) if body else 0

            first = raw.apply(_first_codepoint).astype("int64")
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "header_ok": header_ok,
                }
            )

    return payloads.select("id", "payload").mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an (h, w, 3) uint8 array.

    The sandbox has no codec libraries: without ``fake=True`` this raises
    ``NotImplementedError`` (clearly-marked stub per the build contract).
    With ``fake=True`` it derives a deterministic 8×8 RGB tile from the
    payload bytes so downstream plumbing (resize, feature-extract, batch
    shapes) is testable end to end.
    """
    try:  # pragma: no cover - codec not present in this environment
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode is intentionally not wired in this build"
        )
    except ImportError:
        pass
    if not fake:
        raise NotImplementedError(
            "no image codec available in this environment; pass fake=True "
            "for the deterministic test tile"
        )
    h = np.frombuffer(payload, dtype=np.uint8)
    seed = int(h.sum() % 251) if len(h) else 0
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def frame_sample(payload: bytes, n_frames: int = 4, fake: bool = False) -> list[np.ndarray]:
    """Sample n deterministic 'frames' from a fake video payload (stub)."""
    return [decode_image(payload + bytes([i]), fake=fake) for i in range(n_frames)]


def resize_image(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy — REAL (not a stub): index-gather
    on the decoded (H, W[, C]) array, no codec needed."""
    if img.ndim not in (2, 3):
        raise ValueError(f"expected (H, W[, C]) array, got shape {img.shape}")
    rows = (np.arange(h) * img.shape[0] // h).astype(np.intp)
    cols = (np.arange(w) * img.shape[1] // w).astype(np.intp)
    return img[rows][:, cols]


def decode_resize_features(
    payloads: DataFrame, h: int = 8, w: int = 8, fake: bool = False
) -> DataFrame:
    """The full image-pipeline plumbing in one Arrow-batched mapInPandas
    stage: decode (stubbed) → resize (real numpy) → per-image features
    (mean/std over the resized pixels, exact ints via sums).

    Returns (id, height, width, px_sum, px_sq_sum) — integer outputs so a
    test (or oracle) can recompute them exactly from the payload bytes.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {"id": pdf["id"].astype("int64"), "height": [], "width": [],
                   "px_sum": [], "px_sq_sum": []}
            for b in pdf["payload"]:
                img = resize_image(decode_image(bytes(b), fake=fake), h, w)
                px = img.astype(np.int64)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["px_sum"].append(int(px.sum()))
                out["px_sq_sum"].append(int((px * px).sum()))
            yield pd.DataFrame(out)

    return payloads.select("id", "payload").mapInPandas(
        stage, "id long, height long, width long, px_sum long, px_sq_sum long"
    )
