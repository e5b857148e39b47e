"""Multimodal column plumbing: binary payloads + typed metadata, Arrow
batches end-to-end.

Design (SURVEY.md north-star): media is an opaque ``binary`` column with a
metadata struct (modality, format, width/height/duration...). Decode /
feature-extract / resize / frame-sample run as ``mapInPandas`` stages —
Arrow delivers each partition as pandas batches, the UDF returns an
iterator of frames, and Spark never materializes more than
``maxRecordsPerBatch`` payloads at once. At 100 TB the parallelism axis is
rows (documents), so these stages scale linearly with executors; keep
payloads out of shuffle keys and only ever shuffle extracted features.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
``decode_media`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic byte-histogram "decoder" — the Spark-side
schema, batching, and partitioning are real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, format string, payload binary, "
    "meta_width int, meta_height int, meta_duration_s double"
)

FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, feature array<double>"
)


def attach_media_from_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a media-shaped table from the documents fixture: utf-8 bytes
    of the text play the role of the encoded payload (the container ships
    no real images). Deterministic, so tests can assert exact features."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("fake/utf8").alias("format"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.length(F.col(text_col)).cast("int").alias("meta_width"),
        F.lit(1).alias("meta_height"),
        F.lit(None).cast("double").alias("meta_duration_s"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: 16-bin byte histogram,
    L1-normalized. Replace with PIL/ffmpeg decode in a real deployment."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(float)
    total = hist.sum()
    return hist / total if total else hist


def decode_media(
    df: DataFrame,
    fake: bool = False,
    batch_feature_dim: int = 16,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    Real codecs are unavailable here: ``fake=False`` raises
    NotImplementedError AT PLAN TIME (not per-row inside executors, where
    it would surface as a storm of task failures).
    """
    if not fake:
        raise NotImplementedError(
            "no media codecs in this environment; pass fake=True for the "
            "deterministic byte-histogram decoder (plumbing is identical)"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if isinstance(p, bytes) else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p if isinstance(p, bytes) else bytes(p))
                        for p in pdf["payload"]
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta_width int, meta_height int"
)


def resize_media(
    df: DataFrame, width: int = 8, height: int = 8, fake: bool = False
) -> DataFrame:
    """mapInPandas resize stage: payload in → resized payload out, with
    updated metadata. Like ``decode_media``, the real codec path refuses
    at PLAN time; ``fake=True`` runs a deterministic stand-in (treat the
    payload as a row-major byte raster of its metadata dimensions and
    mean-pool into the target grid) so schema, batching, and output
    payload sizing are exercised for real. Output payloads are exactly
    ``width*height`` bytes — the property downstream batch sizing relies
    on."""
    if not fake:
        raise NotImplementedError(
            "no media codecs in this environment; pass fake=True for the "
            "deterministic mean-pool resizer (plumbing is identical)"
        )

    def _pool(payload: bytes, w0: int, h0: int) -> bytes:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        n = w0 * h0
        if arr.size < n or n <= 0:  # pad ragged/empty payloads
            arr = np.pad(arr, (0, max(n - arr.size, 0)))
            if n <= 0:
                w0, h0, n = 1, 1, 1
                arr = arr[:1] if arr.size else np.zeros(1)
        img = arr[:n].reshape(h0, w0)
        # mean-pool via bucketed bincount — no per-pixel Python loop
        ri = np.minimum((np.arange(h0) * height) // max(h0, 1), height - 1)
        ci = np.minimum((np.arange(w0) * width) // max(w0, 1), width - 1)
        flat = (ri[:, None] * width + ci[None, :]).ravel()
        sums = np.bincount(flat, weights=img.ravel(), minlength=width * height)
        cnts = np.maximum(np.bincount(flat, minlength=width * height), 1)
        # floor(x + 0.5) (round-half-up), not np.round (half-even): the
        # SQL restatement of this stub (q_multimodal_resize oracle) uses
        # floor(avg + 0.5), and the two must agree byte-for-byte
        return np.floor(sums / cnts + 0.5).astype(np.uint8).tobytes()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _pool(
                    p if isinstance(p, bytes) else bytes(p),
                    int(w) if pd.notna(w) and int(w) > 0 else len(p),
                    int(h) if pd.notna(h) and int(h) > 0 else 1,
                )
                for p, w, h in zip(
                    pdf["payload"], pdf["meta_width"], pdf["meta_height"]
                )
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return df.mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video-style frame sampling stub over the payload: emit one row per
    sampled "frame" offset (posexplode of a JVM-computed offset sequence —
    the fan-out happens relationally, not in Python)."""
    offsets = F.slice(
        F.sequence(
            F.lit(0),
            F.greatest(F.length("payload") - 1, F.lit(0)),
            F.lit(every_n_bytes),
        ),
        1,
        max_frames,
    )
    return df.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
