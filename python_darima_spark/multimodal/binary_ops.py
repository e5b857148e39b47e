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
