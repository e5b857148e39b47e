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

Codec support: PNG decode/encode (round 4), baseline JPEG
decode/encode (round 10: greyscale, 4:4:4 and 4:2:0 color, restart
segments) and RIFF/WAVE PCM (round 10) are REAL and dependency-free
(stdlib + numpy, multimodal/codecs.py), so ``decode_media`` /
``resize_media`` / ``wav_frame_energy`` run genuinely on
``image/png``, ``image/jpeg`` and ``audio/wav`` payloads in this
container — and AVI video (uncompressed DIB or MJPG, the latter
decoding each frame through the vendored JPEG codec) via
``attach_avi_from_text`` / ``video_frame_sample``. Other formats (WebP/…, and the narrow JPEG features the
vendored decoders still refuse — e.g. 12-bit) use Pillow WHEN
IMPORTABLE;
declaring them without PIL present refuses at PLAN time — the honest
capability guard the fake path always had. ``fake=True`` keeps the
deterministic byte-histogram stand-in used by the hash-checked oracles.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HAS_PIL = importlib.util.find_spec("PIL") is not None


def _supported_formats() -> set[str]:
    # PNG, JPEG (baseline + progressive) and BMP always (vendored
    # clean-room codecs); everything else only through Pillow
    return {"image/png", "image/jpeg", "image/bmp"} if not _HAS_PIL else {
        "image/png", "image/jpeg", "image/webp", "image/bmp", "image/gif",
    }


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """Real decode: vendored codecs for image/png and baseline
    image/jpeg, Pillow otherwise (and as the fallback for JPEG features
    the vendored decoder honestly refuses — progressive, color).
    Returns a uint8 array (h, w) or (h, w, ch)."""
    if fmt == "image/png":
        from python_darima_spark.multimodal.codecs import png_decode

        return png_decode(payload)
    if fmt == "image/bmp":
        from python_darima_spark.multimodal.codecs import bmp_decode

        try:
            return bmp_decode(payload)
        except NotImplementedError:
            if not _HAS_PIL:
                raise
    if fmt == "image/jpeg":
        from python_darima_spark.multimodal.codecs import jpeg_decode

        try:
            return jpeg_decode(payload)  # dispatches SOF0/SOF2
        except NotImplementedError:
            if not _HAS_PIL:
                raise
    import io

    from PIL import Image  # guarded by _supported_formats at plan time

    return np.asarray(Image.open(io.BytesIO(payload)))

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
    formats: tuple[str, ...] = ("image/png",),
) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    ``fake=True``: deterministic byte-histogram stand-in over the raw
    payload (the hash-checked oracle contract; n_bytes = payload bytes).

    ``fake=False``: REAL decode. ``formats`` declares what the payloads
    contain; any declared format without an available codec refuses AT
    PLAN TIME (not per-row inside executors, where it would surface as a
    storm of task failures) — PNG and baseline JPEG are always available
    via the vendored codecs, other image formats require Pillow. The
    feature is the same
    16-bin L1-normalized histogram, computed over DECODED PIXEL bytes
    (n_bytes = decoded sample count), so for a losslessly encoded raster
    real-decode features provably equal the raw-byte features — the
    q_multimodal_decode_real oracle exploits exactly this.
    """
    if not fake:
        missing = sorted(set(formats) - _supported_formats())
        if missing:
            raise NotImplementedError(
                f"no codec for {missing} in this environment "
                f"(PIL importable: {_HAS_PIL}); PNG is always supported, "
                "or pass fake=True for the byte-histogram stand-in"
            )
        declared = set(formats)

        def extract_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {"media_id": [], "modality": [], "n_bytes": [], "feature": []}
                for mid, mod, fmt, p in zip(
                    pdf["media_id"], pdf["modality"], pdf["format"], pdf["payload"]
                ):
                    if fmt not in declared:
                        raise ValueError(
                            f"media {mid}: format {fmt!r} not in the declared "
                            f"set {sorted(declared)} — declare it in formats="
                        )
                    img = _decode_image(
                        p if isinstance(p, bytes) else bytes(p), fmt
                    )
                    px = img.reshape(-1)
                    hist = np.bincount(px >> 4, minlength=16).astype(float)
                    total = hist.sum()
                    rows["media_id"].append(mid)
                    rows["modality"].append(mod)
                    rows["n_bytes"].append(int(px.size))
                    rows["feature"].append(
                        (hist / total if total else hist).tolist()
                    )
                yield pd.DataFrame(rows)

        return df.mapInPandas(extract_real, FEATURE_SCHEMA)

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


def attach_png_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    interlace: bool = False,
) -> DataFrame:
    """Media table with REAL ``image/png`` payloads: each doc's utf-8
    bytes become a greyscale raster encoded through the stdlib PNG
    codec inside an Arrow ``mapInPandas`` stage — genuine encoded bytes
    (signature, CRCs, DEFLATE), not a fake. Because the encode is
    lossless, decoded pixels equal the original text bytes, which is
    what makes a real decode stage SQL-oracle-checkable.
    ``interlace=True`` writes Adam7 streams (the byte row tiled 8
    rows deep so all seven pass grids are non-trivially populated,
    and the normalized histogram is unchanged)."""
    from python_darima_spark.multimodal.codecs import png_encode

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"  # PNG cannot encode a 0×0 image
                arr = np.frombuffer(b, dtype=np.uint8)
                if interlace:
                    # stack 8 IDENTICAL rows so every Adam7 pass grid
                    # carries real pixels while the normalized pixel
                    # histogram stays exactly the text-byte histogram
                    arr = np.tile(arr[None, :], (8, 1))
                else:
                    arr = arr[None, :]
                payloads.append(png_encode(arr, interlace=interlace))
                widths.append(arr.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image",
                    "format": "image/png",
                    "payload": payloads,
                    "meta_width": widths,
                    "meta_height": 8 if interlace else 1,
                    "meta_duration_s": None,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)


def attach_jpeg_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    progressive: bool = False,
) -> DataFrame:
    """Media table with REAL ``image/jpeg`` payloads: each byte of a
    doc's utf-8 text becomes one FLAT 8×8 block of a greyscale baseline
    JPEG (image is 8 × 8n), encoded through the vendored T.81 codec
    inside an Arrow ``mapInPandas`` stage — genuine markers, huffman
    entropy data, byte stuffing. JPEG is lossy in general, but a flat
    block holds ONLY a DC coefficient and the default table's DC step
    (8) divides S00 = 8·(v−128) exactly, so the decode reproduces every
    block's value EXACTLY — each text byte comes back 64 times, which
    keeps the real-decode stage SQL-oracle-checkable corpus-wide (the
    lossy AC paths are certified separately in tests/test_codecs.py)."""
    from python_darima_spark.multimodal.codecs import (
        jpeg_encode_baseline,
        jpeg_encode_progressive,
    )

    enc_fn = (
        (lambda a: jpeg_encode_progressive(a, dc_al=1, ac_al=1))
        if progressive
        else jpeg_encode_baseline
    )

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"
                arr = np.frombuffer(b, dtype=np.uint8)
                img = np.repeat(np.repeat(arr[None, :], 8, 0), 8, 1)
                payloads.append(enc_fn(img))
                widths.append(img.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image",
                    "format": "image/jpeg",
                    "payload": payloads,
                    "meta_width": widths,
                    "meta_height": 8,
                    "meta_duration_s": None,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)


def attach_jpeg_rgb_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    subsample: str = "444",
    restart_interval: int = 0,
) -> DataFrame:
    """COLOR variant of :func:`attach_jpeg_from_text`: each text byte
    becomes one flat 8×8 block of a grey RGB raster (R=G=B=v), encoded
    as a genuine 3-component interleaved baseline JPEG. Grey RGB
    converts to (Y=v, Cb=Cr=128) exactly after rounding, neutral-chroma
    flat blocks reconstruct exactly (DC-only in all three components,
    steps divide), and the inverse color transform at Cb=Cr=128 is the
    identity — so the decoded RGB pixels are each text byte ×192 and
    the color decode path stays SQL-oracle-checkable corpus-wide.

    ``subsample="420"`` emits 2×2-subsampled chroma (box-mean keeps
    neutral chroma at exactly 128, and replication upsampling restores
    it, so the exactness window survives subsampling untouched);
    ``restart_interval=N`` inserts DRI/RSTn restart segments every N
    MCUs (lossless wire feature — predictor resets + byte alignment)."""
    from python_darima_spark.multimodal.codecs import jpeg_encode_baseline

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"
                arr = np.frombuffer(b, dtype=np.uint8)
                gray = np.repeat(np.repeat(arr[None, :], 8, 0), 8, 1)
                rgb = np.stack([gray, gray, gray], axis=-1)
                payloads.append(
                    jpeg_encode_baseline(
                        rgb,
                        subsample=subsample,
                        restart_interval=restart_interval,
                    )
                )
                widths.append(gray.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image",
                    "format": "image/jpeg",
                    "payload": payloads,
                    "meta_width": widths,
                    "meta_height": 8,
                    "meta_duration_s": None,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "meta_width int, meta_height int"
)


def _pool_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Area-mean-pool a decoded raster to (height, width), per channel,
    round-half-up — the same arithmetic as the fake path's byte pooling
    so both are SQL-restatable."""
    if img.ndim == 2:
        img = img[:, :, None]
    h0, w0, ch = img.shape
    ri = np.minimum((np.arange(h0) * height) // max(h0, 1), height - 1)
    ci = np.minimum((np.arange(w0) * width) // max(w0, 1), width - 1)
    flat = (ri[:, None] * width + ci[None, :]).ravel()
    cnts = np.maximum(np.bincount(flat, minlength=width * height), 1)
    out = np.empty((height * width, ch), dtype=np.uint8)
    for c in range(ch):
        sums = np.bincount(
            flat, weights=img[:, :, c].ravel().astype(float),
            minlength=width * height,
        )
        out[:, c] = np.floor(sums / cnts + 0.5).astype(np.uint8)
    res = out.reshape(height, width, ch)
    return res[:, :, 0] if ch == 1 else res


def resize_media(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    fake: bool = False,
    formats: tuple[str, ...] = ("image/png",),
) -> DataFrame:
    """mapInPandas resize stage: payload in → resized payload out, with
    updated metadata.

    ``fake=False`` (round-4): REAL decode → area-mean-pool → re-encode
    through the stdlib PNG codec (Pillow formats when importable;
    undecodable declared formats refuse at PLAN time, same guard as
    ``decode_media``). Output payloads are real PNGs of exactly
    (height, width).

    ``fake=True``: deterministic stand-in (treat the payload as a
    row-major byte raster of its metadata dimensions and mean-pool into
    the target grid) so schema, batching, and output payload sizing are
    exercised identically; output payloads are exactly ``width*height``
    raw bytes — the property the hash-checked oracle restates."""
    if not fake:
        missing = sorted(set(formats) - _supported_formats())
        if missing:
            raise NotImplementedError(
                f"no codec for {missing} in this environment "
                f"(PIL importable: {_HAS_PIL}); PNG is always supported, "
                "or pass fake=True for the raw-raster stand-in"
            )
        from python_darima_spark.multimodal.codecs import png_encode

        declared = set(formats)

        def resize_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = []
                for mid, fmt, p in zip(
                    pdf["media_id"], pdf["format"], pdf["payload"]
                ):
                    if fmt not in declared:
                        raise ValueError(
                            f"media {mid}: format {fmt!r} not declared"
                        )
                    img = _decode_image(
                        p if isinstance(p, bytes) else bytes(p), fmt
                    )
                    payloads.append(png_encode(_pool_image(img, width, height)))
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "modality": pdf["modality"],
                        "payload": payloads,
                        "meta_width": width,
                        "meta_height": height,
                    }
                )

        return df.mapInPandas(resize_real, RESIZED_SCHEMA)

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


AUDIO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, n_samples int, sum_sq long, rms double"
)


def audio_frame_energy(df: DataFrame, frame_len: int = 32) -> DataFrame:
    """Audio-style framing + per-frame RMS energy over the payload,
    interpreting each byte as an unsigned 8-bit PCM sample centered at
    128 — the frame/hop/feature plumbing of an audio pipeline with the
    codec swapped for the byte-literal stand-in (this container ships no
    audio libs; a real deployment replaces the ``arr`` line with
    soundfile/ffmpeg decode and nothing else changes).

    Runs as ONE mapInPandas stage: Arrow delivers payload batches, numpy
    frames them, and only the skinny (media_id, frame features) rows come
    back — payload bytes never shuffle. ``sum_sq`` is the EXACT integer
    sum of squared centered samples (cross-engine hashable with no
    summation-order exposure); ``rms`` derives from it in one double
    division + sqrt, bit-identical on identical inputs.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, ns, sss = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload if isinstance(payload, bytes) else bytes(payload)
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64) - 128
                if arr.size == 0:
                    continue
                # one vectorized pass per payload: reduceat sums each
                # frame's squares at the frame offsets (no per-frame
                # Python loop — O(1) interpreter ops per payload)
                offs = np.arange(0, arr.size, frame_len)
                ss = np.add.reduceat(arr * arr, offs)
                n = np.minimum(arr.size - offs, frame_len)
                mids.append(np.full(offs.size, mid, dtype=np.int64))
                idxs.append(offs // frame_len)
                ns.append(n)
                sss.append(ss)
            if not mids:
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "n_samples": [],
                     "sum_sq": [], "rms": []}
                )
                continue
            mid_a = np.concatenate(mids)
            idx_a = np.concatenate(idxs)
            n_a = np.concatenate(ns)
            ss_a = np.concatenate(sss)
            rms_a = np.round(np.sqrt(ss_a / n_a.astype(np.float64)), 6)
            yield pd.DataFrame(
                {
                    "media_id": mid_a,
                    "frame_idx": idx_a.astype(np.int32),
                    "n_samples": n_a.astype(np.int32),
                    "sum_sq": ss_a,
                    "rms": rms_a,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        frames, AUDIO_FRAMES_SCHEMA
    )


def attach_wav_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Media table with REAL ``audio/wav`` payloads: each byte of a
    doc's utf-8 text becomes one 16-bit PCM sample ``(b - 128) * 256``
    (the byte re-centered then left-shifted into int16 range — an exact
    integer map, so the sample stream is SQL-restatable), written as a
    genuine RIFF/WAVE file by the vendored PCM codec
    (multimodal/codecs.py) inside one Arrow ``mapInPandas`` stage. WAV
    is lossless, so the real decode stage downstream recovers every
    sample bit-for-bit — the audio analogue of the PNG/JPEG exactness
    windows."""
    from python_darima_spark.multimodal.codecs import wav_encode_pcm

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durs = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                samples = ((arr - 128) * 256).astype(np.int16)
                payloads.append(wav_encode_pcm(samples, sample_rate))
                durs.append(arr.size / float(sample_rate))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "audio",
                    "format": "audio/wav",
                    "payload": payloads,
                    "meta_width": None,
                    "meta_height": None,
                    "meta_duration_s": durs,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)


def wav_frame_energy(df: DataFrame, frame_len: int = 32) -> DataFrame:
    """REAL-codec counterpart of :func:`audio_frame_energy`: payloads
    are decoded as RIFF/WAVE PCM by the vendored chunk-walking parser
    (fmt-tag checked, unknown chunks skipped, 8- and 16-bit PCM), then
    channel-0 samples are framed and reduced to per-frame integer
    ``sum_sq`` + double ``rms`` exactly like the stand-in path — one
    Arrow ``mapInPandas`` stage, payload bytes never shuffle. 8-bit
    files are re-centered at 128 per the spec's unsigned convention;
    16-bit samples are used as stored."""
    from python_darima_spark.multimodal.codecs import wav_decode_pcm

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, ns, sss = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload if isinstance(payload, bytes) else bytes(payload)
                samples, _rate = wav_decode_pcm(b)
                arr = samples[:, 0].astype(np.int64)
                if samples.dtype == np.uint8:
                    arr -= 128  # 8-bit PCM is stored biased at 128
                if arr.size == 0:
                    continue
                offs = np.arange(0, arr.size, frame_len)
                ss = np.add.reduceat(arr * arr, offs)
                n = np.minimum(arr.size - offs, frame_len)
                mids.append(np.full(offs.size, mid, dtype=np.int64))
                idxs.append(offs // frame_len)
                ns.append(n)
                sss.append(ss)
            if not mids:
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "n_samples": [],
                     "sum_sq": [], "rms": []}
                )
                continue
            mid_a = np.concatenate(mids)
            idx_a = np.concatenate(idxs)
            n_a = np.concatenate(ns)
            ss_a = np.concatenate(sss)
            rms_a = np.round(np.sqrt(ss_a / n_a.astype(np.float64)), 6)
            yield pd.DataFrame(
                {
                    "media_id": mid_a,
                    "frame_idx": idx_a.astype(np.int32),
                    "n_samples": n_a.astype(np.int32),
                    "sum_sq": ss_a,
                    "rms": rms_a,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        frames, AUDIO_FRAMES_SCHEMA
    )


def attach_avi_from_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    codec: str = "MJPG",
    fps: int = 10,
) -> DataFrame:
    """Media table with REAL ``video/avi`` payloads: each byte of a
    doc's utf-8 text becomes one FLAT 8×8 greyscale frame of a genuine
    AVI file (vendored RIFF container writer, multimodal/codecs.py) —
    with ``codec="MJPG"`` every frame is itself a real baseline JPEG
    from the vendored T.81 encoder (the motion-JPEG convention), so the
    container parse AND the per-frame image decode downstream are both
    real. Flat frames ride the same DC-exactness window as the image
    entries: each decodes back to its byte value exactly, keeping the
    video path SQL-oracle-checkable corpus-wide."""
    from python_darima_spark.multimodal.codecs import avi_encode

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, durs = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"
                arr = np.frombuffer(b, dtype=np.uint8)
                frames = np.repeat(arr[:, None, None], 8, 1).repeat(8, 2)
                payloads.append(avi_encode(frames, fps=fps, codec=codec))
                durs.append(arr.size / float(fps))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "video",
                    "format": "video/avi",
                    "payload": payloads,
                    "meta_width": 8,
                    "meta_height": 8,
                    "meta_duration_s": durs,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_idx int, src_frame int, n_pixels int, "
    "frame_mean double"
)


def video_frame_sample(
    df: DataFrame, every_n: int = 4, max_frames: int = 8
) -> DataFrame:
    """REAL video frame sampling — the codec-backed replacement for the
    byte-offset stub in :func:`frame_sample`: payloads are parsed as
    AVI by the vendored RIFF walker, frames decoded (MJPG frames
    through the vendored JPEG decoder), every ``every_n``-th frame kept
    up to ``max_frames``, and each sampled frame reduced to its pixel
    count + mean — one Arrow ``mapInPandas`` stage; only the skinny
    per-frame feature rows ever leave it, payload bytes never shuffle.
    This is the training-pipeline shape for video at 100 TB: sample on
    the executors right after decode, ship features not frames."""
    from python_darima_spark.multimodal.codecs import avi_decode

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # the sampled positions are a fixed ascending prefix-closed set,
        # so avi_decode can decode ONLY them (positions past the stream
        # end drop off the tail) — identical kept frames, without paying
        # per-frame JPEG decode for the frames sampling throws away (r10)
        wanted = list(range(0, every_n * max_frames, every_n))
        for pdf in batches:
            mids, idxs, srcs, nps, means = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload if isinstance(payload, bytes) else bytes(payload)
                frames, _fps = avi_decode(b, frame_indices=wanted)
                for k in range(frames.shape[0]):
                    f = frames[k]
                    mids.append(mid)
                    idxs.append(k)
                    srcs.append(wanted[k])
                    nps.append(int(f.size))
                    means.append(round(float(f.mean()), 6))
            yield pd.DataFrame(
                {
                    "media_id": np.array(mids, dtype=np.int64),
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "src_frame": np.array(srcs, dtype=np.int32),
                    "n_pixels": np.array(nps, dtype=np.int32),
                    "frame_mean": np.array(means, dtype=np.float64),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        sample, VIDEO_FRAMES_SCHEMA
    )


def attach_bmp_from_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Media table with REAL ``image/bmp`` payloads: each doc's utf-8
    bytes become a 1×n greyscale raster written as a genuine BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER + identity grey palette +
    bottom-up row-padded pixels, vendored codec). BMP is uncompressed
    and lossless, so decoded pixels equal the text bytes — the same
    SQL-oracle window as the PNG path, over a third container
    format."""
    from python_darima_spark.multimodal.codecs import bmp_encode

    src = df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("_raw"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths = [], []
            for raw in pdf["_raw"]:
                b = raw if isinstance(raw, bytes) else bytes(raw)
                b = b if b else b"\x00"
                arr = np.frombuffer(b, dtype=np.uint8)[None, :]
                payloads.append(bmp_encode(arr))
                widths.append(arr.shape[1])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image",
                    "format": "image/bmp",
                    "payload": payloads,
                    "meta_width": widths,
                    "meta_height": 1,
                    "meta_duration_s": None,
                }
            )

    return src.mapInPandas(encode, MEDIA_SCHEMA)
