"""Multimodal columns — image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested: schemas, partitioning,
Arrow-batched UDF signatures, and batch shapes are exactly what a
production pipeline uses. Only the codec calls are stubbed — this
container has no image/audio libraries — behind ``_decode_image`` /
``_decode_audio``: a clearly-marked deterministic fake decoder (so
tests are exact) with ``NotImplementedError`` for real formats.

Operators:
- ``media_schema``            — the typed layout for media tables
- ``gen_media``               — deterministic synthetic media fixture
- ``image_features``          — decode → per-channel stats + phash-style
                                fingerprint (mapInPandas, Arrow batches)
- ``image_resize``            — decode → box-filter downsample → re-encode
- ``audio_frame_sample``      — decode → fixed-rate frame energies
- ``media_dedup_keys``        — exact bytes hash + feature fingerprint

Scale design: media bytes never leave the executor JVM→Python Arrow
channel uncompressed more than once per operator; rows are processed
in bounded Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch)
so executor memory is bounded by batch_size x max_media_size. Feature
outputs are tiny relative to inputs, so downstream shuffles move
features, not bytes.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, fmt string, width int, height int,"
    " n_channels int, sample_rate int, duration_ms int, payload binary"
)

_MAGIC = b"FAKEMEDIA1"


# --- stub codec ---------------------------------------------------------------


def _encode_fake(arr: np.ndarray) -> bytes:
    """Deterministic fake codec: header + zlib of raw uint8 samples.
    Stands in for JPEG/PNG/WAV; real formats raise in _decode below."""
    h = struct.pack("<III", *arr.shape[:2], arr.shape[2] if arr.ndim == 3 else 1)
    return _MAGIC + h + zlib.compress(arr.astype(np.uint8).tobytes(), 1)


def _decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """STUB: decodes only the deterministic fake format. A real
    deployment swaps this single function for PIL/turbojpeg — nothing
    else in the pipeline changes (the Spark plumbing is format-blind)."""
    if payload[: len(_MAGIC)] == _MAGIC:
        hh, ww, cc = struct.unpack("<III", payload[len(_MAGIC) : len(_MAGIC) + 12])
        raw = zlib.decompress(payload[len(_MAGIC) + 12 :])
        return np.frombuffer(raw, np.uint8).reshape(hh, ww, cc)
    raise NotImplementedError(
        f"real image codec ({fmt}) not available in this environment; "
        "plug a decoder into multimodal._decode_image"
    )


def _decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    if payload[: len(_MAGIC)] == _MAGIC:
        _, n, _ = struct.unpack("<III", payload[len(_MAGIC) : len(_MAGIC) + 12])
        raw = zlib.decompress(payload[len(_MAGIC) + 12 :])
        return np.frombuffer(raw, np.uint8).reshape(-1)
    raise NotImplementedError(
        f"real audio codec ({fmt}) not available; plug into _decode_audio"
    )


_MAGIC_V = b"FAKEVIDEO1"


def _encode_fake_video(arr: np.ndarray) -> bytes:
    """Deterministic fake video codec: (T, H, W, C) uint8 frames."""
    h = struct.pack("<IIII", *arr.shape)
    return _MAGIC_V + h + zlib.compress(arr.astype(np.uint8).tobytes(), 1)


def _decode_video(payload: bytes, fmt: str) -> np.ndarray:
    """STUB: decodes only the fake format; a real deployment plugs
    pyav/ffmpeg into this one function — the Spark plumbing (schema,
    batching, frame-sample shape) is codec-blind."""
    if payload[: len(_MAGIC_V)] == _MAGIC_V:
        t, hh, ww, cc = struct.unpack(
            "<IIII", payload[len(_MAGIC_V) : len(_MAGIC_V) + 16]
        )
        raw = zlib.decompress(payload[len(_MAGIC_V) + 16 :])
        return np.frombuffer(raw, np.uint8).reshape(t, hh, ww, cc)
    raise NotImplementedError(
        f"real video codec ({fmt}) not available; plug into _decode_video"
    )


# --- fixture ------------------------------------------------------------------


def gen_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic media table: images (ramp/noise patterns) and
    audio clips, as the binary+metadata layout of MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 != 2:  # image
            h, w = int(rng.integers(16, 48)), int(rng.integers(16, 48))
            base = (np.arange(h)[:, None] + np.arange(w)[None, :]) * (i % 7 + 1)
            img = np.stack([(base + c * 11) % 256 for c in range(3)], axis=2).astype(np.uint8)
            rows.append((i, "image", "fake", w, h, 3, 0, 0, _encode_fake(img)))
        else:  # audio
            sr = 8000
            dur = int(rng.integers(100, 400))
            t = np.arange(sr * dur // 1000)
            wave = (128 + 100 * np.sin(2 * np.pi * t * (55 + i) / sr)).astype(np.uint8)
            rows.append((i, "audio", "fake", 0, 0, 1, sr, dur, _encode_fake(wave[:, None])))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- operators ----------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double,"
    " mean_b double, std_gray double, phash long"
)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image channel means, gray stddev, and a 64-bit perceptual
    hash (8x8 mean-threshold, the classic aHash) — Arrow batches in,
    small feature rows out."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over columns, never iterrows: iterrows() upcasts each
            # row to one dtype (int64 ids > 2^53 silently corrupt)
            for mid, fmt, payload in zip(
                pdf["media_id"].to_numpy(np.int64), pdf["fmt"], pdf["payload"]
            ):
                img = _decode_image(bytes(payload), fmt).astype(np.float64)
                gray = img.mean(axis=2)
                # aHash: 8x8 block means thresholded at their mean
                hh, ww = gray.shape
                ys = (np.arange(8) * hh) // 8
                xs = (np.arange(8) * ww) // 8
                blocks = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
                bits = (blocks > blocks.mean()).ravel()
                phash = int(
                    (bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
                )
                out.append(
                    (
                        int(mid), int(gray.shape[1]), int(gray.shape[0]),
                        float(img[:, :, 0].mean()), float(img[:, :, 1].mean()),
                        float(img[:, :, 2].mean()), float(gray.std()),
                        np.int64(np.uint64(phash).astype(np.int64)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "mean_r", "mean_g", "mean_b",
                    "std_gray", "phash",
                ],
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "fmt", "payload"
    ).mapInPandas(kern, IMAGE_FEATURE_SCHEMA)


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → exact box-average downsample → re-encode (fake codec).
    Returns (media_id, width, height, payload) with the same binary
    layout, demonstrating the bytes-in/bytes-out transform shape."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, fmt, payload in zip(
                pdf["media_id"].to_numpy(np.int64), pdf["fmt"], pdf["payload"]
            ):
                img = _decode_image(bytes(payload), fmt).astype(np.float64)
                h, w, c = img.shape
                ys = (np.arange(out_h + 1) * h) // out_h
                xs = (np.arange(out_w + 1) * w) // out_w
                small = np.zeros((out_h, out_w, c), np.float64)
                for i in range(out_h):
                    for j in range(out_w):
                        small[i, j] = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean(axis=(0, 1))
                ids.append(int(mid))
                payloads.append(_encode_fake(small.astype(np.uint8)))
            yield pd.DataFrame(
                {"media_id": ids, "width": out_w, "height": out_h, "payload": payloads}
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "fmt", "payload"
    ).mapInPandas(kern, "media_id long, width int, height int, payload binary")


def audio_frame_sample(media: DataFrame, frame_ms: int = 25) -> DataFrame:
    """Decode audio → RMS energy per fixed-length frame (one output row
    per frame — the frame-sampling shape for downstream models)."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, energies = [], [], []
            for mid, fmt, sr, payload in zip(
                pdf["media_id"].to_numpy(np.int64),
                pdf["fmt"],
                pdf["sample_rate"].to_numpy(np.int64),
                pdf["payload"],
            ):
                wave = _decode_audio(bytes(payload), fmt).astype(np.float64) - 128.0
                spf = max(1, int(sr) * frame_ms // 1000)
                nf = len(wave) // spf
                if nf == 0:
                    continue
                frames = wave[: nf * spf].reshape(nf, spf)
                rms = np.sqrt((frames**2).mean(axis=1))
                mids.extend([int(mid)] * nf)
                idxs.extend(range(nf))
                energies.extend(rms.tolist())
            yield pd.DataFrame({"media_id": mids, "frame_idx": idxs, "rms": energies})

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "fmt", "sample_rate", "payload"
    ).mapInPandas(kern, "media_id long, frame_idx int, rms double")


def gen_video(spark, n: int, seed: int = 43) -> DataFrame:
    """Deterministic video table (kind='video'): short clips of moving
    ramp patterns; sample_rate carries fps, duration_ms the clip
    length. Same MEDIA_SCHEMA as images/audio — one binary column plus
    typed metadata, the layout the build spec prescribes."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        t_frames = int(rng.integers(8, 25))
        h, w = int(rng.integers(12, 24)), int(rng.integers(12, 24))
        fps = 10
        base = np.arange(h)[:, None] + np.arange(w)[None, :]
        clip = np.stack(
            [((base + 3 * t + i) % 256) for t in range(t_frames)], axis=0
        ).astype(np.uint8)[..., None].repeat(3, axis=3)
        rows.append(
            (
                i, "video", "fake", w, h, 3, fps,
                t_frames * 1000 // fps, _encode_fake_video(clip),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def video_frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Decode video → keep every ``every_n``-th frame and emit one row
    per sampled frame with per-frame stats (the frame-sampling shape a
    vision-model training pipeline consumes; the spec's video analogue
    of audio_frame_sample). Arrow-batched; per-batch memory is bounded
    by the clips in the batch — at scale, clip payloads are row-group
    sized so a task holds a handful of clips at once."""

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, means, stds = [], [], [], []
            for mid, fmt, payload in zip(
                pdf["media_id"].to_numpy(np.int64), pdf["fmt"], pdf["payload"]
            ):
                clip = _decode_video(bytes(payload), fmt).astype(np.float64)
                sel = np.arange(0, clip.shape[0], max(1, every_n))
                gray = clip[sel].mean(axis=3)  # (t', h, w)
                mids.extend([int(mid)] * len(sel))
                idxs.extend(sel.tolist())
                means.extend(gray.mean(axis=(1, 2)).tolist())
                stds.extend(gray.std(axis=(1, 2)).tolist())
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "mean_gray": means, "std_gray": stds}
            )

    return media.filter(F.col("kind") == "video").select(
        "media_id", "fmt", "payload"
    ).mapInPandas(kern, "media_id long, frame_idx int, mean_gray double, std_gray double")


def media_dedup_keys(media: DataFrame) -> DataFrame:
    """Exact-bytes dedup key (sha2 of payload — JVM-side) joined with
    the perceptual hash for near-dup bucketing."""
    exact = media.select(
        "media_id", "kind", F.sha2(F.col("payload"), 256).alias("payload_sha256")
    )
    feats = image_features(media).select("media_id", "phash")
    return exact.join(feats, "media_id", "left")
