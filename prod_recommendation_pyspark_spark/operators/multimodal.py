"""Multimodal column plumbing (LLM-data-pipeline extension).

Contract: media rides as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` operators so each task processes media in
vectorized batches without ever materializing them on the driver.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment,
so the decode step is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the payload hash) produces stable
pseudo-features.  The Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested; swapping in a real
codec changes only the inner ``_decode_bytes`` function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int"
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media-shaped table from any table: payload = utf-8
    bytes of the text (stand-in for image bytes), plus metadata."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640).cast("int").alias("width"),
        (F.length(text_col) % 480).cast("int").alias("height"),
    )


def _decode_bytes(payload: bytes, fake: bool) -> np.ndarray:
    if not fake:
        # Real path: PIL.Image.open(io.BytesIO(payload)) → np array.
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True"
        )
    # Deterministic fake decode: seed a tiny 'pixel' block from the
    # payload digest so tests are stable across runs/machines.
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float64).reshape(4, 8)


def extract_image_features(
    df: DataFrame, n_features: int = 8, fake: bool = True
) -> DataFrame:
    """Per-media feature vector (array<double>) via mapInPandas.

    Batch shape: one Arrow batch in → one pandas DataFrame out with
    (media_id, features).  At scale: repartition upstream so batches
    hold O(100) media items; executors never hold more than one batch
    of decoded frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                img = _decode_bytes(bytes(payload), fake)
                row = np.concatenate(
                    [img.mean(axis=1), img.std(axis=1)]
                )[:n_features]
                feats.append([float(x) for x in row])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, features array<double>"
    )


def sample_frames(
    df: DataFrame, every_n: int = 10, fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame with a frame index (fake decoder emits 3 'frames'
    per payload).  Real path would demux with ffmpeg per batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_feat = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_bytes(bytes(payload), fake)
                for frame_i in range(0, 3 * every_n, every_n):
                    out_ids.append(mid)
                    out_idx.append(frame_i)
                    out_feat.append(float(img.sum()) + frame_i)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_score": out_feat}
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, frame_idx int, frame_score double"
    )


def extract_audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Audio-shaped plumbing: per-payload (n_samples, rms) via
    mapInPandas.  Real path would decode PCM and window it; the stub
    treats the payload length as the sample count and computes the RMS
    of the sha256 digest 'waveform' — deterministic, so the whole
    Arrow round-trip is value-checkable in SQL."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_samples, rms = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                wave = _decode_bytes(raw, fake).reshape(-1)
                n_samples.append(len(raw))
                rms.append(float(np.sqrt((wave**2).mean())))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": n_samples,
                    "rms": rms,
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, n_samples long, rms double"
    )
