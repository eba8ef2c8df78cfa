"""Multimodal column plumbing (LLM-data-pipeline extension).

Contract: media rides as an opaque ``binary`` column plus a typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` operators so each task processes media in
vectorized batches without ever materializing them on the driver.

Decode paths, in order of preference:

1. ``fake=True`` (default in the registered queries): deterministic
   pseudo-decode seeded by the payload sha256 — stable across
   machines, so the whole Arrow round-trip is SQL-oracle-able;
2. ``fake=False`` real decode: PIL when importable; otherwise a pure
   numpy netpbm (P5/P6) parser for images, and the stdlib ``wave``
   module for RIFF/WAV audio — REAL standard formats decoded with
   zero optional deps, exercised by an always-on pytest;
3. anything else with no codec available raises
   ``NotImplementedError`` — a loud failure beats silent garbage.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional dep: full-format image decode when present
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover - absent in this container
    _PILImage = None

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, width int, height int"
)


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for binary netpbm images (P5 grayscale /
    P6 RGB): header tokens (magic, width, height, maxval; '#' comments
    allowed) then raw samples.  Returns float64 (h, w) or (h, w, 3)."""
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    i += 1  # single whitespace after maxval, then raster
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(f"unsupported netpbm magic {magic!r}")
    depth = 1 if magic == b"P5" else 3
    dtype = np.uint8 if maxval < 256 else np.dtype(">u2")
    arr = np.frombuffer(payload, dtype=dtype, count=w * h * depth, offset=i)
    img = arr.astype(np.float64).reshape((h, w) if depth == 1 else (h, w, 3))
    return img


def decode_wav(payload: bytes) -> np.ndarray:
    """Real WAV (RIFF/PCM) decode via the stdlib ``wave`` module:
    returns float64 samples normalized to [-1, 1] (channels
    interleaved — RMS/stat features don't need de-interleaving)."""
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        raw = wf.readframes(wf.getnframes())
        width = wf.getsampwidth()
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return samples


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
        if payload[:2] in (b"P5", b"P6"):
            return _decode_netpbm(payload)
        if _PILImage is not None:
            return np.asarray(
                _PILImage.open(io.BytesIO(payload))
            ).astype(np.float64)
        raise NotImplementedError(
            "no codec for this payload (netpbm always supported; install "
            "PIL for other formats) — or pass fake=True"
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
                if fake:
                    # band stats of the fixed 4×8 digest block (the
                    # SQL-oracle-able contract)
                    row = np.concatenate(
                        [img.mean(axis=1), img.std(axis=1)]
                    )[:n_features]
                else:
                    # shape-independent stats for real images
                    h, w = img.shape[0], img.shape[1]
                    ch = 1 if img.ndim == 2 else img.shape[2]
                    flat = img.reshape(-1)
                    row = np.array(
                        [flat.mean(), flat.std(), flat.min(), flat.max(),
                         float(h), float(w), float(ch), flat.sum()]
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


def synthesize_wav_from_bytes(df: DataFrame, framerate: int = 8000) -> DataFrame:
    """Wrap each payload's raw bytes as an 8-bit mono PCM RIFF/WAV
    (bytes ARE the unsigned samples) — a deterministic way to put REAL
    WAV payloads through the real ``decode_wav`` path at any scale,
    so the genuine codec is exercisable by an oracle-checked query,
    not only by handcrafted pytest fixtures."""
    import wave as wave_mod

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                buf = io.BytesIO()
                with wave_mod.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(1)
                    wf.setframerate(framerate)
                    wf.writeframes(bytes(payload))
                out.append(buf.getvalue())
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return df.select("media_id", "payload").mapInPandas(
        kernel, schema="media_id long, payload binary"
    )


def _encode_netpbm(img: np.ndarray) -> bytes:
    """Inverse of ``_decode_netpbm`` for 8-bit images: P5 for (h, w),
    P6 for (h, w, 3).  RGBA drops its alpha plane (the netpbm family
    has no alpha); other channel counts and >8-bit sample ranges raise
    instead of writing a payload whose header contradicts its body."""
    if img.ndim == 3 and img.shape[2] == 4:
        img = img[:, :, :3]
    if img.ndim == 3 and img.shape[2] != 3:
        raise NotImplementedError(
            f"cannot netpbm-encode {img.shape[2]}-channel image"
        )
    if img.ndim not in (2, 3):
        raise NotImplementedError(f"cannot netpbm-encode ndim={img.ndim}")
    if img.size and np.rint(img).max() > 255:
        raise NotImplementedError(
            "only 8-bit netpbm re-encode is supported (16-bit source?)"
        )
    h, w = img.shape[0], img.shape[1]
    magic = b"P5" if img.ndim == 2 else b"P6"
    body = np.clip(np.rint(img), 0, 255).astype(np.uint8).tobytes()
    return magic + f"\n{w} {h}\n255\n".encode() + body


def resize_images(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Nearest-neighbour resize to (width, height), re-encoded as a
    netpbm payload — the SURVEY's resize stage with the same
    decode-path contract as the feature extractors (real netpbm/PIL
    decode, or the deterministic sha256 stub block).  Pure numpy
    index-sampling per Arrow batch; at scale the batch bound is the
    decoded-frame footprint, exactly as ``extract_image_features``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = _decode_bytes(bytes(payload), fake)
                src_h, src_w = img.shape[0], img.shape[1]
                rows = (np.arange(height) * src_h) // height
                cols = (np.arange(width) * src_w) // width
                resized = img[rows][:, cols]
                out.append(_encode_netpbm(resized))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel,
        schema="media_id long, payload binary, width int, height int",
    )


def extract_audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-payload (n_samples, rms) via mapInPandas.  ``fake=True``
    computes the RMS of the sha256-digest 'waveform' with the payload
    byte length as the sample count — deterministic, so the whole
    Arrow round-trip is value-checkable in SQL.  ``fake=False`` does a
    REAL RIFF/WAV PCM decode (stdlib ``wave``; no optional deps) and
    reports the true interleaved sample count and amplitude RMS."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_samples, rms = [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if fake:
                    wave_arr = _decode_bytes(raw, True).reshape(-1)
                    n_samples.append(len(raw))
                else:
                    wave_arr = decode_wav(raw)
                    n_samples.append(len(wave_arr))
                # a valid zero-frame WAV has no samples: rms 0, not NaN
                rms.append(
                    float(np.sqrt((wave_arr**2).mean())) if wave_arr.size else 0.0
                )
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


def image_ahash(df: DataFrame, fake: bool = True) -> DataFrame:
    """Perceptual AVERAGE-HASH per image: decode, flatten (grayscale
    via channel mean for color), threshold every pixel against the
    image mean (ties LOW — ``pixel > mean``), and pack the row-major
    bit string into a signed 64-bit ``ahash`` (images larger than 64
    pixels should be resized first — :func:`resize_images` — so every
    image contributes the same bit count; smaller images use their
    pixel count).  Perceptually-similar images land on equal or
    near-equal hashes, so exact GROUP BY on the hash is the blocking
    stage of an image-dedup pipeline — false positives are expected
    and must die in a payload/feature verify stage, exactly like LSH
    band candidates.

    Arrow-batched ``mapInPandas``; output ``(media_id, ahash,
    n_bits)``."""
    from pyspark.sql import types as T

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, nbits = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_bytes(bytes(payload), fake)
                if img.ndim == 3:
                    img = img.mean(axis=2)
                px = img.reshape(-1)[:64]
                bits = px > px.mean()
                acc = 0
                for b in bits:
                    acc = (acc << 1) | int(b)
                if acc >= 1 << 63:
                    acc -= 1 << 64
                ids.append(mid)
                hashes.append(acc)
                nbits.append(len(px))
            yield pd.DataFrame(
                {"media_id": ids, "ahash": hashes, "n_bits": nbits}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
            T.StructField("n_bits", T.IntegerType()),
        ]
    )
    return df.select("media_id", "payload").mapInPandas(kernel, schema=schema)


def audio_fingerprint(
    df: DataFrame, n_frames: int = 64, fake: bool = False
) -> DataFrame:
    """Perceptual AUDIO fingerprint per clip (energy-delta hash, the
    Chromaprint idea reduced to one band): really decode the WAV,
    split samples into ``n_frames`` equal frames, compute per-frame
    RMS energy, and emit bit i = (energy[i+1] > energy[i]) packed into
    a signed 64-bit ``afp``.  Energy DELTAS (not absolute levels) make
    the fingerprint invariant to uniform gain — the property that
    turns it into a near-dup blocker: re-encoded or volume-normalized
    copies of a clip land on equal fingerprints while absolute-energy
    hashes would not.  Like :func:`image_ahash`, equality blocking
    over-generates on similar audio and a payload/feature verify owns
    exactness.

    Arrow-batched ``mapInPandas``; output ``(media_id, afp,
    n_samples)``."""
    from pyspark.sql import types as T

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, ns = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if fake:
                    digest = hashlib.sha256(bytes(payload)).digest()
                    samples = (
                        np.frombuffer(digest, dtype=np.uint8).astype(
                            np.float64
                        )
                        - 128.0
                    ) / 128.0
                else:
                    samples = decode_wav(bytes(payload))
                n = len(samples)
                frames = max(2, min(n_frames + 1, n))
                # n_frames+1 energies → n_frames delta bits
                bounds = np.linspace(0, n, frames + 1).astype(int)
                energy = np.array(
                    [
                        np.sqrt(np.mean(samples[a:b] ** 2)) if b > a else 0.0
                        for a, b in zip(bounds[:-1], bounds[1:])
                    ]
                )
                bits = energy[1:] > energy[:-1]
                acc = 0
                for bit in bits:
                    acc = (acc << 1) | int(bit)
                if acc >= 1 << 63:
                    acc -= 1 << 64
                ids.append(mid)
                fps.append(acc)
                ns.append(n)
            yield pd.DataFrame(
                {"media_id": ids, "afp": fps, "n_samples": ns}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("afp", T.LongType()),
            T.StructField("n_samples", T.IntegerType()),
        ]
    )
    return df.select("media_id", "payload").mapInPandas(kernel, schema=schema)
