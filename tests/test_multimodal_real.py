"""Real-codec multimodal decode (round-4 verdict item 8): the
fake=False path must decode genuine standard formats.  Netpbm images
and RIFF/WAV audio need zero optional deps, so these tests always run;
the PIL-format test skips when PIL is absent."""

from __future__ import annotations

import io
import math
import struct
import wave as wave_mod

import pytest
from pyspark.sql import functions as F

from prod_recommendation_pyspark_spark.operators.multimodal import (
    _PILImage,
    decode_wav,
    extract_audio_features,
    extract_image_features,
)


def _ppm_bytes(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for px in row for v in px)
    return f"P6\n# test image\n{w} {h}\n255\n".encode() + body


def _wav_bytes(samples: list[int], framerate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _media_df(spark, payloads: list[bytes], media_type: str):
    rows = [(i, p, media_type, 0, 0) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, width int, height int",
    )


def test_real_ppm_image_features(spark):
    # 1×2 image: black and pure-white pixels → known stats
    img = _ppm_bytes([[(0, 0, 0), (255, 255, 255)]])
    df = _media_df(spark, [img], "image/x-portable-pixmap")
    rows = extract_image_features(df, n_features=8, fake=False).collect()
    feats = rows[0]["features"]
    mean, std, mn, mx, h, w, ch, total = feats
    assert (mean, mn, mx) == (127.5, 0.0, 255.0)
    assert (h, w, ch) == (1.0, 2.0, 3.0)
    assert total == 3 * 255.0
    assert abs(std - 127.5) < 1e-9


def test_real_wav_audio_features(spark):
    # full-scale square wave → RMS 1.0 (±1/32768 asymmetry)
    square = [32767, -32768] * 50
    silent = [0] * 100
    df = _media_df(spark, [_wav_bytes(square), _wav_bytes(silent)], "audio/wav")
    out = {
        r["media_id"]: r
        for r in extract_audio_features(df, fake=False).collect()
    }
    assert out[0]["n_samples"] == 100 and out[1]["n_samples"] == 100
    assert abs(out[0]["rms"] - 1.0) < 1e-3
    assert out[1]["rms"] == 0.0


def test_decode_wav_roundtrip_values():
    samples = [0, 16384, -16384, 32767]
    arr = decode_wav(_wav_bytes(samples))
    assert len(arr) == 4
    assert abs(arr[1] - 0.5) < 1e-4 and abs(arr[2] + 0.5) < 1e-4


def test_zero_frame_wav_rms_is_zero(spark):
    df = _media_df(spark, [_wav_bytes([])], "audio/wav")
    row = extract_audio_features(df, fake=False).collect()[0]
    assert row["n_samples"] == 0 and row["rms"] == 0.0


def test_encode_netpbm_rgba_and_range_guards():
    import numpy as np

    from prod_recommendation_pyspark_spark.operators.multimodal import (
        _decode_netpbm,
        _encode_netpbm,
    )

    rgba = np.zeros((2, 2, 4)); rgba[..., 3] = 255.0  # opaque alpha
    out = _decode_netpbm(_encode_netpbm(rgba))
    assert out.shape == (2, 2, 3)  # alpha dropped, header matches body
    with pytest.raises(NotImplementedError):
        _encode_netpbm(np.zeros((2, 2, 2)))
    with pytest.raises(NotImplementedError):
        _encode_netpbm(np.full((2, 2), 300.0))  # 16-bit range


def test_unknown_payload_raises(spark):
    df = _media_df(spark, [b"\x89PNG\r\n not really"], "image/png")
    if _PILImage is not None:
        pytest.skip("PIL present: PNG goes down the real PIL path instead")
    with pytest.raises(Exception, match="no codec|NotImplemented"):
        extract_image_features(df, fake=False).collect()


def test_resize_real_ppm_nearest_neighbour(spark):
    """2×2 quadrant image → 4×4: every 2×2 quadrant must stay uniform
    under nearest-neighbour, and the output must round-trip through the
    netpbm decoder."""
    from prod_recommendation_pyspark_spark.operators.multimodal import (
        _decode_netpbm,
        resize_images,
    )

    img = _ppm_bytes(
        [
            [(255, 0, 0), (0, 255, 0)],
            [(0, 0, 255), (255, 255, 255)],
        ]
    )
    df = _media_df(spark, [img], "image/x-portable-pixmap")
    row = resize_images(df, width=4, height=4, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (4, 4)
    out = _decode_netpbm(bytes(row["payload"]))
    assert out.shape == (4, 4, 3)
    assert tuple(out[0, 0]) == (255.0, 0.0, 0.0)
    assert tuple(out[0, 3]) == (0.0, 255.0, 0.0)
    assert tuple(out[3, 0]) == (0.0, 0.0, 255.0)
    assert (out[0, 0] == out[1, 1]).all()  # quadrant uniform


def test_resize_fake_block_deterministic(spark):
    from prod_recommendation_pyspark_spark.operators.multimodal import (
        _decode_netpbm,
        resize_images,
    )

    df = _media_df(spark, [b"whatever", b"whatever"], "image/fake")
    rows = resize_images(df, width=2, height=2, fake=True).collect()
    imgs = [_decode_netpbm(bytes(r["payload"])) for r in rows]
    assert imgs[0].shape == (2, 2)
    assert (imgs[0] == imgs[1]).all()  # same payload → same resize


@pytest.mark.skipif(_PILImage is None, reason="PIL not installed")
def test_real_pil_image_features(spark):
    buf = io.BytesIO()
    _PILImage.new("RGB", (2, 1), color=(10, 20, 30)).save(buf, format="PNG")
    df = _media_df(spark, [buf.getvalue()], "image/png")
    rows = extract_image_features(df, n_features=8, fake=False).collect()
    mean = rows[0]["features"][0]
    assert abs(mean - (10 + 20 + 30) / 3) < 1e-9


def test_image_ahash_blocks_similar_and_verify_kills_false_positives(spark):
    """Two IDENTICAL images hash equal; a 1-pixel-changed image lands
    within a couple of bits (the tweak flips its own threshold bit
    and, by moving the image mean, possibly one borderline pixel's) —
    the blocking property; exact dedup then relies on the payload
    verify, not the hash."""
    from prod_recommendation_pyspark_spark.operators.multimodal import (
        _encode_netpbm,
        image_ahash,
    )

    import numpy as np

    base = np.arange(64, dtype="float64").reshape(8, 8)
    tweaked = base.copy()
    tweaked[0, 0] = 63.0  # flips its own bit (and maybe one via the mean)
    rows = [
        (1, _encode_netpbm(base)),
        (2, _encode_netpbm(base)),
        (3, _encode_netpbm(tweaked)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.ahash for r in image_ahash(df, fake=False).collect()}
    assert got[1] == got[2]
    assert bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1") <= 2


def test_audio_fingerprint_gain_invariant(spark):
    """The energy-DELTA fingerprint is invariant to uniform gain: the
    same clip at half volume lands on the identical fingerprint, while
    a reordered clip does not."""
    from prod_recommendation_pyspark_spark.operators.multimodal import (
        audio_fingerprint,
    )

    base = [0, 8000, -16000, 24000, -32000, 30000, -1000, 500] * 8
    half = [s // 2 for s in base]
    shuffled = list(reversed(base))
    rows = [
        (1, _wav_bytes(base)),
        (2, _wav_bytes(half)),
        (3, _wav_bytes(shuffled)),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r.afp
        for r in audio_fingerprint(df, n_frames=16, fake=False).collect()
    }
    assert got[1] == got[2]          # gain-invariant
    assert got[1] != got[3]          # order matters
