from __future__ import annotations

import hashlib

import numpy as np
import pytest

from riot_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_image,
    generate_media_wav,
    generate_media_y4m,
    image_features,
    media_repartition,
    resize_images,
    sample_frames,
    ulaw_expand,
    wav_decode,
    wav_encode_pcm16,
    wav_encode_ulaw,
    y4m_decode,
    y4m_encode,
)


def _media(spark):
    rows = [
        (1, "image", b"img-one-bytes", ("image/jpeg", 16, 8, None, None)),
        (2, "image", b"img-two-bytes", ("image/jpeg", 8, 8, None, None)),
        (3, "video", b"vid-bytes", ("video/mp4", 320, 240, 3500, None)),
        (4, "audio", b"aud-bytes", ("audio/wav", None, None, 2000, 16000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark):
    m = _media(spark).where("kind = 'image'")
    feats = {r["media_id"]: r for r in image_features(m, fake=True).collect()}
    assert set(feats) == {1, 2}
    px = np.resize(
        np.frombuffer(hashlib.md5(b"img-one-bytes").digest(), dtype=np.uint8),
        16 * 8 * 3,
    ).reshape(8, 16, 3)
    assert feats[1]["brightness"] == pytest.approx(px.mean())
    # rerun => identical (determinism invariant)
    again = {r["media_id"]: r for r in image_features(m, fake=True).collect()}
    assert again[1]["brightness"] == feats[1]["brightness"]


def test_resize_shape(spark):
    m = _media(spark).where("media_id = 1")
    out = resize_images(m, 4, 4, fake=True).collect()
    assert len(out) == 1 and len(bytes(out[0]["payload"])) == 4 * 4 * 3


def test_sample_frames_schedule(spark):
    out = sample_frames(_media(spark), every_ms=1000).collect()
    got = sorted((r["media_id"], r["frame_idx"], r["ts_ms"]) for r in out)
    assert got == [(3, 0, 0), (3, 1, 1000), (3, 2, 2000)]


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", {}, fake=False)


def test_ulaw_expand_matches_reference_formula():
    # CCITT reference expander, scalar form
    def ref(c):
        u = (~c) & 0xFF
        t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    got = ulaw_expand(np.arange(256, dtype=np.uint8))
    assert [int(v) for v in got] == [ref(c) for c in range(256)]
    assert int(got.max()) == 32124 and int(got.min()) == -32124


def test_wav_roundtrip_ulaw_and_pcm16():
    codes = ((np.arange(300) * 13 + 5) % 256).astype(np.uint8)
    v, rate = wav_decode(wav_encode_ulaw(codes, 8000))
    assert rate == 8000 and np.array_equal(v, ulaw_expand(codes))
    # odd data length exercises the RIFF pad byte
    v2, _ = wav_decode(wav_encode_ulaw(codes[:255], 8000))
    assert v2.size == 255
    v3, r3 = wav_decode(wav_encode_pcm16(v, 16000))
    assert r3 == 16000 and np.array_equal(v3, v)


def test_wav_unsupported_formats_are_gated():
    with pytest.raises(ValueError):
        wav_decode(b"nope")
    # stereo / unknown tags need codecs the container doesn't ship
    import struct

    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # MP3 tag
    bad = (
        b"RIFF" + struct.pack("<I", 24 + 4) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        wav_decode(bad)


def test_y4m_roundtrip_and_gating():
    frames = ((np.arange(3 * 8 * 8) * 7) % 256).astype(np.uint8).reshape(3, 8, 8)
    out, fps = y4m_decode(y4m_encode(frames, fps=(25, 1)))
    assert fps == (25, 1) and np.array_equal(out, frames)
    with pytest.raises(NotImplementedError):  # chroma-subsampled
        y4m_decode(b"YUV4MPEG2 W8 H8 F1:1 C420jpeg\n")
    with pytest.raises(ValueError):
        y4m_decode(b"not a stream\n")


def test_audio_features_match_closed_form(spark):
    ids = spark.range(5).withColumnRenamed("id", "media_id")
    rows = {
        r["media_id"]: r
        for r in audio_features(generate_media_wav(ids)).collect()
    }
    assert set(rows) == set(range(5))
    for m in range(5):
        i = np.arange(256, dtype=np.int64)
        v = ulaw_expand(((m * 7 + i * 13) % 256).astype(np.uint8)).astype(
            np.int64
        )
        r = rows[m]
        assert r["n_samples"] == 256 and r["sample_rate"] == 8000
        assert r["mean_amp"] == float(v.sum()) / 256
        assert r["rms"] == pytest.approx(
            float(np.sqrt(float((v * v).sum()) / 256)), abs=0
        )
        assert r["peak"] == int(np.abs(v).max())
        neg = v < 0
        assert r["zero_crossings"] == int(np.count_nonzero(neg[:-1] != neg[1:]))


def test_audio_features_empty_wav_yields_zero_row(spark):
    empty = wav_encode_ulaw(np.zeros(0, np.uint8), 8000)
    df = spark.createDataFrame(
        [(7, "audio", bytearray(empty), ("audio/wav", None, None, 0, 8000))],
        MEDIA_SCHEMA,
    )
    r = audio_features(df).collect()[0]
    assert (r["n_samples"], r["mean_amp"], r["rms"], r["peak"],
            r["zero_crossings"]) == (0, 0.0, 0.0, 0, 0)


def test_frame_sample_real_decode_matches_closed_form(spark):
    ids = spark.range(4).withColumnRenamed("id", "media_id")
    media = generate_media_y4m(ids)
    got = sorted(
        (r["media_id"], r["frame_idx"], r["ts_ms"], r["frame_mean"],
         r["frame_peak"])
        for r in sample_frames(media, every_ms=1000, fake=False).collect()
    )
    i13 = (np.arange(256, dtype=np.int64) * 13) % 256
    want = []
    for m in range(4):
        for f in range(m % 10 + 1):
            px = ((m * 7) % 256 + (f * 31) % 256 + i13) % 256
            want.append(
                (m, f, f * 1000, float(px.sum()) / 256, int(px.max()))
            )
    assert got == sorted(want)
    # the real path emits one row per schedule tick, same ids as plan mode
    plan = sample_frames(media, every_ms=1000, fake=True).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in plan) == sorted(
        (g[0], g[1]) for g in got
    )


def test_media_repartition_bytes_budget(spark):
    m = _media(spark)
    out = media_repartition(m, target_bytes=16)
    assert out.rdd.getNumPartitions() >= 2
    assert out.count() == 4
