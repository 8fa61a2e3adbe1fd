"""Property-based roundtrips for the stdlib media codecs (no Spark).

The image codecs have their own golden/property suites
(test_png_codec.py, test_jpeg_codec.py); these cover the round-5
audio/video containers: any payload a writer can produce must decode
back bit-exactly, for arbitrary hypothesis-generated content.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from riot_spark.multimodal import (
    ulaw_expand,
    wav_decode,
    wav_encode_pcm16,
    wav_encode_ulaw,
    y4m_decode,
    y4m_encode,
)


@settings(max_examples=60, deadline=None)
@given(
    st.binary(min_size=0, max_size=2048),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_ulaw_roundtrip(codes_bytes, rate):
    codes = np.frombuffer(codes_bytes, dtype=np.uint8)
    v, r = wav_decode(wav_encode_ulaw(codes, rate))
    assert r == rate
    assert np.array_equal(v, ulaw_expand(codes))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=1024
    ),
    st.sampled_from([8000, 48000]),
)
def test_wav_pcm16_roundtrip(samples, rate):
    arr = np.array(samples, dtype=np.int16)
    v, r = wav_decode(wav_encode_pcm16(arr, rate))
    assert r == rate
    assert np.array_equal(v, arr)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=6),   # frames
    st.integers(min_value=1, max_value=24),  # w
    st.integers(min_value=1, max_value=24),  # h
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.tuples(
        st.integers(min_value=1, max_value=60), st.integers(min_value=1, max_value=2)
    ),
)
def test_y4m_roundtrip(nf, w, h, seed, fps):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
    out, got_fps = y4m_decode(y4m_encode(frames, fps=fps))
    assert got_fps == fps
    assert out.shape == (nf, h, w)
    assert np.array_equal(out, frames)
