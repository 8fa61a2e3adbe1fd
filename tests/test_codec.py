from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from riot_spark.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(xs):
    ids = np.unique(np.array(xs, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_decode(delta_encode(np.array([], dtype=np.int64))).size == 0


def test_compression_wins():
    ids = np.arange(10_000, dtype=np.int64) * 3 + 7
    packed = delta_encode(ids)
    assert len(packed) < ids.nbytes / 4  # gaps of 3 -> ~1 byte each
