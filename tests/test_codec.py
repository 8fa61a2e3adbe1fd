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


from riot_spark.codec import (  # noqa: E402
    decode_ints_best,
    encode_ints_best,
    pfor_decode,
    pfor_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(pfor_decode(pfor_encode(arr)), arr)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_best_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(decode_ints_best(encode_ints_best(arr)), arr)


def test_pfor_beats_varint_on_dense_gaps():
    """Hot-term shape: dense small gaps with a few outliers — FOR packs
    gaps in ~2-3 bits where varint pays 8 bits minimum."""
    rng = np.random.default_rng(42)
    gaps = rng.integers(1, 7, size=20_000).astype(np.uint64)
    gaps[::1000] = 100_000  # sprinkle exceptions
    pf = pfor_encode(gaps)
    vi = varint_encode(gaps)
    assert len(pf) < 0.6 * len(vi)
    tagged = encode_ints_best(gaps)
    assert tagged[0] == 1  # picked PFOR
    ids = np.cumsum(gaps.astype(np.int64))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


# ---------------------------------------------------------- fuzzing

from hypothesis import given, settings
from hypothesis import strategies as st

from riot_spark.codec import pack_position_lists, unpack_position_lists


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 30),
                 min_size=0, max_size=30),
        min_size=0, max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_lists_roundtrip_fuzz(lists):
    import numpy as np

    lists = [sorted(p) for p in lists]  # positions are ascending
    blob = pack_position_lists(lists)
    counts = np.array([len(p) for p in lists], dtype=np.int64)
    flat, offs = unpack_position_lists(blob, counts)
    got = [flat[offs[i]:offs[i] + counts[i]].tolist() for i in range(len(lists))]
    assert got == lists


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=1 << 30),
                 min_size=0, max_size=30),
        min_size=0, max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_position_lists_flat_equals_listform(lists):
    """The Arrow packer's ragged-flat entry point must emit the exact
    bytes of the list-of-lists form (block byte-identity depends on
    it)."""
    import numpy as np

    from riot_spark.codec import pack_position_lists_flat

    lists = [sorted(p) for p in lists]
    counts = np.array([len(p) for p in lists], dtype=np.int64)
    flat = np.array(
        [v for p in lists for v in p], dtype=np.int64
    )
    assert pack_position_lists_flat(flat, counts) == pack_position_lists(lists)
