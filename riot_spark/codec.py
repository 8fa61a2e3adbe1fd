"""Posting-block codec: delta + LEB128 varint, numpy-vectorized.

Replaces riot's in-memory parallel arrays (core/indexer.go:68-74) with
compressed byte blocks suitable for a columnar index table.  Encode
and decode are O(total bytes) with numpy fancy indexing — no per-value
Python loop (the loop is over byte *positions*, max 10 iterations).

Layout per block column:
  doc_ids: varint(delta(doc_ids)) — doc_ids strictly ascending
  tfs / token_lens / any small positive ints: varint(values)
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nb = np.ones(arr.shape, dtype=np.int64)
    shifted = arr >> np.uint64(7)
    while shifted.any():
        nb += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(nb)[:-1]))
    max_nb = int(nb.max())
    for k in range(max_nb):
        mask = nb > k
        byte = (arr[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = (nb[mask] - 1 > k).astype(np.uint8) << 7
        out[offsets[mask] + k] = byte.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    if not data:
        return np.array([], dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # group id per byte: index of the value it belongs to
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    pos_in_group = np.arange(b.size) - np.repeat(
        starts, np.diff(np.concatenate((starts, [b.size])))
    )
    parts = (b & 0x7F).astype(np.uint64) << (
        np.uint64(7) * pos_in_group.astype(np.uint64)
    )
    return np.add.reduceat(parts, starts).astype(np.uint64)


def delta_encode(doc_ids: np.ndarray) -> bytes:
    """varint(first, gaps) for a strictly ascending int array."""
    a = np.asarray(doc_ids, dtype=np.int64)
    if a.size == 0:
        return b""
    deltas = np.empty(a.shape, dtype=np.uint64)
    deltas[0] = np.uint64(a[0])
    deltas[1:] = np.diff(a).astype(np.uint64)
    return varint_encode(deltas)


def delta_decode(data: bytes) -> np.ndarray:
    d = varint_decode(data)
    if d.size == 0:
        return np.array([], dtype=np.int64)
    return np.cumsum(d.astype(np.int64))


def pack_floats_as_ints(values: np.ndarray) -> bytes:
    """tf / token_len are small positive integers stored as float32 in
    the flat schema — varint them as ints (lossless for our data)."""
    return varint_encode(np.asarray(values, dtype=np.float64).astype(np.uint64))


def unpack_ints_as_floats(data: bytes) -> np.ndarray:
    return varint_decode(data).astype(np.float32)
