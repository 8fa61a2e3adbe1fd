"""Minimal dict-DAG segmenter (gse/sego-style) for riot parity.

riot's indexing path segments content with gse (`engine.go:479-497`,
`segment.go:88-168`), a sego-descended dictionary segmenter: the text
splits into elements (lowercased alphanumeric runs; every other char —
CJK, punctuation, space — is its own element), and a dynamic program
picks the dictionary segmentation minimizing Σ log2(total_freq/freq),
with a constant penalty for out-of-dictionary elements.  Whitespace
segments are dropped; positions are byte offsets into the original
text; TokenLen = number of surviving segments (occurrences, not
distinct terms).

The full gse dictionary blob is absent from the reference checkout
(`.MISSING_LARGE_BLOBS`), but its tiny test dictionary
(`testdata/test_dict.txt`, 12 lines) is present — enough to drive the
reference's own e2e corpus (`test_utils.go:103-137`,
`engine_test.go:36-61`) from RAW text instead of hand-transcribed
token streams.  This module implements the algorithm from its public
description; no reference code is copied.
"""

from __future__ import annotations

import math
import os

# sego/gse assign out-of-dictionary elements this constant distance.
_UNKNOWN_DISTANCE = 32.0

DEFAULT_DICT = "/root/reference/testdata/test_dict.txt"


def _split_elements(text: str) -> list[tuple[str, int]]:
    """(element, byte_offset) list: ASCII alphanumeric runs lowercase
    into one element; every other character stands alone."""
    out: list[tuple[str, int]] = []
    cur: list[str] = []
    cur_start = 0
    b = 0
    for ch in text:
        nb = len(ch.encode("utf-8"))
        if ch.isascii() and ch.isalnum():
            if not cur:
                cur_start = b
            cur.append(ch.lower())
        else:
            if cur:
                out.append(("".join(cur), cur_start))
                cur = []
            out.append((ch, b))
        b += nb
    if cur:
        out.append(("".join(cur), cur_start))
    return out


class MiniGse:
    """Dictionary-DAG segmenter over a `word freq [pos]` dict file."""

    def __init__(self, dict_path: str = DEFAULT_DICT):
        if not os.path.exists(dict_path):
            raise FileNotFoundError(dict_path)
        freqs: dict[str, float] = {}
        with open(dict_path, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if len(parts) < 2:
                    continue
                try:
                    freq = float(parts[1])
                except ValueError:
                    continue  # comment / malformed line
                if freq > 0:
                    freqs[parts[0]] = freq
        total = sum(freqs.values())
        self.dist = {w: math.log2(total / f) for w, f in freqs.items()}
        self.max_len = max(
            (len(_split_elements(w)) for w in freqs), default=1
        )

    def segment(
        self, text: str, keep_whitespace: bool = False
    ) -> list[tuple[str, int]]:
        """[(token, byte_offset)] — min-distance DP segmentation.

        ``keep_whitespace=True`` keeps space segments, matching riot's
        Using=1 accounting where numTokens = len(segments) and (with no
        stop-token file) ' ' is itself an indexed term
        (segment.go:154-168)."""
        els = _split_elements(text)
        n = len(els)
        inf = float("inf")
        dist = [0.0] + [inf] * n
        back = [1] * (n + 1)  # elements consumed by the segment ending here
        for i in range(n):
            if dist[i] == inf:
                continue
            w = els[i][0]
            d = self.dist.get(w, _UNKNOWN_DISTANCE)
            if dist[i] + d < dist[i + 1]:
                dist[i + 1] = dist[i] + d
                back[i + 1] = 1
            cat = w
            for j in range(i + 1, min(n, i + self.max_len)):
                cat += els[j][0]
                d2 = self.dist.get(cat)
                if d2 is not None and dist[i] + d2 < dist[j + 1]:
                    dist[j + 1] = dist[i] + d2
                    back[j + 1] = j - i + 1
        segs: list[tuple[str, int]] = []
        i = n
        while i > 0:
            k = back[i]
            start = i - k
            word = "".join(e[0] for e in els[start:i])
            segs.append((word, els[start][1]))
            i = start
        segs.reverse()
        if keep_whitespace:
            return segs
        return [(w, p) for w, p in segs if w.strip()]

    def tokenize(
        self,
        text: str,
        stop_tokens: frozenset[str] = frozenset(),
        keep_whitespace: bool = False,
    ) -> tuple[list[tuple[str, list[int]]], int]:
        """riot tokensMap form: ([(term, positions)], num_tokens) —
        positions are byte offsets of every occurrence, num_tokens the
        segment count after stop filtering (segment.go:132-168,
        makeTokensMap segment.go:210-246).  keep_whitespace mirrors
        riot's Using=1 mode, validated by the per-shard BM25 golden
        (TestFrequenciesIndex: doc TokenLens count space segments)."""
        tmap: dict[str, list[int]] = {}
        num = 0
        for w, p in self.segment(text, keep_whitespace=keep_whitespace):
            if w in stop_tokens:
                continue
            num += 1
            tmap.setdefault(w, []).append(p)
        return list(tmap.items()), num
