"""riot-compat tokenizer modes (optional extras; the canonical mode is
external-tokens / whitespace per SURVEY.md §2.9.1).

`for_split_data` reproduces ForSplitData (segment.go:40-77): for each
word emit the word AND the cumulative concatenation w1..wi; positions
are RUNNING TOKEN COUNTERS (1-based), not byte offsets — a documented
quirk of Using=4/6. Using=6 additionally emits every forward
concatenation w_{i+1}..w_j.  `split_chars` mirrors splitData's
single-character mode (segment.go:79-126).

gse dictionary segmentation (T2) and pinyin expansion (T11) depend on
external data files absent from the reference checkout
(.MISSING_LARGE_BLOBS) and stay out of fidelity scope; see
`gse_segment`/`pinyin_tokens` stubs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from riot_spark.tokenizer import TOKENS_SCHEMA


def for_split_data(
    words: list[str],
    using: int = 4,
    stop_tokens: frozenset[str] = frozenset(),
) -> tuple[dict[str, list[int]], int]:
    """Pure-Python twin of ForSplitData — returns (tokensMap, numTokens)."""
    tokens_map: dict[str, list[int]] = {}
    num_tokens = 0
    split_str = ""
    for i, w in enumerate(words):
        if not w:
            continue
        if w not in stop_tokens:
            num_tokens += 1
            tokens_map.setdefault(w, []).append(num_tokens)
        split_str += w
        if split_str not in stop_tokens:
            num_tokens += 1
            tokens_map.setdefault(split_str, []).append(num_tokens)
        if using == 6:
            splits_str = ""
            for s in range(i + 1, len(words)):
                splits_str += words[s]
                if splits_str not in stop_tokens:
                    num_tokens += 1
                    tokens_map.setdefault(splits_str, []).append(num_tokens)
    return tokens_map, num_tokens


def split_chars(text: str) -> list[str]:
    """splitData single-character mode (segment.go:79-126): unicode
    characters, spaces dropped."""
    return [c for c in text if c != " "]


def tokenize_compat(
    documents: DataFrame,
    using: int = 4,
    stop_tokens: frozenset[str] = frozenset(),
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, positions, token_len) in riot Using=4/6/1
    semantics via one Arrow-batched mapInPandas.  Using in {4, 6}
    splits on spaces; Using=1 splits into characters first."""
    stop = stop_tokens

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = (
                    split_chars(text.lower())
                    if using in (0, 1, 3, 5)
                    else text.lower().split(" ")
                )
                tmap, num = for_split_data(words, 6 if using == 6 else 4, stop)
                for term, locs in tmap.items():
                    out.append(
                        (int(doc_id), term, float(len(locs)), locs, float(num))
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "term", "tf", "positions", "token_len"],
            )

    return documents.select("doc_id", text_col).mapInPandas(
        run, schema=TOKENS_SCHEMA
    )


def gse_segment(text: str):  # pragma: no cover - explicit stub
    raise NotImplementedError(
        "gse dictionary segmentation requires the gse dict blob, absent "
        "from the reference checkout (.MISSING_LARGE_BLOBS); canonical "
        "mode is external-tokens/whitespace (SURVEY.md §2.9.1)"
    )


def pinyin_tokens(
    text: str,
    py_map: dict[str, str] | None = None,
    gse=None,
    stop_tokens: frozenset[str] = frozenset(),
) -> list[str]:
    """Pinyin expansion — Engine.PinYin, segment.go:316-378 (the
    UsePhrase=false path).

    Emits, in riot's exact order: each char + the cumulative char
    prefix after every char (note: riot appends the single char AND
    the one-char prefix — first-char duplication is reference
    behavior); gse segment tokens when a segmenter is given; then the
    cumulative pinyin concatenations and cumulative first-letter
    (initials) prefixes.

    ``py_map`` is the per-character pinyin table (gpy.LazyConvert
    semantics: characters missing from the table are skipped).  The
    gpy data files are absent from the reference checkout, so the
    caller must inject a mapping; passing None raises.
    """
    if py_map is None:
        raise NotImplementedError(
            "pinyin expansion needs a char->pinyin table; the gpy data "
            "files are absent from the reference checkout — inject "
            "py_map (see tests/test_gse.py for the fixture pattern)"
        )
    out: list[str] = []
    split_str = ""
    for ch in text:
        if ch != "":
            if ch not in stop_tokens:
                out.append(ch)
            split_str += ch
        if split_str not in stop_tokens:
            out.append(split_str)
    if gse is not None:
        for tok, _pos in gse.segment(text):
            if tok not in stop_tokens:
                out.append(tok)
    py = [py_map[c] for c in text if c in py_map]
    py_str = ""
    initials = ""
    for syl in py:
        py_str += syl
        if py_str not in stop_tokens:
            out.append(py_str)
        if syl:
            initials += syl[0]
            if initials not in stop_tokens:
                out.append(initials)
    return out
