"""Golden vectors transcribed from the reference's own tests, checked
against the pure-Python oracle (FIXTURES.md §3).  No Spark here — these
pin the semantics the Spark engine is then tested against.
"""

from __future__ import annotations

import numpy as np

from riot_spark.config import BM25Params, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.oracle import OracleIndex, bm25_score_f32, token_proximity
from riot_spark.tokenizer import tokenize_text


def _lookup_table(idx: OracleIndex, tokens, labels=None, doc_ids=None):
    """[(doc_id, proximity, snippet_locs)] sorted doc_id desc (riot's
    scan order, core/indexer.go:446)."""
    docs = idx.lookup(tokens, labels, doc_ids)
    docs.sort(key=lambda r: -r["doc_id"])
    return [(r["doc_id"], r["proximity"], r["snippet_locs"]) for r in docs]


def make_locs_index():
    """Corpus of core/indexer_test.go:136-190 (TestLookupLocsIndex)."""
    idx = OracleIndex(index_type=LOCS_INDEX)
    idx.add_doc(1, tokens=[("token2", [0]), ("token3", [7])])
    idx.add_doc(2, tokens=[("token1", [0]), ("token2", [7]), ("token3", [14])])
    idx.add_doc(3, tokens=[("token1", [0]), ("token2", [7])])
    idx.add_doc(4, tokens=[("token2", [0])])
    idx.add_doc(7, tokens=[("token1", [0]), ("token3", [7])])
    idx.add_doc(9, tokens=[("token3", [0])])
    return idx


# expected tables from core/indexer_test.go:195-229 (docId desc order)
LOCS_LOOKUP_GOLDEN = {
    ("token4",): [],
    ("token1",): [(7, 0, [0]), (3, 0, [0]), (2, 0, [0])],
    ("token1", "token4"): [],
    ("token1", "token2"): [(3, 1, [0, 7]), (2, 1, [0, 7])],
    ("token2", "token1"): [(3, 13, [7, 0]), (2, 13, [7, 0])],
    ("token1", "token3"): [(7, 1, [0, 7]), (2, 8, [0, 14])],
    ("token3", "token1"): [(7, 13, [7, 0]), (2, 20, [14, 0])],
    ("token2", "token3"): [(2, 1, [7, 14]), (1, 1, [0, 7])],
    ("token3", "token2"): [(2, 13, [14, 7]), (1, 13, [7, 0])],
    ("token1", "token2", "token3"): [(2, 2, [0, 7, 14])],
    ("token3", "token2", "token1"): [(2, 26, [14, 7, 0])],
}


def test_locs_lookup_golden():
    idx = make_locs_index()
    for q, expected in LOCS_LOOKUP_GOLDEN.items():
        assert _lookup_table(idx, list(q)) == expected, q


def test_proximity_multi_position():
    """core/indexer_test.go:328-372 (TestLookupWithProximity)."""
    prox, locs = token_proximity([[0, 21], [28]], ["token2", "token3"])
    assert (prox, locs) == (1, [21, 28])
    prox, locs = token_proximity([[3], [0, 12], [15]], ["t1", "t2", "t3"])
    assert (prox, locs) == (8, [3, 12, 15])
    prox, locs = token_proximity([[6], [3, 19], [0, 22]], ["t1", "t2", "t3"])
    assert (prox, locs) == (10, [6, 3, 0])


def test_bm25_golden_76055():
    """core/indexer_test.go:405-441: k1=1, b=1, N=2, df=1 each,
    avgdl=4, doc len 6, tfs (3,7,15) => int(score*10000) == 76055."""
    score = bm25_score_f32(
        tfs=[3.0, 7.0, 15.0],
        dfs=[1, 1, 1],
        doc_len=6.0,
        n_docs=2,
        avgdl=4.0,
        params=BM25Params(k1=1.0, b=1.0),
        index_type=FREQUENCIES_INDEX,
    )
    assert int(score * 10000) == 76055

    idx = OracleIndex(index_type=FREQUENCIES_INDEX, params=BM25Params(k1=1.0, b=1.0))
    idx.add_doc(
        1,
        tokens=[("token2", [0, 21]), ("token3", [28]), ("token4", [7, 14, 35])],
        token_len=6.0,
    )
    # riot fixture stores tfs 3/7/15 explicitly; emulate via freqs
    idx.freqs["token2"][1] = 3.0
    idx.freqs["token3"][1] = 7.0
    idx.freqs["token4"][1] = 15.0
    idx.add_doc(2, tokens=[("token6", [0]), ("token7", [7])], token_len=2.0)
    out = idx.lookup(["token2", "token3", "token4"])
    assert len(out) == 1
    assert int(out[0]["score"] * 10000) == 76055


def test_partial_locations_label():
    """core/indexer_test.go:374-403: label keyword (empty positions)
    participates in intersection but proximity still computed over the
    content tokens only."""
    idx = OracleIndex(index_type=LOCS_INDEX)
    idx.add_doc(
        1,
        tokens=[("token2", [0, 21]), ("token3", [28]), ("token4", [7, 14, 35])],
        labels=["label1"],
    )
    idx.add_doc(2, tokens=[("token2", [0, 21]), ("token3", [28]), ("token4", [7, 14, 35])])
    out = _lookup_table(idx, ["token2", "token3"], labels=["label1"])
    assert out == [(1, 1, [21, 28])]


def test_docids_whitelist():
    """core/indexer_test.go:443-488 (TestLookupWithinDocIds)."""
    idx = make_locs_index()
    out = _lookup_table(idx, ["token2"], doc_ids={1, 3})
    assert out == [(3, 0, [7]), (1, 0, [0])]


def test_missing_keyword_short_circuit():
    idx = make_locs_index()
    assert idx.lookup(["token1", "nosuchterm"]) == []
    assert idx.lookup(["nosuchterm"]) == []


# --- e2e corpus (test_utils.go:103-137), external-tokens transcription ---
# Canonical tokenization (lower + split + gse-equivalent for the zh part
# is replaced by the pre-tokenized streams below, byte positions in the
# original text).  Proximity goldens from engine_test.go:36-61 are
# shard-independent and transcribed exactly.

E2E_DOCS = {
    1: [("the", [0]), ("world", [4]), (",", [9]), ("有", [11]),
        ("七十亿", [14]), ("人口", [23, 29])],  # 人口 = 6 UTF-8 bytes
    2: [("the", [0]), ("world", [4]), (",", [9]), ("人口", [11])],
    3: [("the", [0]), ("world", [4])],
    4: [("有", [0]), ("人口", [3])],
    5: [("the", [0]), ("world", [4]), (",", [9]), ("七十亿", [11]),
        ("人口", [20])],
    6: [("有", [0]), ("七十亿", [3]), ("人口", [12])],
}


# gse TokenLen = number of segments = total occurrences (人口 twice in
# doc1), not distinct terms — pinned explicitly per doc.
E2E_TOKEN_LENS = {1: 7.0, 2: 4.0, 3: 2.0, 4: 2.0, 5: 5.0, 6: 4.0}


def make_e2e_index(index_type=LOCS_INDEX):
    idx = OracleIndex(index_type=index_type)
    for doc_id, toks in E2E_DOCS.items():
        idx.add_doc(doc_id, tokens=toks, token_len=E2E_TOKEN_LENS[doc_id])
    return idx


def test_e2e_proximity_golden():
    """engine_test.go:36-61: query [world, 人口], proximity ranking
    1/(prox+1): docs [2, 5, 1], snippet locs [4,11],[4,20],[4,23]."""
    idx = make_e2e_index()
    docs = idx.lookup(["world", "人口"])
    by_id = {r["doc_id"]: r for r in docs}
    assert set(by_id) == {1, 2, 5}
    assert by_id[2]["proximity"] == 2 and by_id[2]["snippet_locs"] == [4, 11]
    assert by_id[5]["proximity"] == 11 and by_id[5]["snippet_locs"] == [4, 20]
    assert by_id[1]["proximity"] == 14 and by_id[1]["snippet_locs"] == [4, 23]
    # RankByTokenProximity scores: int(1000/(prox+1)) == 333, 83, 66
    assert [int(1000.0 / (by_id[d]["proximity"] + 1)) for d in (2, 5, 1)] == [
        333, 83, 66]


def test_e2e_bm25_global_stats():
    """NumShards=1 BM25 for the e2e corpus (the reference's own golden
    2374/2133 embeds shard-placement noise — SURVEY §2.9.4; fidelity is
    defined against single-shard stats): hand-computed expected values.
    N=6, avgdl=24/6=4, df(world)=4, df(人口)=5."""
    idx = make_e2e_index()
    ranked = idx.rank(["world", "人口"])
    got = [(r["doc_id"], int(r["score"] * 1000)) for r in ranked]
    assert got == [(2, 2459), (1, 2293), (5, 2186)]


def test_tokenizer_byte_positions():
    toks = dict(tokenize_text("The world, 有七十亿人口人口"))
    assert toks["the"] == [0]
    assert toks["world,"] == [4]  # whitespace tokenizer keeps punct
    # multi-byte: "有七十亿人口人口" starts at byte 11
    assert toks["有七十亿人口人口"] == [11]


def test_float32_accumulation_order():
    """Accumulation is float32 step-by-step — ensure we're not in double."""
    s = bm25_score_f32([1.0], [1], 1.0, 3, 1.0, BM25Params())
    assert isinstance(s, np.float32)
    assert abs(float(s) - np.float32(np.log2(4.0))) < 1e-6


# ------------------------------------------------- proximity DP fuzz

from itertools import product as _product

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=60),
                 min_size=1, max_size=4, unique=True),
        min_size=1, max_size=4,
    ),
    st.lists(st.sampled_from(["a", "bb", "ccc", "人口"]), min_size=4, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_token_proximity_dp_properties(positions, token_pool):
    """computeTokenProximity is a WINDOWED minimization — for each
    position of token i it considers only the two neighbor candidates
    of token i+1 (core/indexer.go:762-791), so its result can exceed
    the unrestricted global minimum on adversarial position sets (the
    goldens pin that this port matches riot, windowed behavior
    included).  Fuzzed invariants: the backtracked path realizes the
    reported proximity exactly, and the reported value never beats the
    true global minimum."""
    from itertools import product as _product

    positions = [sorted(p) for p in positions]
    tokens = token_pool[: len(positions)]
    tok_bytes = [len(t.encode("utf-8")) for t in tokens]
    prox, locs = token_proximity(positions, tokens)
    assert len(locs) == len(positions)
    for i, loc in enumerate(locs):
        assert loc in positions[i]
    got = sum(
        abs(locs[i + 1] - locs[i] - tok_bytes[i])
        for i in range(len(locs) - 1)
    )
    assert got == prox  # path consistency
    best = min(
        sum(
            abs(c[i + 1] - c[i] - tok_bytes[i])
            for i in range(len(c) - 1)
        )
        for c in _product(*positions)
    ) if len(positions) > 1 else 0
    assert prox >= best  # windowed min never beats the global min
