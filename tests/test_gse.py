"""Dict-DAG segmentation parity: the reference's own e2e corpus driven
from RAW text through MiniGse (testdata/test_dict.txt), reproducing
engine_test.go:36-61 (TestEngineIndexDoc) end to end — previously the
token streams were hand-transcribed.

The BM25 goldens of TestFrequenciesIndex are NOT reproduced here: riot
computes N/avgdl/df per shard (8 by default, core/indexer.go:445), so
those scores embed the murmur3 doc->shard layout; parity is defined at
NumShards=1 (SURVEY.md §2.9.4).  The proximity goldens are
shard-independent and transcribed exactly.
"""

from __future__ import annotations

import os

import pytest

from riot_spark.config import EngineConfig, LOCS_INDEX
from riot_spark.oracle import OracleIndex

DICT = "/root/reference/testdata/test_dict.txt"
pytestmark = pytest.mark.skipif(
    not os.path.exists(DICT), reason="reference test dict not present"
)

# test_utils.go:103-137 AddDocs corpus (raw content)
E2E_CONTENT = {
    1: "The world, 有七十亿人口人口",
    2: "The world, 人口",
    3: "The world",
    4: "有人口",
    5: "The world, 七十亿人口",
    6: "有七十亿人口",
}

# engine_test.go:36-61: query "World人口" -> tokens [world, 人口],
# proximity criteria 1/(prox+1): (doc, int(score*1000), snippet locs)
E2E_GOLDEN = [(2, 333, [4, 11]), (5, 83, [4, 20]), (1, 66, [4, 23])]


@pytest.fixture(scope="module")
def gse():
    from riot_spark.gse import MiniGse

    return MiniGse(DICT)


def test_segment_streams(gse):
    """Byte-exact segment streams for the 6-doc corpus."""
    assert gse.tokenize(E2E_CONTENT[1]) == (
        [("the", [0]), ("world", [4]), (",", [9]), ("有", [11]),
         ("七十亿", [14]), ("人口", [23, 29])],
        7,
    )
    assert gse.tokenize(E2E_CONTENT[4]) == ([("有", [0]), ("人口", [3])], 2)
    assert gse.tokenize(E2E_CONTENT[6]) == (
        [("有", [0]), ("七十亿", [3]), ("人口", [12])], 3
    )
    # query path (engine.go:500-525, lowercased then segmented)
    assert gse.segment("World人口".lower()) == [("world", 0), ("人口", 5)]


def test_e2e_golden_python_oracle(gse):
    idx = OracleIndex(index_type=LOCS_INDEX)
    for doc_id, content in E2E_CONTENT.items():
        toks, num = gse.tokenize(content)
        idx.add_doc(doc_id, tokens=toks, token_len=float(num))
    docs = idx.lookup(["world", "人口"])
    ranked = sorted(
        (
            (r["doc_id"], int(1000.0 / (r["proximity"] + 1)), r["snippet_locs"])
            for r in docs
        ),
        key=lambda x: (-x[1], x[0]),
    )
    assert ranked == E2E_GOLDEN


def test_frequencies_index_per_shard_golden(gse):
    """TestFrequenciesIndex (engine_test.go:181-208): NumShards=8 BM25
    with PER-SHARD stats (core/indexer.go:445,540).  Emulating the
    murmur shard layout (docs 1 and 5 co-resident, no other doc in
    that shard) and Using=1 TokenLens (space segments counted) must
    reproduce int(score*1000) == 2374 / 2133 bit-exactly."""
    import numpy as np

    from riot_spark.config import BM25Params, FREQUENCIES_INDEX
    from riot_spark.shards import shard_of

    shards: dict[int, OracleIndex] = {}
    for doc_id, content in E2E_CONTENT.items():
        sh = shard_of(str(doc_id), content, num_shards=8)
        idx = shards.setdefault(
            sh, OracleIndex(index_type=FREQUENCIES_INDEX, params=BM25Params())
        )
        toks, num = gse.tokenize(content, keep_whitespace=True)
        idx.add_doc(doc_id, tokens=toks, token_len=float(num))
    # the one observable layout fact: docs 1 and 5 share a shard alone
    sh15 = shard_of("1", E2E_CONTENT[1])
    assert shard_of("5", E2E_CONTENT[5]) == sh15
    assert sorted(shards[sh15].doc_lens) == [1, 5]
    assert shards[sh15].doc_lens == {1: 9.0, 5: 7.0}  # space segments count
    scores: dict[int, int] = {}
    for idx in shards.values():
        for r in idx.lookup(["world", "人口"]):
            scores[r["doc_id"]] = int(np.float32(r["score"]) * 1000)
    # BM25ScoringCriteria drops docs without ScoringFields (2, 3, 4)
    assert scores[1] == 2374
    assert scores[5] == 2133


def test_e2e_reverse_and_offset_golden(spark, gse):
    """TestReverseOrder (engine_test.go:68-80: ascending proximity
    ranking -> docs [1, 5, 2]) and TestSearchOffsetMax
    (engine_test.go:84-104: ReverseOrder + offset 1, max 3 -> [5, 2]),
    driven from raw content through MiniGse."""
    from riot_spark.build import build_index_from_tokens
    from riot_spark.query import SearchEngine, SearchRequest

    rows, lens = [], []
    for doc_id, content in E2E_CONTENT.items():
        toks, num = gse.tokenize(content)
        rows.extend((doc_id, t, float(len(p)), list(p)) for t, p in toks)
        lens.append((doc_id, float(num)))
    idx = build_index_from_tokens(
        spark.createDataFrame(
            rows, "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>"
        ),
        EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4),
        doc_stats=spark.createDataFrame(lens, "doc_id LONG, token_len FLOAT"),
        unique_postings=True,
    )
    eng = SearchEngine(idx)
    rev = eng.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32",
                      criteria="proximity", reverse_order=True, max_outputs=10)
    ).collect()
    assert [r["doc_id"] for r in rev] == [1, 5, 2]
    sliced = eng.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32",
                      criteria="proximity", reverse_order=True,
                      offset=1, max_outputs=3)
    ).collect()
    assert [r["doc_id"] for r in sliced] == [5, 2]


def test_e2e_with_tokens_golden(spark, gse):
    """TestEngineIndexWithTokens (engine_test.go:248-305): docs 1 and 2
    indexed via EXTERNAL token streams (Content empty, Using=2-style
    fallback inside Using=1 — segment.go:172-185), doc 3 via gse
    content segmentation; proximity-criteria goldens 500/83/71 with
    snippet locs reproduced through the Spark engine."""
    import numpy as np

    from riot_spark.build import build_index_from_tokens
    from riot_spark.query import SearchEngine, SearchRequest

    rows = [
        (1, "world", [0]), (1, "人口", [18, 24]),
        (2, "world", [0]), (2, "人口", [6]),
    ]
    toks3, num3 = gse.tokenize("The world, 七十亿人口")
    rows += [(3, t, p) for t, p in toks3]
    toks_df = spark.createDataFrame(
        [(d, t, float(len(p)), list(p)) for d, t, p in rows],
        "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>",
    )
    doc_stats = spark.createDataFrame(
        [(1, 2.0), (2, 2.0), (3, float(num3))], "doc_id LONG, token_len FLOAT"
    )
    idx = build_index_from_tokens(
        toks_df,
        EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4),
        doc_stats=doc_stats,
        unique_postings=True,
    )
    res = SearchEngine(idx).search(
        SearchRequest(tokens=["world", "人口"], scorer="float32",
                      criteria="proximity", max_outputs=10)
    ).collect()
    got = [
        (r["doc_id"], int(np.float32(r["score"]) * 1000),
         list(r["snippet_locs"]))
        for r in res
    ]
    assert got == [(2, 500, [0, 6]), (3, 83, [4, 20]), (1, 71, [0, 18])]


PY_MAP = {"世": "shi", "界": "jie", "有": "you", "七": "qi",
          "十": "shi", "亿": "yi", "人": "ren", "口": "kou"}


def test_pinyin_expansion(gse):
    """Engine.PinYin order-exact (segment.go:316-378): chars +
    cumulative prefixes (first char duplicated — reference behavior),
    gse segments, cumulative pinyin and initials."""
    from riot_spark.compat import pinyin_tokens

    got = pinyin_tokens("世界", PY_MAP, gse=gse)
    assert got == ["世", "世", "界", "世界", "世界",
                   "shi", "s", "shijie", "sj"]
    # without a segmenter; stop tokens filter every surface
    got = pinyin_tokens("人口", PY_MAP, stop_tokens=frozenset({"人"}))
    assert got == ["口", "人口", "ren", "r", "renkou", "rk"]
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        pinyin_tokens("世界")  # gpy data absent => mapping required


def test_e2e_golden_spark(spark, gse):
    """The same golden through the Spark engine: raw text -> MiniGse
    streams -> index -> proximity-criteria ranking."""
    import numpy as np

    from riot_spark.build import build_index_from_tokens
    from riot_spark.query import SearchEngine, SearchRequest

    rows = []
    lens = []
    for doc_id, content in E2E_CONTENT.items():
        toks, num = gse.tokenize(content)
        rows.extend(
            (doc_id, t, float(len(p)), list(p)) for t, p in toks
        )
        lens.append((doc_id, float(num)))
    toks_df = spark.createDataFrame(
        rows, "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>"
    )
    doc_stats = spark.createDataFrame(lens, "doc_id LONG, token_len FLOAT")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    idx = build_index_from_tokens(
        toks_df, cfg, doc_stats=doc_stats, unique_postings=True
    )
    res = SearchEngine(idx).search(
        SearchRequest(
            tokens=["world", "人口"], scorer="float32", criteria="proximity",
            max_outputs=10,
        )
    ).collect()
    got = [
        (r["doc_id"], int(np.float32(r["score"]) * 1000),
         list(r["snippet_locs"]))
        for r in res
    ]
    assert got == E2E_GOLDEN
