"""Property-based differential test: Spark engine vs the pure-Python
riot oracle on randomized queries over a seeded random corpus.

The corpus is built ONCE per module (Spark builds are expensive);
hypothesis explores the query space — token subsets, hot/rare/absent
mixes, offsets and limits — and every example must be rank-identical
with float32-equal scores.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from riot_spark.build import build_index
from riot_spark.config import EngineConfig, LOCS_INDEX
from riot_spark.oracle import OracleIndex
from riot_spark.query import SearchEngine, SearchRequest

VOCAB = (
    ["hot1", "hot2", "hot3"]
    + [f"mid{i}" for i in range(12)]
    + [f"rare{i}" for i in range(40)]
)


def _corpus(n_docs: int = 120, seed: int = 7) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    out = []
    for d in range(n_docs):
        n = rng.randint(3, 25)
        words = []
        for _ in range(n):
            r = rng.random()
            if r < 0.45:
                words.append(rng.choice(VOCAB[:3]))
            elif r < 0.8:
                words.append(rng.choice(VOCAB[3:15]))
            else:
                words.append(rng.choice(VOCAB[15:]))
        out.append((d, " ".join(words)))
    return out


@pytest.fixture(scope="module")
def engines(spark):
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    eng = SearchEngine(build_index(docs, cfg))
    oracle = OracleIndex(index_type=LOCS_INDEX)
    for doc_id, text in rows:
        oracle.add_doc(doc_id, text=text)
    return eng, oracle


query_strategy = st.tuples(
    st.lists(
        st.sampled_from(VOCAB + ["absent1", "absent2"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    st.integers(min_value=0, max_value=5),   # offset
    st.integers(min_value=0, max_value=15),  # limit
)


@given(query_strategy)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_queries_rank_identical(engines, query):
    tokens, offset, limit = query
    eng, oracle = engines
    got = eng.search(
        SearchRequest(
            tokens=tokens, offset=offset, max_outputs=limit, scorer="float32"
        )
    ).collect()
    want = oracle.rank(tokens, offset=offset, limit=limit)
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    np.testing.assert_array_equal(
        np.array([r["score"] for r in got], dtype=np.float32),
        np.array([np.float32(r["score"]) for r in want], dtype=np.float32),
    )
    assert [r["proximity"] for r in got] == [
        r["proximity"] for r in want
    ]


@pytest.fixture(scope="module")
def labeled_engines(spark):
    rows = _corpus(n_docs=80, seed=11)
    labeled = [(d, t, [f"lab{d % 4}"]) for d, t in rows]
    docs = spark.createDataFrame(
        labeled, "doc_id LONG, text STRING, labels ARRAY<STRING>"
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    eng = SearchEngine(build_index(docs, cfg, labels_col="labels"))
    oracle = OracleIndex(index_type=LOCS_INDEX)
    for doc_id, text, labs in labeled:
        oracle.add_doc(doc_id, text=text, labels=labs)
    return eng, oracle


@given(
    st.lists(st.sampled_from(VOCAB[:15]), min_size=1, max_size=2, unique=True),
    st.sampled_from(["lab0", "lab1", "lab2", "lab3", "labX"]),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_label_queries_rank_identical(labeled_engines, tokens, label):
    """Labels join the intersection but never score (T8/Q4);
    engine must match the oracle on every random (tokens, label) mix."""
    eng, oracle = labeled_engines
    got = eng.search(
        SearchRequest(tokens=tokens, labels=[label], scorer="float32")
    ).collect()
    want = oracle.rank(tokens, labels=[label])
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    np.testing.assert_array_equal(
        np.array([r["score"] for r in got], dtype=np.float32),
        np.array([np.float32(r["score"]) for r in want], dtype=np.float32),
    )


@pytest.fixture(scope="module")
def block_engine(engines):
    from riot_spark.blocks import BlockSearchEngine, blocked_from_index

    eng, _ = engines
    beng = BlockSearchEngine(blocked_from_index(eng.index, doc_block_bits=5))
    # the tiny property corpus is far below the df gates and its flat
    # bounds would fail the skew probe; force every gate open so BOTH
    # pruned walks (single-query _wand_topk and the batched
    # _wand_and_batch phases) stay under random-query fire — the
    # unpruned pass keeps its own coverage via the ineligible shapes
    # (rev/whitelist/count/orderless/logic) and test_blocks.py's
    # default-gated engines
    beng.WAND_MIN_POSTINGS = 0
    beng.WAND_BATCH_MIN_POSTINGS = 0
    beng.WAND_MIN_RANGES = 0
    beng.WAND_FLAT = 2.0
    return beng


@given(
    st.lists(
        st.sampled_from(VOCAB + ["absent1"]),
        min_size=1, max_size=3, unique=True,
    ),
    st.integers(min_value=0, max_value=12),  # k (0 = all)
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_block_engine_random_rank_identical(engines, block_engine, tokens, k):
    """Packed-block kernel (incl. the WAND path when k > 0) must be
    rank-identical to the flat float32 engine on random queries."""
    eng, _ = engines
    flat = eng.search(
        SearchRequest(tokens=tokens, scorer="float32", max_outputs=k)
    ).collect()
    got = block_engine.search_and(tokens, k=k).collect()
    if k == 0:
        got = sorted(got, key=lambda r: (-np.float32(r["score"]), r["doc_id"]))
        flat = sorted(flat, key=lambda r: (-np.float32(r["score"]), r["doc_id"]))
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in flat]
    np.testing.assert_array_equal(
        np.array([r["score"] for r in got], dtype=np.float32),
        np.array([r["score"] for r in flat], dtype=np.float32),
    )


@given(
    st.lists(st.sampled_from(VOCAB[:20] + ["absentm"]), max_size=2, unique=True),
    st.lists(st.sampled_from(VOCAB[:20]), max_size=2, unique=True),
    st.lists(st.sampled_from(VOCAB[:20]), max_size=2, unique=True),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_logic_random_matches_set_algebra(engines, must, should, not_in):
    """must/should/notIn (Q7) vs a direct set-algebra oracle over the
    corpus, including riot's notIn-only quirk."""
    if not (must or should or not_in):
        return
    eng, oracle = engines
    # pure-Python expected set from the oracle's posting table
    def docs_of(t):
        return set(oracle.table.get(t, {}))
    if must and any(t not in oracle.table for t in must):
        want = set()
    elif must:
        want = set.intersection(*[docs_of(t) for t in must])
        if should:
            if not any(t in oracle.table for t in should):
                want = set()
            else:
                want &= set.union(*[docs_of(t) for t in should])
        want -= set.union(*[docs_of(t) for t in not_in]) if not_in else set()
    elif should:
        if not any(t in oracle.table for t in should):
            want = set()
        else:
            want = set.union(*[docs_of(t) for t in should])
            want -= set.union(*[docs_of(t) for t in not_in]) if not_in else set()
    else:  # notIn-only quirk: the notIn docs themselves
        want = set.union(*[docs_of(t) for t in not_in])
    got = eng.search(
        SearchRequest(must=must, should=should, not_in=not_in)
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(want)


shape_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(VOCAB[:15] + ["absent1"]),
                 min_size=1, max_size=2, unique=True),
        st.sampled_from(["native", "float32", "prox", "rev", "count",
                         "orderless", "logic"]),
        st.integers(min_value=0, max_value=8),   # k
        st.integers(min_value=0, max_value=2),   # offset
    ),
    min_size=2, max_size=6,
)


@given(shape_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_search_batch_random_shapes_match_single(engines, shapes):
    """search_batch vs per-query search() over randomized request
    shapes — docs, scores, and per-query order must agree for every
    ranked shape; counts and orderless sets must agree too."""
    eng, _ = engines
    reqs = {}
    for i, (toks, shape, k, off) in enumerate(shapes):
        if shape == "native":
            r = SearchRequest(tokens=toks, max_outputs=k, offset=off)
        elif shape == "float32":
            r = SearchRequest(tokens=toks, scorer="float32", max_outputs=k,
                              offset=off)
        elif shape == "prox":
            r = SearchRequest(tokens=toks, scorer="float32",
                              criteria="proximity", max_outputs=k, offset=off)
        elif shape == "rev":
            r = SearchRequest(tokens=toks, reverse_order=True, max_outputs=k,
                              offset=off)
        elif shape == "count":
            r = SearchRequest(tokens=toks, count_docs_only=True)
        elif shape == "orderless":
            r = SearchRequest(tokens=toks, orderless=True)
        else:
            r = SearchRequest(must=toks[:1], should=toks[1:],
                              max_outputs=k, offset=off)
        reqs[f"q{i}"] = r
    batch = eng.search_batch(reqs).collect()
    by_qid: dict[str, list] = {}
    for row in batch:
        by_qid.setdefault(row["query_id"], []).append(row)
    for qid, req in reqs.items():
        single = eng.search(req).collect()
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        if req.count_docs_only:
            n = single[0]["num_docs"]
            assert len(got) == 1 and int(got[0]["score"]) == n, qid
        elif req.orderless or (req.must or req.should):
            assert sorted(r["doc_id"] for r in got) == sorted(
                r["doc_id"] for r in single
            ), qid
        else:
            assert [r["doc_id"] for r in got] == [
                r["doc_id"] for r in single
            ], qid
            np.testing.assert_allclose(
                [r["score"] for r in got], [r["score"] for r in single],
                rtol=1e-5, atol=1e-6, err_msg=qid,
            )


block_shape_strategy = st.lists(
    st.tuples(
        st.lists(st.sampled_from(VOCAB[:15] + ["absent1"]),
                 min_size=1, max_size=2, unique=True),
        st.sampled_from(["native", "rev", "wl", "count", "orderless",
                         "logic"]),
        st.integers(min_value=0, max_value=8),   # k
        st.integers(min_value=0, max_value=2),   # offset
    ),
    min_size=2, max_size=6,
)


@given(block_shape_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_block_batch_random_shapes_match_flat(engines, block_engine, shapes):
    """BlockSearchEngine.search_batch vs the flat engine's batch over
    randomized request shapes: the decode-once multi-query dispatch
    must stay value- and rank-identical on every family (AND top-k,
    ReverseOrder, whitelist, logic, count, orderless)."""
    eng, _ = engines
    reqs = {}
    for i, (toks, shape, k, off) in enumerate(shapes):
        if shape == "native":
            r = SearchRequest(tokens=toks, max_outputs=k, offset=off)
        elif shape == "rev":
            r = SearchRequest(tokens=toks, reverse_order=True,
                              max_outputs=k, offset=off)
        elif shape == "wl":
            r = SearchRequest(tokens=toks, doc_ids=list(range(0, 120, 3)),
                              max_outputs=k, offset=off)
        elif shape == "count":
            r = SearchRequest(tokens=toks, count_docs_only=True)
        elif shape == "orderless":
            r = SearchRequest(tokens=toks, orderless=True)
        else:
            r = SearchRequest(must=toks[:1], should=toks[1:],
                              max_outputs=k, offset=off)
        reqs[f"q{i}"] = r
    got_rows = block_engine.search_batch(reqs).collect()
    want_rows = eng.search_batch(reqs).collect()

    def by_qid(rows):
        out: dict[str, list] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r)
        return out

    got, want = by_qid(got_rows), by_qid(want_rows)
    assert set(got) == set(want)
    for qid in want:
        g = sorted(got[qid], key=lambda r: (r["rank"], r["doc_id"] or -1))
        w = sorted(want[qid], key=lambda r: (r["rank"], r["doc_id"] or -1))
        assert [(r["doc_id"], r["rank"]) for r in g] == [
            (r["doc_id"], r["rank"]) for r in w
        ], qid
        np.testing.assert_allclose(
            [r["score"] for r in g], [r["score"] for r in w],
            rtol=1e-5, atol=1e-6, err_msg=qid,
        )


@given(
    cuts=st.lists(
        st.integers(min_value=1, max_value=119), min_size=1, max_size=3,
        unique=True,
    ),
    toks=st.lists(
        st.sampled_from(VOCAB[:15]), min_size=1, max_size=3, unique=True
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_lsm_fold_random_cuts_match_full_build(spark, engines, cuts, toks):
    """Property: splitting the corpus at ANY random doc-id cut points,
    packing each slice as its own block store and folding them with
    merge_blocked_many answers exactly like the one-shot full build —
    boundary ranges, rescaled WAND metadata, re-weighted stats and
    all."""
    from riot_spark.blocks import (
        BlockSearchEngine, blocked_from_index, merge_blocked_many,
    )

    eng, _ = engines
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    bounds = [0] + sorted(cuts) + [120]
    parts = [
        blocked_from_index(
            build_index(
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                cfg,
            ),
            doc_block_bits=4,  # 16-doc ranges: every cut hits a boundary
            cache=False,
        )
        for lo, hi in zip(bounds, bounds[1:])
        if lo < hi
    ]
    merged = merge_blocked_many(parts, cache=False)
    got = BlockSearchEngine(merged).search_and(list(toks), k=30).collect()
    want = eng.search(
        SearchRequest(tokens=list(toks), scorer="float32", max_outputs=30)
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]
