"""Spark engine vs the transcribed goldens + the pure-Python oracle.

The float32 scorer must be bit-exact to riot; the native (columnar)
scorer must be rank-identical with scores equal to float32 tolerance.
"""

from __future__ import annotations

import numpy as np
import pytest

from riot_spark.build import build_index_from_tokens
from riot_spark.config import BM25Params, EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.tokenizer import label_tokens

from tests.conftest import tokens_df
from tests.test_oracle import E2E_DOCS, E2E_TOKEN_LENS, LOCS_LOOKUP_GOLDEN, make_e2e_index

LOCS_DOCS = [
    (1, "token2", [0]), (1, "token3", [7]),
    (2, "token1", [0]), (2, "token2", [7]), (2, "token3", [14]),
    (3, "token1", [0]), (3, "token2", [7]),
    (4, "token2", [0]),
    (7, "token1", [0]), (7, "token3", [7]),
    (9, "token3", [0]),
]


@pytest.fixture(scope="module")
def locs_engine(spark):
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    idx = build_index_from_tokens(tokens_df(spark, LOCS_DOCS), cfg)
    return SearchEngine(idx)


@pytest.fixture(scope="module")
def e2e_engine(spark):
    rows = [(d, t, p) for d, toks in E2E_DOCS.items() for t, p in toks]
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    doc_stats = spark.createDataFrame(
        [(d, float(v)) for d, v in E2E_TOKEN_LENS.items()],
        "doc_id LONG, token_len FLOAT",
    )
    idx = build_index_from_tokens(tokens_df(spark, rows), cfg, doc_stats=doc_stats)
    return SearchEngine(idx)


def _table(engine, tokens, scorer="float32", **kw):
    res = engine.search(SearchRequest(tokens=tokens, scorer=scorer, **kw)).collect()
    # golden tables are in docId-desc order
    rows = sorted(res, key=lambda r: -r["doc_id"])
    return [
        (r["doc_id"], r["proximity"], list(r["snippet_locs"] or []))
        for r in rows
    ]


def test_locs_lookup_golden_spark(locs_engine):
    for q, expected in LOCS_LOOKUP_GOLDEN.items():
        assert _table(locs_engine, list(q)) == expected, q


def test_docids_whitelist_spark(locs_engine):
    got = _table(locs_engine, ["token2"], doc_ids=[1, 3])
    assert got == [(3, 0, [7]), (1, 0, [0])]


def test_count_docs_only(locs_engine):
    res = locs_engine.search(
        SearchRequest(tokens=["token2", "token3"], count_docs_only=True)
    ).collect()
    assert res[0]["num_docs"] == 2


def test_orderless(locs_engine):
    res = locs_engine.search(
        SearchRequest(tokens=["token2", "token3"], orderless=True)
    ).collect()
    assert sorted(r["doc_id"] for r in res) == [1, 2]


def test_e2e_bm25_both_scorers(e2e_engine):
    oracle = make_e2e_index()
    expect = [(r["doc_id"], r["score"]) for r in oracle.rank(["world", "人口"])]
    for scorer in ("float32", "native"):
        res = e2e_engine.search(
            SearchRequest(tokens=["world", "人口"], scorer=scorer)
        ).collect()
        got = [(r["doc_id"], r["score"]) for r in res]
        assert [g[0] for g in got] == [e[0] for e in expect], scorer
        for (gd, gs), (ed, es) in zip(got, expect):
            if scorer == "float32":
                assert np.float32(gs) == np.float32(es), (scorer, gd)
            else:
                assert abs(gs - float(es)) < 1e-5, (scorer, gd)
    # golden int(score*1000) from NumShards=1 hand computation
    res = e2e_engine.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32")
    ).collect()
    assert [(r["doc_id"], int(r["score"] * 1000)) for r in res] == [
        (2, 2459), (1, 2293), (5, 2186)]


def test_e2e_proximity_golden_spark(e2e_engine):
    res = e2e_engine.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32")
    ).collect()
    by_id = {r["doc_id"]: r for r in res}
    assert by_id[2]["proximity"] == 2 and list(by_id[2]["snippet_locs"]) == [4, 11]
    assert by_id[5]["proximity"] == 11 and list(by_id[5]["snippet_locs"]) == [4, 20]
    assert by_id[1]["proximity"] == 14 and list(by_id[1]["snippet_locs"]) == [4, 23]


def test_offset_and_max_outputs(e2e_engine):
    """engine_test.go:84-104 golden: RankByTokenProximity criteria,
    reverse order, offset 1, max 3 over asc [1,5,2] => [5, 2]."""
    res = e2e_engine.search(
        SearchRequest(
            tokens=["world", "人口"], reverse_order=True, offset=1, max_outputs=3,
            scorer="float32", criteria="proximity",
        )
    ).collect()
    assert [r["doc_id"] for r in res] == [5, 2]


def test_reverse_order(e2e_engine):
    """engine_test.go:66-82 golden (proximity criteria): [1, 5, 2]."""
    res = e2e_engine.search(
        SearchRequest(
            tokens=["world", "人口"], reverse_order=True, scorer="float32",
            criteria="proximity",
        )
    ).collect()
    assert [r["doc_id"] for r in res] == [1, 5, 2]
    # proximity ranking desc: engine_test.go:36-61 => [2, 5, 1], scores
    # int(score*1000) == 333, 83, 66
    res = e2e_engine.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32", criteria="proximity")
    ).collect()
    assert [(r["doc_id"], int(r["score"] * 1000)) for r in res] == [
        (2, 333), (5, 83), (1, 66)]


def test_custom_scoring_criteria(e2e_engine):
    """Q8: custom callable criteria; None score drops the doc
    (core/ranker.go:135,192 empty-slice semantics)."""

    def crit(pdf):
        import pandas as pd

        # drop doc 5, rank others by doc_id
        return pd.Series(
            [None if d == 5 else float(d) for d in pdf["doc_id"]], dtype="Float32"
        )

    res = e2e_engine.search(
        SearchRequest(tokens=["world", "人口"], scorer="float32", criteria=crit)
    ).collect()
    assert [r["doc_id"] for r in res] == [2, 1]


def test_missing_token_empty(e2e_engine):
    res = e2e_engine.search(SearchRequest(tokens=["world", "nosuch"])).collect()
    assert res == []


def test_labels_participate_in_intersection(spark):
    """Label keywords intersect but don't score (segment.go:264-279,
    core/indexer.go:528): partial-locations guard keeps the doc with
    proximity computed over content tokens."""
    rows = [
        (1, "token2", [0, 21]), (1, "token3", [28]), (1, "token4", [7, 14, 35]),
        (2, "token2", [0, 21]), (2, "token3", [28]), (2, "token4", [7, 14, 35]),
    ]
    labels = label_tokens(
        spark.createDataFrame([(1, ["label1"])], "doc_id LONG, labels ARRAY<STRING>")
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=2)
    idx = build_index_from_tokens(tokens_df(spark, rows), cfg, labels=labels)
    engine = SearchEngine(idx)
    for scorer in ("float32", "native"):
        res = engine.search(
            SearchRequest(tokens=["token2", "token3"], labels=["label1"], scorer=scorer)
        ).collect()
        assert [r["doc_id"] for r in res] == [1], scorer
        if scorer == "float32":
            assert res[0]["proximity"] == 1
            assert list(res[0]["snippet_locs"]) == [21, 28]


def test_batch_unscorable_guard_matches_single(spark):
    """search_batch must apply the LocsIndex partial-locations guard
    (indexer.go:489-507): a query token that collides with a label term
    zeroes the doc score in BOTH the batch and single-query paths."""
    rows = [
        (1, "token2", [0]), (1, "token3", [7]),
        (2, "token3", [0]),
    ]
    labels = label_tokens(
        spark.createDataFrame([(2, ["token2"])], "doc_id LONG, labels ARRAY<STRING>")
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=2)
    idx = build_index_from_tokens(tokens_df(spark, rows), cfg, labels=labels)
    eng = SearchEngine(idx)
    req = SearchRequest(tokens=["token2", "token3"])
    single = {r["doc_id"]: r["score"] for r in eng.search(req).collect()}
    batch = {
        r["doc_id"]: r["score"]
        for r in eng.search_batch({"q": req}).collect()
    }
    assert set(single) == set(batch) == {1, 2}
    assert batch[2] == 0.0  # label-collision doc: zero score, both paths
    for d in single:
        np.testing.assert_allclose(batch[d], single[d], rtol=1e-5, atol=1e-6)


def test_label_content_collision_content_wins(spark):
    """A term that is BOTH a content token and a label of the same doc
    keeps its content posting (riot injects a label only when the
    tokensMap lacks the key, segment.go:264-279) — the doc scores
    normally, it is NOT unscorable."""
    from riot_spark.build import build_index
    from riot_spark.oracle import OracleIndex

    rows = [
        (1, "token2 token3", ["token2"]),   # token2 content AND label
        (2, "token2 token3", []),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, labels ARRAY<STRING>")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=2)
    idx = build_index(docs, cfg, labels_col="labels")
    eng = SearchEngine(idx)
    oracle = OracleIndex(index_type=LOCS_INDEX)
    for d, text, labs in rows:
        oracle.add_doc(d, text=text, labels=labs)
    want = {r["doc_id"]: np.float32(r["score"]) for r in oracle.lookup(["token2", "token3"])}
    assert all(v > 0 for v in want.values())  # collision must still score
    req = SearchRequest(tokens=["token2", "token3"])
    for scorer in ("native", "float32"):
        req.scorer = scorer
        got = {r["doc_id"]: np.float32(r["score"]) for r in eng.search(req).collect()}
        assert set(got) == {1, 2}, scorer
        for d in got:
            np.testing.assert_allclose(got[d], want[d], rtol=1e-6, err_msg=scorer)
    # batch path
    got = {r["doc_id"]: np.float32(r["score"])
           for r in eng.search_batch({"q": SearchRequest(tokens=["token2", "token3"])}).collect()}
    for d in got:
        np.testing.assert_allclose(got[d], want[d], rtol=1e-6)
    # block path
    from riot_spark.blocks import BlockSearchEngine, blocked_from_index

    beng = BlockSearchEngine(blocked_from_index(idx, doc_block_bits=4))
    got = {r["doc_id"]: np.float32(r["score"])
           for r in beng.search_and(["token2", "token3"]).collect()}
    for d in got:
        np.testing.assert_allclose(got[d], want[d], rtol=1e-6)


def test_external_duplicate_postings_no_false_and(spark):
    """External token streams (Using=2) may carry duplicate (term, doc)
    rows; intersection must count distinct terms so a duplicated token
    cannot fake an AND match (ADVICE: _n_match count(*) invariant)."""
    toks = spark.createDataFrame(
        [(1, "a", 1.0, [0]), (1, "a", 1.0, [2]), (2, "a", 1.0, [0]),
         (2, "b", 1.0, [2])],
        "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>",
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=2)
    idx = build_index_from_tokens(toks, cfg)  # external => untrusted
    eng = SearchEngine(idx)
    res = eng.search(SearchRequest(tokens=["a", "b"])).collect()
    assert sorted(r["doc_id"] for r in res) == [2]


def test_logic_lookup(e2e_engine):
    """must/should/notIn set algebra (core/indexer.go:561-685)."""
    # must=[world] should=[七十亿, 有] -> docs with world AND (七十亿 or 有)
    res = e2e_engine.search(
        SearchRequest(must=["world"], should=["七十亿", "有"])
    ).collect()
    assert sorted(r["doc_id"] for r in res) == [1, 5]
    # must + notIn
    res = e2e_engine.search(
        SearchRequest(must=["world"], not_in=["七十亿"])
    ).collect()
    assert sorted(r["doc_id"] for r in res) == [2, 3]
    # should only, minus notIn
    res = e2e_engine.search(
        SearchRequest(should=["有", "七十亿"], not_in=["world"])
    ).collect()
    assert sorted(r["doc_id"] for r in res) == [4, 6]
    # notIn only: riot returns the notIn docs themselves (indexer.go:660-682)
    res = e2e_engine.search(SearchRequest(not_in=["七十亿"])).collect()
    assert sorted(r["doc_id"] for r in res) == [1, 5, 6]
    # missing must term => empty
    res = e2e_engine.search(
        SearchRequest(must=["world", "nosuch"], should=["有"])
    ).collect()
    assert res == []


def test_freq_index_mode(spark):
    """FrequenciesIndex: stored tf drives BM25; the 76055 golden
    end-to-end through Spark (core/indexer_test.go:405-441)."""
    rows = [
        (1, "token2", 3.0), (1, "token3", 7.0), (1, "token4", 15.0),
        (2, "token6", 3.0), (2, "token7", 15.0),
    ]
    toks = spark.createDataFrame(
        [(d, t, tf, None) for d, t, tf in rows],
        "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>",
    )
    doc_stats = spark.createDataFrame(
        [(1, 6.0), (2, 2.0)], "doc_id LONG, token_len FLOAT"
    )
    cfg = EngineConfig(
        index_type=FREQUENCIES_INDEX,
        bm25=BM25Params(k1=1.0, b=1.0),
        num_index_partitions=2,
    )
    idx = build_index_from_tokens(toks, cfg, doc_stats=doc_stats)
    engine = SearchEngine(idx)
    for scorer in ("float32", "native"):
        res = engine.search(
            SearchRequest(tokens=["token2", "token3", "token4"], scorer=scorer)
        ).collect()
        assert len(res) == 1 and res[0]["doc_id"] == 1, scorer
        assert int(res[0]["score"] * 10000) == 76055, scorer


def test_search_batch_mixed_shapes(spark):
    """A mixed batch — native AND, ReverseOrder, whitelist, float32,
    proximity criteria, orderless, count, logic — must agree with
    per-query search() on every returned row."""
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=LOCS_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    reqs = {
        "and1": SearchRequest(text="data query", max_outputs=10),
        "and2": SearchRequest(text="batch", max_outputs=5, offset=3),
        "rev": SearchRequest(text="data query", max_outputs=10,
                             reverse_order=True),
        "wl": SearchRequest(text="data", doc_ids=list(range(0, 100, 2)),
                            max_outputs=10),
        "f32": SearchRequest(tokens=["data", "query"], scorer="float32",
                             max_outputs=10),
        "crit": SearchRequest(tokens=["data", "query"], scorer="float32",
                              criteria="proximity", max_outputs=10),
        "orderless": SearchRequest(text="group order", orderless=True),
        "count": SearchRequest(text="data query", count_docs_only=True),
        "logic": SearchRequest(must=["data"], should=["query", "spark"],
                               not_in=["dup"]),
        "missing": SearchRequest(text="data zzzqx", max_outputs=10),
    }
    batch = eng.search_batch(reqs).collect()
    by_qid: dict[str, list] = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(r)
    assert "missing" not in by_qid

    # ranked shapes: doc order and scores must match search()
    for qid in ("and1", "and2", "rev", "wl", "f32", "crit"):
        single = eng.search(reqs[qid]).collect()
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], qid
        np.testing.assert_allclose(
            [r["score"] for r in got], [r["score"] for r in single],
            rtol=1e-5, atol=1e-6, err_msg=qid,
        )
    # orderless: same candidate set, ranked by doc_id
    single = eng.search(reqs["orderless"]).collect()
    got = by_qid["orderless"]
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in single
    )
    # count: one row, score == num_docs, doc_id NULL
    n = eng.search(reqs["count"]).collect()[0]["num_docs"]
    crow = by_qid["count"]
    assert len(crow) == 1 and crow[0]["doc_id"] is None
    assert int(crow[0]["score"]) == n and crow[0]["rank"] == 0
    # logic: same doc set
    single = eng.search(reqs["logic"]).collect()
    assert sorted(r["doc_id"] for r in by_qid["logic"]) == sorted(
        r["doc_id"] for r in single
    )


def test_search_batch_matches_per_query(spark):
    """search_batch (one job, window top-k) must agree with per-query
    search() on docs, scores, and order for every batchable request."""
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    reqs = {
        "q1": SearchRequest(text="data query", max_outputs=10),
        "q2": SearchRequest(text="batch", max_outputs=5, offset=3),
        "q3": SearchRequest(text="data zzzqx", max_outputs=10),  # missing
        "q4": SearchRequest(text="group order"),  # unlimited
    }
    batch = eng.search_batch(reqs).collect()
    by_qid: dict[str, list] = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(r)
    assert "q3" not in by_qid  # missing term => no rows
    for qid, req in reqs.items():
        if qid == "q3":
            continue
        single = eng.search(req).collect()
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single], qid
        np.testing.assert_allclose(
            [r["score"] for r in got], [r["score"] for r in single],
            rtol=1e-5, atol=1e-6,
        )
        # ranks are the global positions of the slice
        assert [r["rank"] for r in got] == list(
            range(req.offset + 1, req.offset + 1 + len(got))
        ), qid


def test_batch_partial_topk_in_plan(spark):
    """The batched ranker must pre-reduce candidates BEFORE the global
    per-query window (riot slices [0, offset+max) per shard before the
    merge, ranker_worker.go:60-73): the plan must contain the partial
    top-k cap between the aggregate and the window — MapPartitions
    (the JVM heap cap) when riotspark.jar is present, MapInPandas
    otherwise — and NO exchange between them (the cap filters rows
    where they already are), so no single task ever ranks a hot
    query's full candidate set."""
    import io
    import contextlib
    from riot_spark.query import _flat_jvm_available
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    # match the node header "MapPartitions (NN)" — a bare substring
    # would also hit "MapPartitionsRDD[...]" in ExistingRDD arguments
    cap_node = (
        "MapPartitions (" if _flat_jvm_available(spark) else "MapInPandas ("
    )

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    reqs = {
        "q1": SearchRequest(text="data query", max_outputs=10),
        "q2": SearchRequest(text="batch", max_outputs=5, offset=3),
    }

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def _by_qid(rows):
        out: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            out.setdefault(r["query_id"], []).append(r)
        return out

    # hotness is judged driver-side from term dfs; force 'hot' to
    # assert the capped plan shape
    saved = SearchEngine.PARTIAL_TOPK_MIN_DF
    try:
        SearchEngine.PARTIAL_TOPK_MIN_DF = 0
        plan = plan_of(eng.search_batch(reqs))
        assert cap_node in plan, plan
        assert "Window" in plan, plan
        cap_pos = plan.index(cap_node)
        win_pos = plan.index("Window")
        assert win_pos < cap_pos  # formatted plan prints top-down:
        # the cap sits below (before) the final per-query window

        # logic batch gets the same treatment
        plan2 = plan_of(eng.search_batch(
            {"l1": SearchRequest(must=["data"], not_in=["dup"], max_outputs=8)}
        ))
        assert cap_node in plan2

        # k == 0 everywhere -> no cap possible, partial phase skipped
        plan3 = plan_of(eng.search_batch(
            {"u1": SearchRequest(text="data query")}
        ))
        assert cap_node not in plan3
        # the capped path must be value-identical to the uncapped one
        hot = {
            qid: [(r["doc_id"], r["rank"]) for r in rows]
            for qid, rows in _by_qid(eng.search_batch(reqs).collect()).items()
        }
    finally:
        SearchEngine.PARTIAL_TOPK_MIN_DF = saved
    cold = {
        qid: [(r["doc_id"], r["rank"]) for r in rows]
        for qid, rows in _by_qid(eng.search_batch(reqs).collect()).items()
    }
    assert hot == cold

    # cold terms (df far below the threshold) skip the pass — the
    # cap pass is only paid when a reducer could flood
    assert cap_node not in plan_of(eng.search_batch(reqs))


def test_hot_term_salting_spreads_partitions(spark):
    """A df=N stopword-like term must land in ~build_salts partitions
    (skew defense), and search results must be unaffected."""
    from pyspark.sql import functions as F
    from riot_spark.build import build_index

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hot filler"), F.col("id").cast("string")).alias("text"),
    )
    cfg = EngineConfig(
        index_type=FREQUENCIES_INDEX, num_index_partitions=16,
        build_salts=4, salt_block_bits=10,  # 4000 docs / 1024 ≈ 4 ranges
    )
    idx = build_index(docs, cfg)
    parts = (
        idx.postings.where(F.col("term") == "hot")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert len(parts) >= 3, f"hot term stuck in {len(parts)} partition(s)"
    assert sum(r["count"] for r in parts) == 4000
    # unsalted layout: exactly one partition
    cfg1 = EngineConfig(
        index_type=FREQUENCIES_INDEX, num_index_partitions=16, build_salts=1
    )
    idx1 = build_index(docs, cfg1)
    parts1 = (
        idx1.postings.where(F.col("term") == "hot")
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    assert len(parts1) == 1
    # results identical across layouts
    r_salted = SearchEngine(idx).search(
        SearchRequest(text="hot", max_outputs=7)
    ).collect()
    r_plain = SearchEngine(idx1).search(
        SearchRequest(text="hot", max_outputs=7)
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in r_salted] == [
        (r["doc_id"], r["score"]) for r in r_plain
    ]


def test_stopword_filter(spark):
    """T7: configured stopwords are dropped from postings, doc lengths,
    and query matching (stop_tokens.go:31-57 semantics)."""
    from riot_spark.build import build_index

    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "the slow the turtle")],
        "doc_id LONG, text STRING",
    )
    cfg = EngineConfig(
        index_type=FREQUENCIES_INDEX, num_index_partitions=4,
        stopwords=frozenset({"the"}),
    )
    idx = build_index(docs, cfg)
    terms = {r["term"] for r in idx.postings.collect()}
    assert "the" not in terms
    assert terms == {"quick", "fox", "slow", "turtle"}
    lens = {r["doc_id"]: r["token_len"] for r in idx.doc_stats.collect()}
    assert lens == {1: 2.0, 2: 2.0}
    eng = SearchEngine(idx)
    assert eng.search(SearchRequest(tokens=["the"])).count() == 0


def test_search_batch_logic_matches_per_query(spark):
    """Batched must/should/notIn execution must agree with the
    per-query LogicLookup path, including the notIn-only quirk."""
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    reqs = {
        "l1": SearchRequest(must=["data"], should=["query", "spark"]),
        "l2": SearchRequest(should=["query", "spark"], not_in=["dup"]),
        "l3": SearchRequest(not_in=["dup"]),  # notIn-only quirk
        "l4": SearchRequest(must=["data", "zzzmissing"]),  # empty
        "l5": SearchRequest(must=["data"], not_in=["query"], max_outputs=5),
        "mix": SearchRequest(text="data query", max_outputs=5),  # AND path
    }
    batch = eng.search_batch(reqs).collect()
    by_qid: dict[str, list] = {}
    for r in batch:
        by_qid.setdefault(r["query_id"], []).append(r)
    assert "l4" not in by_qid
    for qid, req in reqs.items():
        if qid == "l4":
            continue
        single = sorted(
            r["doc_id"] for r in eng.search(req).collect()
        )
        got = sorted(r["doc_id"] for r in by_qid.get(qid, []))
        if qid == "mix":
            single = [r["doc_id"] for r in eng.search(req).collect()]
            got = [r["doc_id"] for r in sorted(by_qid[qid], key=lambda r: r["rank"])]
        assert got == sorted(single) if qid != "mix" else got == single, qid


def test_search_batch_dedups_identical_requests(spark):
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    reqs = {
        "a": SearchRequest(text="data query", max_outputs=5),
        "b": SearchRequest(tokens=["query", "data"], max_outputs=5),  # same set
        "c": SearchRequest(text="batch", max_outputs=3),
    }
    rows = eng.search_batch(reqs).collect()
    by = {}
    for r in rows:
        by.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    assert sorted(by["a"]) == sorted(by["b"])
    assert len(by["c"]) == 3


def test_hydrate_joins_documents(spark):
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    res = eng.search(SearchRequest(text="data query", max_outputs=5))
    hyd = SearchEngine.hydrate(res, docs, "text", "source")
    plan = hyd._jdf.queryExecution().executedPlan().toString()
    # scan-pruned hydrate: the documents parquet scan must carry the
    # collected doc_id filter (PushedFilters: [In(doc_id, ...)]) and
    # the join must be a broadcast hash join — a SortMergeJoin here
    # would shuffle the whole documents table to hydrate 5 rows.
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    pushed = [ln for ln in plan.splitlines()
              if "PushedFilters" in ln and "doc_id" in ln]
    assert pushed, f"documents scan lost the doc_id pushdown:\n{plan}"
    rows = hyd.collect()
    assert len(rows) == 5
    assert all(r["text"] and "data" in r["text"].lower() for r in rows)


def test_hydrate_unbounded_falls_back(spark):
    """An unbounded ranked side (> collect_cap) must not be collected;
    the fallback is a plain inner join."""
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    res = eng.search(SearchRequest(text="data"))  # no max_outputs
    n = res.count()
    hyd = SearchEngine.hydrate(res, docs, "source", collect_cap=1)
    assert hyd.count() == n


def test_doc_ids_index_mode(spark):
    """DocIdsIndex (mode 0, types/indexer_init_options.go:19-22):
    intersection works, every score is 0, order degenerates to the
    deterministic doc_id tiebreak."""
    from riot_spark.build import build_index
    from riot_spark.config import DOC_IDS_INDEX
    from riot_spark.sources.corpus import load_documents
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx0 = build_index(docs, EngineConfig(index_type=DOC_IDS_INDEX,
                                          num_index_partitions=8))
    idxf = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                          num_index_partitions=8))
    req = SearchRequest(tokens=["data", "query"])
    r0 = SearchEngine(idx0).search(req).collect()
    rf = SearchEngine(idxf).search(req).collect()
    assert sorted(r["doc_id"] for r in r0) == sorted(r["doc_id"] for r in rf)
    assert all(r["score"] == 0.0 for r in r0)
    assert [r["doc_id"] for r in r0] == sorted(r["doc_id"] for r in r0)


def test_batch_rare_combos_emit_rows(spark):
    """count+whitelist and orderless+whitelist must NOT be silently
    dropped from search_batch — they route through per-query search()
    and emit count/candidate rows (ADVICE r2)."""
    from riot_spark.sources.corpus import load_documents
    from riot_spark.build import build_index
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(docs, EngineConfig(index_type=FREQUENCIES_INDEX,
                                         num_index_partitions=8))
    eng = SearchEngine(idx)
    wl = list(range(0, 100, 2))
    reqs = {
        "cwl": SearchRequest(text="data", doc_ids=wl, count_docs_only=True),
        "owl": SearchRequest(text="data", doc_ids=wl, orderless=True),
    }
    rows = eng.search_batch(reqs).collect()
    by_qid: dict[str, list] = {}
    for r in rows:
        by_qid.setdefault(r["query_id"], []).append(r)
    n = eng.search(reqs["cwl"]).collect()[0]["num_docs"]
    assert len(by_qid["cwl"]) == 1
    assert by_qid["cwl"][0]["doc_id"] is None
    assert int(by_qid["cwl"][0]["score"]) == n and n > 0
    cand = sorted(r["doc_id"] for r in eng.search(reqs["owl"]).collect())
    assert sorted(r["doc_id"] for r in by_qid["owl"]) == cand
