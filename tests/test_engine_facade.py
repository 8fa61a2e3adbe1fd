"""Engine facade (riot Init/Index/RemoveDoc/Flush/Search) + compat
tokenizer golden tests."""

from __future__ import annotations

from riot_spark.compat import for_split_data, split_chars, tokenize_compat
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX
from riot_spark.engine import Engine, remove_docs
from riot_spark.build import build_index
from riot_spark.query import SearchEngine, SearchRequest


def test_engine_lifecycle(spark):
    """Mirrors riot's add / search / upsert / remove lifecycle
    (engine_test.go, core/indexer_test.go:36-134 splice semantics)."""
    eng = Engine(spark, EngineConfig(index_type=FREQUENCIES_INDEX,
                                     num_index_partitions=2))
    eng.index_doc(1, "token2 token3")
    eng.index_doc(2, "token1 token2 token3")
    eng.index_doc(3, "token1 token2")
    eng.flush()
    res = eng.search(SearchRequest(tokens=["token1", "token2"], orderless=True))
    assert sorted(r["doc_id"] for r in res.collect()) == [2, 3]

    # upsert doc 1 (re-add replaces: core/indexer.go:190-199)
    eng.index_doc(1, "token1 token3")
    eng.flush()
    res = eng.search(SearchRequest(tokens=["token1"], orderless=True))
    assert sorted(r["doc_id"] for r in res.collect()) == [1, 2, 3]
    res = eng.search(SearchRequest(tokens=["token2"], orderless=True))
    assert sorted(r["doc_id"] for r in res.collect()) == [2, 3]

    # remove doc 2
    eng.remove_doc(2)
    eng.flush()
    assert eng.num_docs() == 2
    res = eng.search(SearchRequest(tokens=["token2"], orderless=True))
    assert sorted(r["doc_id"] for r in res.collect()) == [3]
    assert sorted(r["doc_id"] for r in eng.all_doc_ids().collect()) == [1, 3]
    assert eng.num_docs_indexed == 4 and eng.num_docs_removed == 1


def test_remove_docs_functional(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "c d e")], "doc_id LONG, text STRING"
    )
    idx = build_index(
        docs, EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=2)
    )
    idx2 = remove_docs(idx, [2])
    assert idx2.n_docs == 2
    assert idx2.lookup_terms(["d"]) == {"d": 1}  # df decremented
    res = SearchEngine(idx2).search(SearchRequest(tokens=["c"], orderless=True))
    assert sorted(r["doc_id"] for r in res.collect()) == [1, 3]


def test_for_split_data_semantics():
    """segment.go:40-77: word + cumulative prefix concat, running
    token-counter positions; Using=6 adds forward combinations."""
    tmap, num = for_split_data(["a", "b", "c"], using=4)
    assert tmap == {
        "a": [1, 2], "b": [3], "ab": [4], "c": [5], "abc": [6],
    }
    assert num == 6
    tmap6, num6 = for_split_data(["a", "b"], using=6)
    # i=0: a(1), a(2 cum), b(3 fwd); i=1: b(4), ab(5 cum)
    assert tmap6 == {"a": [1, 2], "b": [3, 4], "ab": [5]}
    assert num6 == 5
    # stop tokens skipped without consuming counters
    tmap_s, num_s = for_split_data(["a", "b"], using=4, stop_tokens=frozenset(["b"]))
    assert tmap_s == {"a": [1, 2], "ab": [3]}
    assert num_s == 3


def test_split_chars():
    assert split_chars("ab 人口") == ["a", "b", "人", "口"]


def test_tokenize_compat_spark(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    rows = {r["term"]: r for r in tokenize_compat(docs, using=4).collect()}
    assert set(rows) == {"a", "b", "ab", "c", "abc"}
    assert list(rows["a"]["positions"]) == [1, 2]
    assert rows["a"]["token_len"] == 6.0


def test_http_endpoint_search_index_delete(spark):
    """S7 smoke surface (net/http/http.go form params): search via GET,
    add/delete/flush via POST through the Engine facade."""
    import json
    import urllib.request

    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX
    from riot_spark.engine import Engine
    from riot_spark.net import serve

    eng = Engine(spark, EngineConfig(index_type=FREQUENCIES_INDEX,
                                     num_index_partitions=2))
    eng.index_doc(1, "hello world data")
    eng.index_doc(2, "data query engine")
    eng.flush()
    srv = serve(facade=eng)
    try:
        port = srv.server_address[1]

        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return json.loads(r.read())

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        assert get("/health") == {"status": "ok"}
        docs = get("/search?query=data&maxOutputs=5")["docs"]
        assert sorted(d["doc_id"] for d in docs) == [1, 2]
        post("/index", {"doc_id": 3, "content": "more data here"})
        post("/delete", {"doc_id": 1})
        post("/flush", {})
        docs = get("/search?query=data&maxOutputs=5")["docs"]
        assert sorted(d["doc_id"] for d in docs) == [2, 3]
    finally:
        srv.shutdown()


def test_http_endpoint_read_only(spark):
    """serve(engine=...) without a facade: search works, mutations 501."""
    import json
    import urllib.error
    import urllib.request

    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX
    from riot_spark.net import serve
    from riot_spark.query import SearchEngine

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id LONG, text STRING"
    )
    eng = SearchEngine(build_index(
        docs, EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=2)
    ))
    srv = serve(engine=eng)
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/search?query=beta"
        ) as r:
            docs_out = json.loads(r.read())["docs"]
        assert sorted(d["doc_id"] for d in docs_out) == [1, 2]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/index", data=b"{}"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 501")
        except urllib.error.HTTPError as e:
            assert e.code == 501
    finally:
        srv.shutdown()
