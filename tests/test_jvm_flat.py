"""JVM flat-path f32 kernel: bit-identity with the pandas kernel.

FlatQuery.scala::searchF32Batch walks the (query_id, doc_id)-sorted
matched postings inside the executor, scoring float32 BM25 plus the
proximity DP with snippet-path reconstruction.  These tests pin it to
the pandas kernel (`_f32_score_pdf` under `_score_float32` /
`_f32_batch_exec`) bit for bit — scores as float32, proximity as exact
ints, snippet locations element for element — across locs/freq modes,
labels, unscorable docs, reverse/offset and proximity criteria.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from riot_spark.blocks import jvm_pack_available
from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.query import SearchEngine, SearchRequest, _flat_jvm_available
from riot_spark.sources.corpus import load_documents

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _needs_jar(spark):
    if not (_flat_jvm_available(spark) and jvm_pack_available(spark)):
        pytest.skip("riotspark.jar not on the session classpath")


@pytest.fixture(scope="module")
def locs_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


@pytest.fixture(scope="module")
def freq_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


@pytest.fixture(scope="module")
def labelled_locs_index(spark):
    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    return build_index(docs, cfg, labels_col="labels")


def _engines(index):
    jeng = SearchEngine(index)
    peng = SearchEngine(index)
    peng._jvm_f32_batch = lambda *a, **k: None  # force the pandas kernel
    return jeng, peng


def _skey(r):
    return (
        r["doc_id"],
        np.float32(r["score"]),
        r["proximity"],
        tuple(r["snippet_locs"] or ()),
    )


def _bkey(r):
    return (r["query_id"], r["rank"], r["doc_id"], np.float32(r["score"]))


def test_jvm_flat_single_bit_identical(locs_index):
    """Single-query float32 search: score, proximity AND snippet path
    must match the pandas kernel exactly, including the 1-token case
    (proximity 0, snippet = first position) and a 3-token DP."""
    jeng, peng = _engines(locs_index)
    for toks in (["data", "query"], ["data"], ["join", "filter", "sort"]):
        req = SearchRequest(tokens=toks, scorer="float32")
        got = sorted(_skey(r) for r in jeng.search(req).collect())
        want = sorted(_skey(r) for r in peng.search(req).collect())
        assert got == want, toks
        assert got, toks


def test_jvm_flat_single_freq_mode(freq_index):
    """FrequenciesIndex: tf comes from the stored column, no
    positions/proximity — parity including null snippet handling."""
    jeng, peng = _engines(freq_index)
    req = SearchRequest(tokens=["data", "query"], scorer="float32")
    got = sorted(_skey(r) for r in jeng.search(req).collect())
    want = sorted(_skey(r) for r in peng.search(req).collect())
    assert got == want
    assert got


def test_jvm_flat_labels_unscorable(labelled_locs_index):
    """Label keywords join the AND (n_kw) without scoring; a query
    token matched only via a label posting marks the doc unscorable
    (score 0) — both paths must agree, and the unscorable branch must
    actually fire."""
    jeng, peng = _engines(labelled_locs_index)
    # src3 as a TOKEN: every match is label-origin => unscorable
    req = SearchRequest(tokens=["data", "src3"], scorer="float32")
    got = sorted(_skey(r) for r in jeng.search(req).collect())
    want = sorted(_skey(r) for r in peng.search(req).collect())
    assert got == want
    assert any(s == np.float32(0.0) for _d, s, _p, _l in got)
    # src1 as a LABEL: filters candidates, scores stay content-only
    req = SearchRequest(tokens=["data", "query"], labels=["src1"],
                        scorer="float32")
    got = sorted(_skey(r) for r in jeng.search(req).collect())
    want = sorted(_skey(r) for r in peng.search(req).collect())
    assert got == want
    assert got


def test_jvm_flat_batch_bit_identical(locs_index):
    """The batched executor (_f32_batch_exec) through the JVM kernel:
    mixed shapes — top-k, unlimited, reverse+offset, proximity
    criteria, missing term — one kernel pass, pandas-identical."""
    jeng, peng = _engines(locs_index)
    reqs = {
        "a": SearchRequest(tokens=["data", "query"], scorer="float32",
                           max_outputs=10),
        "all": SearchRequest(tokens=["group", "order"], scorer="float32"),
        "rev": SearchRequest(tokens=["data", "query"], scorer="float32",
                             max_outputs=10, reverse_order=True, offset=3),
        "prox": SearchRequest(tokens=["data", "query"], scorer="float32",
                              criteria="proximity", max_outputs=10),
        "p3": SearchRequest(tokens=["join", "filter", "sort"],
                            scorer="float32", criteria="proximity",
                            max_outputs=5),
        "miss": SearchRequest(tokens=["data", "zzzqx"], scorer="float32"),
    }
    got = sorted(_bkey(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_bkey(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"a", "all", "rev", "prox", "p3"}


def test_jvm_flat_batch_freq_mode(freq_index):
    """Batched f32 on a FrequenciesIndex (no positions column data)."""
    jeng, peng = _engines(freq_index)
    reqs = {
        "a": SearchRequest(tokens=["data", "query"], scorer="float32",
                           max_outputs=10),
        "b": SearchRequest(tokens=["data"], scorer="float32",
                           max_outputs=5, offset=1),
    }
    got = sorted(_bkey(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_bkey(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"a", "b"}


def test_jvm_flat_vs_block_engine(locs_index):
    """Triangle check: flat-JVM, flat-pandas and the block engine all
    produce the same float32 ranking for the same query."""
    from riot_spark.blocks import BlockSearchEngine, blocked_from_index

    jeng, peng = _engines(locs_index)
    req = SearchRequest(tokens=["data", "query"], scorer="float32",
                        max_outputs=20)
    flat_j = [
        (r["doc_id"], np.float32(r["score"]))
        for r in jeng.search(req).collect()
    ]
    flat_p = [
        (r["doc_id"], np.float32(r["score"]))
        for r in peng.search(req).collect()
    ]
    bi = blocked_from_index(locs_index, doc_block_bits=6)
    blk = [
        (r["doc_id"], np.float32(r["score"]))
        for r in BlockSearchEngine(bi).search_and(
            ["data", "query"], k=20
        ).collect()
    ]
    assert flat_j == flat_p == blk
