"""JVM block packer: byte-identity with the Python codec/packers.

The Scala packer (riot_spark/jvm/BlockPack.scala) re-implements the
delta+varint/PFOR codec and the (term, doc-range, is_label) grouping
inside the executor JVM.  These tests pin it to the Arrow packer's
output byte for byte — any codec drift (quantile width choice, tag
policy, positions layout) fails here before it can corrupt a store.
"""

from __future__ import annotations

import numpy as np
import pytest

from riot_spark.blocks import (
    BlockSearchEngine,
    blocked_from_index,
    build_blocks_arrow,
    build_blocks_jvm,
    jvm_pack_available,
)
from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.sources.corpus import load_documents

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _needs_jar(spark):
    if not jvm_pack_available(spark):
        pytest.skip("riotspark.jar not on the session classpath")


@pytest.fixture(scope="module")
def freq_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


@pytest.fixture(scope="module")
def locs_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


def _rows(df):
    return sorted(
        (
            r["term"], r["block_id"], r["is_label"], r["n"],
            r["first_doc_id"], r["last_doc_id"],
            bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["token_lens"]),
            bytes(r["positions"]) if r["positions"] is not None else None,
            np.float32(r["norm_max"]),
        )
        for r in df.collect()
    )


def test_jvm_packer_byte_identical(freq_index, locs_index):
    """Both index modes, small blocks (multiple per term), labels and
    packed positions included: the JVM packer's bytes must equal the
    Arrow packer's exactly."""
    for idx in (freq_index, locs_index):
        want = _rows(build_blocks_arrow(idx, doc_block_bits=6))
        got = _rows(build_blocks_jvm(idx, doc_block_bits=6))
        assert got == want


def test_jvm_packer_codec_edges(spark, locs_index):
    """Coarse blocks force long per-block arrays (> 64 values), which
    exercises the PFOR-vs-varint choice, the 95th-quantile width, and
    the exception patch list; bits=13 (= salt_block_bits, the coarsest
    legal granularity) puts all 500 smoke docs in one block."""
    want = _rows(build_blocks_arrow(locs_index, doc_block_bits=13))
    got = _rows(build_blocks_jvm(locs_index, doc_block_bits=13))
    assert got == want
    # hot terms must have chosen PFOR somewhere, or this test is not
    # exercising the patched-FOR encoder at all
    tags = {row[6][0] for row in got if row[3] > 64}
    assert 1 in tags, "no PFOR-coded block in the long-array regime"


def test_jvm_packed_index_serves_queries(locs_index):
    """End-to-end: a jvm-packed store is rank-identical to the flat
    engine across the shape families (AND/BM25, proximity, logic)."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    beng = BlockSearchEngine(bi)
    feng = SearchEngine(locs_index)
    for req in (
        SearchRequest(tokens=["data", "query"], scorer="float32",
                      max_outputs=20),
        SearchRequest(tokens=["data", "query"], scorer="float32",
                      criteria="proximity", max_outputs=10),
        SearchRequest(must=["data"], not_in=["dup"], max_outputs=15,
                      scorer="float32"),
    ):
        got_df, want_df = beng.search(req), feng.search(req)
        shared = [c for c in ("doc_id", "score") if c in got_df.columns]
        key = lambda r: tuple(
            np.float32(r[c]) if c == "score" else r[c] for c in shared
        )  # noqa: E731
        got = [key(r) for r in got_df.collect()]
        want = [key(r) for r in want_df.select(shared).collect()]
        if "score" not in shared:
            got, want = sorted(got), sorted(want)
        assert got == want


# ---------------------------------------------------------------------------
# JVM AND/BM25 query kernel (riot_spark/jvm/BlockQuery.scala)
# ---------------------------------------------------------------------------


def _pairs(df):
    return [(r["doc_id"], np.float32(r["score"])) for r in df.collect()]


def _pandas_only(eng: BlockSearchEngine) -> BlockSearchEngine:
    """Twin engine with the JVM kernel disabled — forces the pandas
    applyInPandas path so the two kernels can be compared directly."""
    twin = BlockSearchEngine(eng.bi)
    twin._make_jvm_and_apply = lambda *a, **k: None
    return twin


def test_jvm_and_kernel_bit_identical(freq_index, locs_index):
    """search_and through the JVM kernel must be bit-identical (doc
    ids AND float32 scores, in order) to the pandas kernel, across
    index modes, term counts, and full-scan vs top-k."""
    for idx in (freq_index, locs_index):
        bi = blocked_from_index(idx, doc_block_bits=6, packer="jvm")
        jeng = BlockSearchEngine(bi)
        peng = _pandas_only(jeng)
        for toks in (["data"], ["data", "query"], ["data", "query", "the"]):
            for k in (0, 10):
                got = _pairs(jeng.search_and(toks, k=k))
                want = _pairs(peng.search_and(toks, k=k))
                assert got == want, (toks, k)
                assert got, (toks, k)  # non-vacuous


def test_jvm_and_kernel_wand_paths(locs_index):
    """Forced WAND (both modes) and the budgeted walk run their
    scoring passes through the JVM kernel; results stay bit-identical
    to the pandas engine on the same walk."""
    bi = blocked_from_index(locs_index, doc_block_bits=2, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = _pandas_only(jeng)
    jeng.WAND_MIN_POSTINGS = 0
    peng.WAND_MIN_POSTINGS = 0
    for mode in ("threshold", "walk"):
        got = _pairs(jeng.search_and(["data"], k=10, wand_mode=mode))
        want = _pairs(peng.search_and(["data"], k=10, wand_mode=mode))
        assert got == want, mode
        assert len(got) == 10
    gb, gt = jeng.search_and_budgeted(["data"], k=10, budget_s=300.0)
    pb, pt = peng.search_and_budgeted(["data"], k=10, budget_s=300.0)
    assert not gt and not pt
    assert _pairs(gb) == _pairs(pb)


def test_jvm_and_kernel_labels_unscorable(spark):
    """Label postings exercise the union / doc-length-backfill /
    unscorable-guard branches of the Scala kernel; pin them to the
    pandas kernel and the flat engine."""
    from pyspark.sql import functions as F

    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi = blocked_from_index(idx, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = _pandas_only(jeng)
    for k in (0, 10):
        got = _pairs(jeng.search_and(["data"], labels=["src3"], k=k))
        want = _pairs(peng.search_and(["data"], labels=["src3"], k=k))
        assert got == want, k
        assert got, k


def test_jvm_batch_bit_identical(locs_index):
    """search_batch through the JVM batch kernel (searchAndBatch) must
    be bit-identical (query_id, rank, doc_id, float32 score) to the
    pandas batch dispatcher across the AND-family shapes: plain top-k,
    offset, ReverseOrder, DocIds whitelist, unlimited, missing term."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_and_batch = lambda *a, **k: None  # force pandas dispatch
    reqs = {
        "and1": SearchRequest(text="data query", max_outputs=10),
        "and2": SearchRequest(text="batch", max_outputs=5, offset=3),
        "rev": SearchRequest(text="data query", max_outputs=10,
                             reverse_order=True),
        "wl": SearchRequest(text="data", doc_ids=list(range(0, 200, 3)),
                            max_outputs=10),
        "all": SearchRequest(text="group order"),
        "missing": SearchRequest(text="data zzzqx", max_outputs=10),
    }
    key = lambda r: (  # noqa: E731
        r["query_id"], r["rank"], r["doc_id"], np.float32(r["score"])
    )
    got = sorted(key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"and1", "and2", "rev", "wl", "all"}


def test_jvm_batch_double_bit_identical(locs_index):
    """double_scores mode through the JVM float64 tail (andScoreD)
    must be bit-identical — exact float64, before AND after the
    caller's round(4) — to the pandas f64 dispatcher it replaces."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_and_batch = lambda *a, **k: None  # force pandas dispatch
    reqs = {
        "and1": SearchRequest(text="data query", max_outputs=10),
        "and2": SearchRequest(text="batch", max_outputs=5, offset=3),
        "rev": SearchRequest(text="data query", max_outputs=10,
                             reverse_order=True),
        "wl": SearchRequest(text="data", doc_ids=list(range(0, 200, 3)),
                            max_outputs=10),
        "all": SearchRequest(text="group order"),
        "missing": SearchRequest(text="data zzzqx", max_outputs=10),
    }
    key = lambda r: (  # noqa: E731
        r["query_id"], r["rank"], r["doc_id"], float(r["score"])
    )
    got = sorted(
        key(r) for r in jeng.search_batch(reqs, double_scores=True).collect()
    )
    want = sorted(
        key(r) for r in peng.search_batch(reqs, double_scores=True).collect()
    )
    assert got == want
    assert {q for q, *_ in got} == {"and1", "and2", "rev", "wl", "all"}
    # the raw (pre-round) kernel outputs match exactly too
    qmeta = [("q", ["data", "query"], ["data", "query"], None)]
    dfs = bi.lookup_terms(["data", "query"])
    from pyspark.sql import functions as F

    matched = bi.blocks.where(F.col("term").isin(["data", "query"]))
    raw_j = jeng._jvm_and_batch(matched, qmeta, dfs, True)
    raw_p = peng._pandas_and_batch(matched, qmeta, {"q": {"data", "query"}},
                                   dfs, True)
    rk = lambda r: (r["doc_id"], float(r["score"]))  # noqa: E731
    assert sorted(rk(r) for r in raw_j.collect()) == sorted(
        rk(r) for r in raw_p.collect()
    )


def test_jvm_batch_labels(spark):
    """Label keywords in a batch exercise the union / doc-length
    backfill / unscorable branches of searchAndBatch; pin to the
    pandas dispatcher on a labelled LocsIndex store."""
    from pyspark.sql import functions as F

    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi = blocked_from_index(idx, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_and_batch = lambda *a, **k: None
    reqs = {
        "lab": SearchRequest(tokens=["data"], labels=["src3"],
                             scorer="float32", max_outputs=10),
        "lab_all": SearchRequest(tokens=["data"], labels=["src1"],
                                 scorer="float32"),
    }
    key = lambda r: (  # noqa: E731
        r["query_id"], r["rank"], r["doc_id"], np.float32(r["score"])
    )
    got = sorted(key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"lab", "lab_all"}


def _batch_key(r):
    return (r["query_id"], r["rank"], r["doc_id"], np.float32(r["score"]))


def test_jvm_prox_batch_bit_identical(locs_index):
    """search_batch's proximity-criteria family through the JVM kernel
    (searchProxBatch: executor-side positions decode + proximity DP)
    must be bit-identical to the pandas dispatcher across whitelist,
    reverse, offset, 3-token and missing-term shapes."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_prox_batch = lambda *a, **k: None  # force pandas dispatch
    reqs = {
        "p1": SearchRequest(tokens=["data", "query"], scorer="float32",
                            criteria="proximity", max_outputs=10),
        "p2": SearchRequest(tokens=["join", "filter", "sort"],
                            scorer="float32", criteria="proximity",
                            max_outputs=5, offset=2),
        "prev": SearchRequest(tokens=["data", "query"], scorer="float32",
                              criteria="proximity", max_outputs=10,
                              reverse_order=True),
        "pwl": SearchRequest(tokens=["data", "query"], scorer="float32",
                             criteria="proximity", max_outputs=10,
                             doc_ids=list(range(0, 300, 2))),
        "pall": SearchRequest(tokens=["group", "order"], scorer="float32",
                              criteria="proximity"),
        "pmiss": SearchRequest(tokens=["data", "zzzqx"], scorer="float32",
                               criteria="proximity", max_outputs=10),
    }
    got = sorted(_batch_key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_batch_key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"p1", "p2", "prev", "pwl", "pall"}


def test_jvm_prox_batch_labels_unscorable(spark):
    """A query token matched only via a label posting is unscorable
    (proximity -1 -> score 0) — pin the JVM DP's unscorable guard and
    the label/content union to the pandas kernel on a labelled
    store."""
    from pyspark.sql import functions as F

    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi = blocked_from_index(idx, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_prox_batch = lambda *a, **k: None
    reqs = {
        # src3 is label-only: every match is unscorable (score 0)
        "plab": SearchRequest(tokens=["data", "src3"], scorer="float32",
                              criteria="proximity", max_outputs=10),
        # label as a label (not a token): intersects but no DP token
        "plab2": SearchRequest(tokens=["data", "query"], labels=["src1"],
                               scorer="float32", criteria="proximity",
                               max_outputs=10),
    }
    got = sorted(_batch_key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_batch_key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {"plab", "plab2"}
    # the unscorable branch must actually fire somewhere
    assert any(s == np.float32(0.0) for _q, _r, _d, s in got)


def test_jvm_logic_batch_bit_identical(locs_index):
    """search_batch's logic family through the JVM kernel
    (searchLogicBatch) must match the pandas dispatcher across
    must/should/notIn, the notIn-only quirk, whitelisted logic, and
    orderless(+whitelist) which rides the logic path."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_logic_batch = lambda *a, **k: None  # force pandas dispatch
    reqs = {
        "l1": SearchRequest(must=["data"], should=["query", "spark"],
                            not_in=["dup"]),
        "l2": SearchRequest(must=["data", "query"]),
        "lni": SearchRequest(not_in=["data", "batch"]),
        "lwl": SearchRequest(must=["data"], not_in=["dup"],
                             doc_ids=list(range(0, 300, 3))),
        "lsh": SearchRequest(should=["join", "filter"]),
        "o1": SearchRequest(tokens=["group", "order"], orderless=True),
        "owl": SearchRequest(tokens=["data"], orderless=True,
                             doc_ids=list(range(0, 200, 2))),
        "lmiss": SearchRequest(must=["data", "zzzqx"]),
    }
    got = sorted(_batch_key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_batch_key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert {q for q, *_ in got} == {
        "l1", "l2", "lni", "lwl", "lsh", "o1", "owl"
    }


def test_jvm_count_batch_bit_identical(locs_index):
    """CountDocsOnly batches route their candidate pass through the
    JVM logic kernel (count = must-only); counts must match the pandas
    dispatcher, including whitelisted counts and the count-0 row for a
    missing keyword."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_logic_batch = lambda *a, **k: None
    reqs = {
        "c1": SearchRequest(tokens=["data", "query"], count_docs_only=True),
        "cwl": SearchRequest(tokens=["data"], count_docs_only=True,
                             doc_ids=list(range(0, 300, 2))),
        "cmiss": SearchRequest(tokens=["zzzqx"], count_docs_only=True),
    }
    got = sorted(_batch_key(r) for r in jeng.search_batch(reqs).collect())
    want = sorted(_batch_key(r) for r in peng.search_batch(reqs).collect())
    assert got == want
    assert len(got) == 3  # one count row per query, incl. the 0 count
    counts = {q: s for q, _r, _d, s in got}
    assert counts["cmiss"] == np.float32(0.0)
    assert counts["c1"] > 0 and counts["cwl"] > 0


def test_jvm_search_logic_single(locs_index):
    """Single-request search_logic routes through the JVM kernel when
    the jar is present; doc ids must equal the pandas kernel's."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._jvm_logic_batch = lambda *a, **k: None
    for args in (
        dict(must=["data"], should=["query", "spark"], not_in=["dup"]),
        dict(not_in=["data"]),
        dict(must=["data", "query"]),
    ):
        got = sorted(r["doc_id"] for r in jeng.search_logic(**args).collect())
        want = sorted(r["doc_id"] for r in peng.search_logic(**args).collect())
        assert got == want, args
        assert got, args


def test_jvm_and_apply_whitelist(locs_index):
    """The JVM apply's whitelist argument (post-intersection doc-id
    filter, Q3) matches the pandas kernel built with the same
    whitelist."""
    import pyspark.sql.functions as F

    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    eng = BlockSearchEngine(bi)
    toks = ["data", "query"]
    dfs = bi.lookup_terms(toks)
    base = eng.search_and(toks).collect()
    wl = np.sort(np.array([r["doc_id"] for r in base[::3]], dtype=np.int64))
    matched = bi.blocks.where(F.col("term").isin(toks))
    apply_jvm = eng._make_jvm_and_apply(toks, toks, dfs, whitelist=wl)
    kernel = eng._make_and_kernel(toks, toks, dfs, False, whitelist=wl)
    got = sorted(
        (r["doc_id"], np.float32(r["score"]))
        for r in apply_jvm(matched).collect()
    )
    want = sorted(
        (r["doc_id"], np.float32(r["score"]))
        for r in matched.groupBy("block_id")
        .applyInPandas(kernel, "doc_id LONG, score FLOAT")
        .collect()
    )
    assert got == want
    assert len(got) == len(wl)


def test_jvm_prox_single(locs_index):
    """Single-query search_and(proximity=True) through the JVM kernel
    (searchProx: andScore + proximity DP + snippet path) must be
    bit-identical to the pandas kernel — scores as float32, proximity
    ints, snippet locations element for element — incl. 1-token and
    3-token DP shapes."""
    bi = blocked_from_index(locs_index, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._make_jvm_prox_apply = lambda *a, **k: None  # force pandas

    def rows(e, toks):
        return sorted(
            (
                r["doc_id"], np.float32(r["score"]), r["proximity"],
                tuple(r["snippet_locs"] or ()),
            )
            for r in e.search_and(toks, proximity=True).collect()
        )

    for toks in (["data", "query"], ["data"], ["join", "filter", "sort"]):
        got = rows(jeng, toks)
        want = rows(peng, toks)
        assert got == want, toks
        assert got, toks


def test_jvm_prox_single_labels(spark):
    """Labelled store through searchProx: label keywords intersect
    without scoring, label-only token matches are unscorable (score 0,
    prox -1, empty snippet) — pandas-identical."""
    from pyspark.sql import functions as F

    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi = blocked_from_index(idx, doc_block_bits=6, packer="jvm")
    jeng = BlockSearchEngine(bi)
    peng = BlockSearchEngine(bi)
    peng._make_jvm_prox_apply = lambda *a, **k: None

    def rows(e, toks, labels=()):
        return sorted(
            (
                r["doc_id"], np.float32(r["score"]), r["proximity"],
                tuple(r["snippet_locs"] or ()),
            )
            for r in e.search_and(toks, labels=labels,
                                  proximity=True).collect()
        )

    # src3 as a TOKEN: label-origin matches must be unscorable
    got = rows(jeng, ["data", "src3"])
    want = rows(peng, ["data", "src3"])
    assert got == want
    assert any(s == np.float32(0.0) for _d, s, _p, _l in got)
    # src1 as a LABEL: candidates filter, content tokens still score+DP
    got = rows(jeng, ["data", "query"], labels=["src1"])
    want = rows(peng, ["data", "query"], labels=["src1"])
    assert got == want
    assert got


def test_jvm_tokenize_locs_identical(spark):
    """The JVM LocsIndex tokenizer (Tokenize.scala) must produce the
    exact posting set of the pandas kernel — distinct terms, byte
    positions of every occurrence, tf, token_len — across multi-space
    runs, leading/trailing spaces, UTF-8 multibyte words, stopwords
    and both doc-length modes."""
    from riot_spark.tokenizer import _tokenize_locs_pandas, tokenize_locs
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "data query data  gap"),
            (1, " leading and trailing "),
            (2, "naïve café 文字 文字 mix"),
            (3, ""),
            (4, "   "),
            (5, "the of data the"),
        ],
        "doc_id LONG, text STRING",
    )

    def rows(df):
        return sorted(
            (
                r["doc_id"], r["term"], float(r["tf"]),
                tuple(r["positions"]), float(r["token_len"]),
            )
            for r in df.collect()
        )

    for stops in (frozenset(), frozenset({"the", "of"})):
        for mode in ("distinct", "occurrences"):
            got = rows(tokenize_locs(docs, stopwords=stops,
                                     doc_len_mode=mode))
            cols = docs.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("text").cast("string").alias("text"),
            )
            want = rows(_tokenize_locs_pandas(
                cols, stops, mode == "distinct"
            ))
            assert got == want, (stops, mode)
            assert got, (stops, mode)
    # real corpus: the full locs build must be posting-identical
    docs = load_documents(spark, SF_SMOKE)
    got = rows(tokenize_locs(docs))
    cols = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").cast("string").alias("text"),
    )
    want = rows(_tokenize_locs_pandas(cols, frozenset(), True))
    assert got == want
