"""Blocked index: round-trip, differential vs flat engine, resume."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from riot_spark.blocks import (
    BlockSearchEngine,
    blocked_from_index,
    read_blocked_index,
    write_blocked_index,
)
from riot_spark.build import build_index
from riot_spark.codec import delta_decode, unpack_ints_as_floats
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.oracle import BM25Params, bm25_score_f32, bm25_score_f32_vec
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.sources.corpus import load_documents

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sf_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


@pytest.fixture(scope="module")
def bindex(sf_index):
    # small doc_block_bits so multiple blocks per term exist (500 docs)
    return blocked_from_index(sf_index, doc_block_bits=6)


def test_blocks_roundtrip_to_flat(sf_index, bindex):
    """decode(blocks) == the flat (term, doc_id, tf) relation."""
    flat = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in sf_index.postings.collect()
    }
    unpacked = {}
    for r in bindex.blocks.collect():
        ids = delta_decode(bytes(r["doc_ids"]))
        tfs = unpack_ints_as_floats(bytes(r["tfs"]))
        assert r["n"] == len(ids)
        assert r["first_doc_id"] == ids[0] and r["last_doc_id"] == ids[-1]
        assert np.all(np.diff(ids) > 0), "doc_ids strictly ascending"
        for i, d in enumerate(ids):
            unpacked[(r["term"], int(d))] = float(tfs[i])
    assert unpacked == {k: float(v) for k, v in flat.items()}


@pytest.mark.parametrize(
    "toks", [["data", "query"], ["join", "filter", "sort"], ["batch"],
             ["data", "zzznope"]]
)
def test_block_engine_rank_identical(sf_index, bindex, toks):
    flat_eng = SearchEngine(sf_index)
    block_eng = BlockSearchEngine(bindex)
    expect = flat_eng.search(
        SearchRequest(tokens=toks, scorer="float32", max_outputs=50)
    ).select("doc_id", "score").collect()
    got = block_eng.search_and(toks, k=50).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in expect
    ]


def test_vec_scorer_bit_exact():
    params = BM25Params()
    tfs = [np.array([1, 3, 7], dtype=np.float32), np.array([2, 0, 5], dtype=np.float32)]
    dls = np.array([10, 25, 40], dtype=np.float32)
    vec = bm25_score_f32_vec(tfs, [4, 9], dls, 100, 22.5, params)
    for i in range(3):
        scalar = bm25_score_f32(
            [float(tfs[0][i]), float(tfs[1][i])], [4, 9], float(dls[i]),
            100, 22.5, params,
        )
        assert vec[i] == scalar


def test_write_read_resume(tmp_path, spark, sf_index, bindex):
    path = str(tmp_path / "bidx")
    inputs = [f"{SF_SMOKE}/documents.parquet"]
    m1 = write_blocked_index(bindex, path, input_paths=inputs, config_repr="t")
    assert not m1["skipped"] and m1["status"] == "done"
    assert len(m1["partitions"]) >= 1
    # resume: identical input fingerprint => skipped
    m2 = write_blocked_index(bindex, path, input_paths=inputs, config_repr="t")
    assert m2["skipped"]
    # changed config => rebuild
    m3 = write_blocked_index(bindex, path, input_paths=inputs, config_repr="t2")
    assert not m3["skipped"]
    # read back and query
    bi = read_blocked_index(spark, path)
    eng = BlockSearchEngine(bi)
    res = eng.search_and(["data", "query"], k=5).collect()
    flat = SearchEngine(sf_index).search(
        SearchRequest(tokens=["data", "query"], scorer="float32", max_outputs=5)
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in res] == [
        (r["doc_id"], np.float32(r["score"])) for r in flat
    ]


def test_arrow_packer_byte_identical(sf_index, locs_sf_index):
    """The mapInArrow packer must emit byte-identical blocks to the
    mapInPandas reference packer, in both index modes (freq: no
    positions; locs: packed positions incl. label rows)."""
    from riot_spark.blocks import build_blocks, build_blocks_arrow

    for idx in (sf_index, locs_sf_index):
        want = sorted(
            (
                r["term"], r["block_id"], r["is_label"], r["n"],
                r["first_doc_id"], r["last_doc_id"],
                bytes(r["doc_ids"]), bytes(r["tfs"]),
                bytes(r["token_lens"]),
                bytes(r["positions"]) if r["positions"] is not None else None,
                np.float32(r["norm_max"]),
            )
            for r in build_blocks(idx, doc_block_bits=6).collect()
        )
        got = sorted(
            (
                r["term"], r["block_id"], r["is_label"], r["n"],
                r["first_doc_id"], r["last_doc_id"],
                bytes(r["doc_ids"]), bytes(r["tfs"]),
                bytes(r["token_lens"]),
                bytes(r["positions"]) if r["positions"] is not None else None,
                np.float32(r["norm_max"]),
            )
            for r in build_blocks_arrow(idx, doc_block_bits=6).collect()
        )
        assert got == want


def test_read_old_format_blocks(tmp_path, spark, sf_index, bindex):
    """A 0.1-format blocks parquet (no is_label / positions columns,
    no has_positions stat) must read with defaults and still serve
    queries — not fail at analysis time (ADVICE r2)."""
    path = str(tmp_path / "old_bidx")
    write_blocked_index(bindex, path, input_paths=[], config_repr="old")
    # rewrite the store as the 0.1 layout: strip the 0.2-only columns
    old_blocks = spark.read.parquet(f"{path}/blocks").drop(
        "is_label", "positions"
    )
    old_blocks.write.mode("overwrite").parquet(f"{path}/blocks_old")
    old_stats = spark.read.parquet(f"{path}/global_stats").drop("has_positions")
    old_stats.write.mode("overwrite").parquet(f"{path}/global_stats_old")
    import shutil

    shutil.rmtree(f"{path}/blocks")
    shutil.rmtree(f"{path}/global_stats")
    shutil.move(f"{path}/blocks_old", f"{path}/blocks")
    shutil.move(f"{path}/global_stats_old", f"{path}/global_stats")

    bi = read_blocked_index(spark, path)
    assert not bi.has_positions
    res = BlockSearchEngine(bi).search_and(["data", "query"], k=5).collect()
    flat = SearchEngine(sf_index).search(
        SearchRequest(tokens=["data", "query"], scorer="float32", max_outputs=5)
    ).collect()
    assert [r["doc_id"] for r in res] == [r["doc_id"] for r in flat]


def test_persisted_blocks_serve_batch(tmp_path, spark, locs_sf_index, locs_bindex):
    """The batch executor must work against a store READ BACK from
    parquet (the deployment shape: build once, persist, serve) —
    identical rows to the cached in-session index."""
    path = str(tmp_path / "batch_bidx")
    write_blocked_index(locs_bindex, path, input_paths=[], config_repr="b")
    bi = read_blocked_index(spark, path)
    reqs = {
        "a": SearchRequest(text="data query", max_outputs=10),
        "p": SearchRequest(tokens=["data", "query"], scorer="float32",
                           criteria="proximity", max_outputs=5),
        "l": SearchRequest(must=["data"], not_in=["dup"], max_outputs=8),
        "c": SearchRequest(text="data query", count_docs_only=True),
    }
    got = BlockSearchEngine(bi).search_batch(reqs).collect()
    want = BlockSearchEngine(locs_bindex).search_batch(reqs).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"] or -1)  # noqa: E731
    assert sorted(
        (r["query_id"], r["doc_id"], np.float32(r["score"]), r["rank"])
        for r in got
    ) == sorted(
        (r["query_id"], r["doc_id"], np.float32(r["score"]), r["rank"])
        for r in want
    )


def test_persisted_blocks_serve_proximity(tmp_path, spark, locs_sf_index, locs_bindex):
    """Packed positions must survive the write/read round-trip: the
    reloaded index serves proximity + snippets identically."""
    path = str(tmp_path / "locs_bidx")
    write_blocked_index(locs_bindex, path, input_paths=[], config_repr="locs")
    bi = read_blocked_index(spark, path)
    assert bi.has_positions
    got = BlockSearchEngine(bi).search_and(
        ["data", "query"], proximity=True
    ).collect()
    want = BlockSearchEngine(locs_bindex).search_and(
        ["data", "query"], proximity=True
    ).collect()
    assert sorted(
        (r["doc_id"], np.float32(r["score"]), r["proximity"],
         list(r["snippet_locs"] or [])) for r in got
    ) == sorted(
        (r["doc_id"], np.float32(r["score"]), r["proximity"],
         list(r["snippet_locs"] or [])) for r in want
    )


def test_deterministic_rebuild(spark, sf_index):
    """Same input twice => identical block contents (resume invariant)."""
    b1 = blocked_from_index(sf_index, doc_block_bits=6, cache=False)
    b2 = blocked_from_index(sf_index, doc_block_bits=6, cache=False)
    rows1 = sorted(
        (r["term"], r["block_id"], bytes(r["doc_ids"]), bytes(r["tfs"]))
        for r in b1.blocks.collect()
    )
    rows2 = sorted(
        (r["term"], r["block_id"], bytes(r["doc_ids"]), bytes(r["tfs"]))
        for r in b2.blocks.collect()
    )
    assert rows1 == rows2


@pytest.mark.parametrize("toks,k", [
    (["data", "query"], 5),
    (["data"], 10),       # hot single term, many blocks
    (["join", "filter"], 3),
    (["data", "zzznope"], 5),
])
def test_wand_topk_exact(bindex, toks, k):
    """The block-max WAND pruned path must return exactly the unpruned
    top-k (same docs, scores, order)."""
    eng = BlockSearchEngine(bindex)
    eng.WAND_MIN_POSTINGS = 0  # smoke corpus is below the df gate
    eng.WAND_MIN_RANGES = 0  # ~8 ranges: force past the skew probe
    eng.WAND_FLAT = 2.0
    pruned = eng.search_and(toks, k=k).collect()
    full = (
        eng.search_and(toks, k=0)
        .orderBy("score", ascending=False)
        .collect()
    )
    full = sorted(full, key=lambda r: (-r["score"], r["doc_id"]))[:k]
    assert [r["doc_id"] for r in pruned] == [r["doc_id"] for r in full]
    np.testing.assert_array_equal(
        np.array([r["score"] for r in pruned], dtype=np.float32),
        np.array([r["score"] for r in full], dtype=np.float32),
    )


@pytest.mark.parametrize("toks,k", [
    (["data", "query"], 5),
    (["data"], 3),        # hot term, small k: chunk walk has most work
    (["join", "filter"], 3),
])
def test_wand_threshold_mode_exact_fewer_jobs(spark, bindex, toks, k):
    """The bound-threshold finish (latency knob) must return exactly
    the chunk walk's top-k while launching fewer or equal Spark jobs
    — constant ~4 jobs regardless of how many chunks the walk needs."""
    eng = BlockSearchEngine(bindex)
    eng.WAND_MIN_POSTINGS = 0  # smoke corpus is below the df gate
    eng.WAND_MIN_RANGES = 0  # ~8 ranges: force past the skew probe
    eng.WAND_FLAT = 2.0

    def run(mode, group):
        sc = spark.sparkContext
        sc.setJobGroup(group, mode)
        try:
            rows = eng.search_and(toks, k=k, wand_mode=mode).collect()
        finally:
            sc.setJobGroup("", "")
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        return rows, jobs

    thr_rows, thr_jobs = run("threshold", f"wand_thr_{'_'.join(toks)}_{k}")
    chk_rows, chk_jobs = run("chunk", f"wand_chk_{'_'.join(toks)}_{k}")
    assert [(r["doc_id"], np.float32(r["score"])) for r in thr_rows] == [
        (r["doc_id"], np.float32(r["score"])) for r in chk_rows
    ]
    assert thr_jobs <= max(chk_jobs, 5)


def test_wand_df_gate_single_pass(spark, bindex):
    """Below WAND_MIN_POSTINGS candidate postings (driver-side Σdf
    bound), k > 0 must take the single-pass decode-all plan — same
    rows as the forced WAND walk, strictly fewer Spark jobs (the walk
    pays 2-3 extra sequential jobs that cannot pay off when decoding
    everything is already cheap)."""
    gated = BlockSearchEngine(bindex)  # class default: gate engaged
    forced = BlockSearchEngine(bindex)
    forced.WAND_MIN_POSTINGS = 0
    forced.WAND_MIN_RANGES = 0
    forced.WAND_FLAT = 2.0

    def run(eng, group):
        sc = spark.sparkContext
        sc.setJobGroup(group, group)
        try:
            rows = eng.search_and(["data", "query"], k=7).collect()
        finally:
            sc.setJobGroup("", "")
        return rows, len(sc.statusTracker().getJobIdsForGroup(group))

    got, gated_jobs = run(gated, "wand_gate_on")
    want, forced_jobs = run(forced, "wand_gate_off")
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]
    assert gated_jobs < forced_jobs


@pytest.fixture(scope="module")
def locs_sf_index(spark):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    return build_index(docs, cfg)


@pytest.fixture(scope="module")
def locs_bindex(locs_sf_index):
    return blocked_from_index(locs_sf_index, doc_block_bits=6)


@pytest.mark.parametrize(
    "toks", [["data", "query"], ["join", "filter", "sort"], ["batch"]]
)
def test_block_proximity_matches_flat(locs_sf_index, locs_bindex, toks):
    """Packed-positions proximity DP must equal the flat LocsIndex
    kernel: same docs, float32 scores, proximity values, snippet locs."""
    flat = SearchEngine(locs_sf_index).search(
        SearchRequest(tokens=toks, scorer="float32")
    ).collect()
    got = BlockSearchEngine(locs_bindex).search_and(toks, proximity=True).collect()
    f = {
        r["doc_id"]: (np.float32(r["score"]), r["proximity"],
                      list(r["snippet_locs"] or []))
        for r in flat
    }
    g = {
        r["doc_id"]: (np.float32(r["score"]), r["proximity"],
                      list(r["snippet_locs"] or []))
        for r in got
    }
    assert f == g


def test_block_labels_match_flat(spark):
    """Label postings packed as is_label block rows: intersection,
    unscorable guard, and WAND all agree with the flat engine."""
    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.col("source"))
    )
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi = blocked_from_index(idx, doc_block_bits=6)
    flat_eng, block_eng = SearchEngine(idx), BlockSearchEngine(bi)
    for k in (0, 10):
        flat = flat_eng.search(
            SearchRequest(tokens=["data"], labels=["src3"], scorer="float32",
                          max_outputs=k)
        ).collect()
        got = block_eng.search_and(["data"], labels=["src3"], k=k).collect()
        fs = sorted(
            ((r["doc_id"], np.float32(r["score"])) for r in flat),
            key=lambda x: (-x[1], x[0]),
        )
        gs = sorted(
            ((r["doc_id"], np.float32(r["score"])) for r in got),
            key=lambda x: (-x[1], x[0]),
        )
        assert fs == gs, k


@pytest.mark.parametrize("must,should,notin", [
    (["data"], ["query", "spark"], []),
    ([], ["query", "spark"], ["dup"]),
    ([], [], ["dup"]),
    (["data"], [], ["query"]),
    (["data", "zzznope"], [], []),
])
def test_block_logic_matches_flat(sf_index, bindex, must, should, notin):
    flat = SearchEngine(sf_index).search(
        SearchRequest(must=must, should=should, not_in=notin)
    ).collect()
    got = BlockSearchEngine(bindex).search_logic(must, should, notin).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in flat)


def test_prox_rank_then_hydrate(locs_sf_index, locs_bindex):
    """Top-k proximity/snippet queries via rank-then-hydrate (gate
    forced open) must return exactly the decode-everything prox
    plan's rows — doc ids, float32 scores, proximity values, and
    snippet paths."""
    from riot_spark.blocks import jvm_pack_available

    if not jvm_pack_available(locs_bindex.blocks.sparkSession):
        pytest.skip("riotspark.jar not on the session classpath")
    plain = BlockSearchEngine(locs_bindex)
    fast = BlockSearchEngine(locs_bindex)
    fast.WAND_SINGLE_ONEPASS_MIN_POSTINGS = 0  # force the route
    calls = []
    orig = fast._prox_rank_then_hydrate

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    fast._prox_rank_then_hydrate = spy
    for toks, k in ([["data", "query"], 10], [["data"], 25],
                    [["group"], 500]):  # k > matches: short winners
        want = plain.search_and(toks, k=k, proximity=True).collect()
        calls.clear()
        got = fast.search_and(toks, k=k, proximity=True).collect()
        assert calls, (toks, k)
        assert [
            (r["doc_id"], np.float32(r["score"]), r["proximity"],
             list(r["snippet_locs"]))
            for r in got
        ] == [
            (r["doc_id"], np.float32(r["score"]), r["proximity"],
             list(r["snippet_locs"]))
            for r in want
        ], (toks, k)


def test_count_batch_routes_match_flat(spark, sf_index, bindex):
    """CountDocsOnly routing: single-keyword no-whitelist counts come
    from block metadata only (sum of n, doc_ids never read);
    whitelisted and multi-keyword counts ride the in-kernel per-block
    count; a term with a dual content+label block falls back off the
    metadata route.  Every route must equal the flat engine's count."""
    flat_eng = SearchEngine(sf_index)
    beng = BlockSearchEngine(bindex)
    reqs = {
        "single": SearchRequest(text="data", count_docs_only=True),
        "single2": SearchRequest(text="query", count_docs_only=True),
        "multi": SearchRequest(text="data query", count_docs_only=True),
        "wl": SearchRequest(text="data", doc_ids=list(range(0, 300, 2)),
                            count_docs_only=True),
        "miss": SearchRequest(text="zzznope", count_docs_only=True),
    }
    got = {r["query_id"]: int(r["score"])
           for r in beng.search_batch(reqs).collect()}
    want = {r["query_id"]: int(r["score"])
            for r in flat_eng.search_batch(reqs).collect()}
    assert got == want

    # dual content+label term: 'data' as text token AND as a label on
    # every doc => some block holds it both ways => metadata route
    # must refuse it (double-count risk) and the kernel must still
    # count distinct docs
    docs = load_documents(spark, SF_SMOKE).withColumn(
        "labels", F.array(F.lit("data"))
    )
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg, labels_col="labels")
    bi2 = blocked_from_index(idx, doc_block_bits=6)
    dual_req = {"dual": SearchRequest(text="data", count_docs_only=True)}
    got2 = BlockSearchEngine(bi2).search_batch(dual_req).collect()
    want2 = SearchEngine(idx).search_batch(dual_req).collect()
    assert int(got2[0]["score"]) == int(want2[0]["score"])
    # every doc carries the 'data' label => count = all docs
    assert int(got2[0]["score"]) == idx.n_docs


def test_logic_batch_early_exit_matches_flat(sf_index, bindex):
    """The capped JVM logic batch (per-task emission stops at
    offset+k, blocks walked doc-ascending, satisfied tasks skip the
    rest) must slice identically to the flat engine across shapes —
    incl. offsets and k smaller than one block's match count, where
    the trim actually bites (doc_block_bits=6 => ~64-doc ranges,
    'data' matches hundreds of docs)."""
    from riot_spark.blocks import jvm_pack_available

    if not jvm_pack_available(bindex.blocks.sparkSession):
        pytest.skip("riotspark.jar not on the session classpath")
    reqs = {
        "msn": SearchRequest(must=["data"], should=["query", "spark"],
                             not_in=["dup"], max_outputs=5),
        "off": SearchRequest(must=["data"], max_outputs=4, offset=7),
        "sh": SearchRequest(should=["query", "spark"], max_outputs=6),
        "ni": SearchRequest(not_in=["dup"], max_outputs=3),
        "wl": SearchRequest(must=["data"], doc_ids=list(range(0, 400, 3)),
                            max_outputs=5),
        "all": SearchRequest(must=["data"], not_in=["query"]),  # k=0
    }
    flat_eng = SearchEngine(sf_index)
    got = BlockSearchEngine(bindex).search_batch(reqs).collect()
    by_q: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"])
        )
    for qid, req in reqs.items():
        want = flat_eng.search(req).collect()
        want_ids = [r["doc_id"] for r in want]
        got_ids = [d for _rk, d in by_q.get(qid, [])]
        assert got_ids == want_ids, qid


def test_budgeted_search_partial_results(sf_index):
    """Q13 batch analogue: a generous budget returns the exact top-k
    with timed_out=False; a zero budget returns a bound-ordered
    partial subset with timed_out=True."""
    # fine-grained ranges (4 docs each) so the walk has many chunks
    eng = BlockSearchEngine(blocked_from_index(sf_index, doc_block_bits=2))
    exact = eng.search_and(["data"], k=10).collect()
    full, t1 = eng.search_and_budgeted(["data"], k=10, budget_s=300.0)
    full = full.collect()
    assert not t1
    assert [(r["doc_id"], np.float32(r["score"])) for r in full] == [
        (r["doc_id"], np.float32(r["score"])) for r in exact
    ]
    part, t2 = eng.search_and_budgeted(["data"], k=10, budget_s=0.0)
    part = part.collect()
    assert t2  # many groups, zero budget => partial
    exact_set = {(r["doc_id"], np.float32(r["score"])) for r in exact}
    # every returned row is a genuine scored candidate; the walk is
    # bound-first so rows come from the highest-potential ranges
    got_scores = {r["doc_id"]: np.float32(r["score"]) for r in part}
    flat_all = {
        r["doc_id"]: np.float32(r["score"])
        for r in eng.search_and(["data"], k=0).collect()
    }
    for d, sc in got_scores.items():
        assert flat_all[d] == sc
    assert len(part) <= 10


def test_persisted_postings_pushdown(spark, sf_index, tmp_path):
    """Reading the persisted index must push the term filter into the
    parquet scan (PushedFilters) and prune unread columns (ReadSchema)
    — the plan properties that make point lookups cheap at 100 TB."""
    path = str(tmp_path / "idx")
    sf_index.postings.write.mode("overwrite").parquet(path)
    q = (
        spark.read.parquet(path)
        .where(F.col("term") == "data")
        .select("doc_id", "tf")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,data)]" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in rs and "tf" in rs
    assert "positions" not in rs and "token_len" not in rs


def test_term_stats_sorted_layout_and_pushdown(tmp_path, spark, bindex):
    """Persisted term_stats must be term-sorted with non-overlapping
    row groups (so a query's In(term) probe prunes to O(probe) row
    groups on a huge vocabulary) and the lookup filter must reach the
    parquet scan."""
    import glob

    import pyarrow.parquet as papq

    from riot_spark.blocks import read_blocked_index, write_blocked_index

    path = str(tmp_path / "store")
    write_blocked_index(bindex, path, input_paths=[], config_repr="ts")
    files = sorted(glob.glob(f"{path}/term_stats/*.parquet"))
    assert files
    seen_groups = 0
    for fp in files:
        md = papq.ParquetFile(fp).metadata
        ti = md.schema.names.index("term")
        prev_max = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ti).statistics
            assert st is not None and st.has_min_max
            if prev_max is not None:
                assert st.min >= prev_max, "row groups overlap"
            prev_max = st.max
            seen_groups += 1
    assert seen_groups >= 1

    bi2 = read_blocked_index(spark, path)
    bi2._term_df_cache = None  # force the distributed lookup path
    plan = (
        bi2.term_stats.where(F.col("term").isin(["data", "query"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pushed = [ln for ln in plan.splitlines()
              if "PushedFilters" in ln and "term" in ln]
    assert pushed, f"term lookup lost the scan pushdown:\n{plan}"
    want = BlockSearchEngine(bindex).bi.lookup_terms(["data", "query"])
    assert bi2.lookup_terms(["data", "query"]) == want


def test_onepass_spill_guard(sf_index, bindex):
    """SCALING.md limit 5 auto-guard: the one-pass kernels size their
    block_id exchange from a driver-side metadata estimate so the
    per-task heap buffer fits the budget, and REFUSE the dispatch
    (returning None -> the spillable fallback plan) when no partition
    count can bound it — with results identical either way."""
    import dataclasses

    from riot_spark.blocks import jvm_pack_available

    spark = bindex.blocks.sparkSession
    conf_key = BlockSearchEngine.ONEPASS_BUDGET_CONF
    n_def = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    # unit: partition sizing from metadata only (no jobs)
    big = dataclasses.replace(bindex, n_docs=10_000_000, doc_block_bits=13)
    beng = BlockSearchEngine(big)
    spark.conf.set(conf_key, str(1 << 20))  # 1 MiB per task
    try:
        # 10M postings x 12 B = 120e6 B -> ceil(120e6 / 2^20) = 115
        # tasks needed; raised with 2x hash-imbalance headroom
        # (10M docs >> 13 = 1221 ranges, so raising is possible)
        assert beng._onepass_parts(10_000_000, 12) == 230
        # even one doc-range group can exceed the budget: refuse
        assert beng._onepass_parts(10_000_000_000, 12) is None
    finally:
        spark.conf.unset(conf_key)
    # default budget: the common case passes shuffle partitions through
    assert beng._onepass_parts(10_000_000, 12) == n_def

    # e2e: a 1-byte budget makes every one-pass dispatch refuse; the
    # fallback plans must produce identical answers
    if not jvm_pack_available(spark):
        pytest.skip("riotspark.jar not on the session classpath")
    want = (
        BlockSearchEngine(bindex).search_and(["data", "query"], k=10).collect()
    )
    lw = (
        BlockSearchEngine(bindex)
        .search_logic(must=["data"], not_in=["dup"])
        .collect()
    )
    guarded = BlockSearchEngine(bindex)
    guarded.WAND_SINGLE_ONEPASS_MIN_POSTINGS = 0  # force the route
    refusals = []
    orig = guarded._wand_onepass_jvm

    def spy(*a, **kw):
        out = orig(*a, **kw)
        refusals.append(out is None)
        return out

    guarded._wand_onepass_jvm = spy
    spark.conf.set(conf_key, "1")
    try:
        got = guarded.search_and(["data", "query"], k=10).collect()
        lg = guarded.search_logic(must=["data"], not_in=["dup"]).collect()
    finally:
        spark.conf.unset(conf_key)
    assert refusals and all(refusals), "guard never engaged"
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]
    assert sorted(r["doc_id"] for r in lg) == sorted(r["doc_id"] for r in lw)


def test_mixed_batch_callable_criteria_routes_to_flat(sf_index, bindex):
    """A mixed batch containing a callable-criteria request must pass
    through SearchEngine.search_batch with blocks attached: the
    batchable shapes ride the block kernel, the callable-criteria
    request routes to the flat executor, and the union matches a pure
    flat run (blocks became the default dispatch in r4 — this shape
    raised then)."""
    def crit(pdf):
        return pdf["score"] * 2.0

    reqs = {
        "and1": SearchRequest(text="data query", max_outputs=10),
        "logic": SearchRequest(must=["data"], not_in=["dup"], max_outputs=8),
        "count": SearchRequest(text="data query", count_docs_only=True),
        "call": SearchRequest(text="data query", scorer="float32",
                              criteria=crit, max_outputs=5),
    }
    attached = SearchEngine(sf_index).attach_blocks(bindex)
    got = attached.search_batch(reqs).collect()
    want = SearchEngine(sf_index).search_batch(reqs).collect()

    def by_qid(rows):
        out: dict[str, list] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(float(r["score"]), 4))
            )
        return {k: sorted(v) for k, v in out.items()}

    g, e = by_qid(got), by_qid(want)
    assert set(g) == set(e) == set(reqs)
    for qid in reqs:
        assert g[qid] == e[qid], qid


def test_block_search_batch_matches_flat(sf_index, bindex):
    """Block-path search_batch must agree with the flat engine's
    search_batch on every shape it serves: AND top-k (offset,
    ReverseOrder, whitelist), logic, orderless, count."""
    flat_eng = SearchEngine(sf_index)
    block_eng = BlockSearchEngine(bindex)
    wl_ids = list(range(0, 100, 2))
    reqs = {
        "and1": SearchRequest(text="data query", max_outputs=10),
        "and2": SearchRequest(text="batch", max_outputs=5, offset=3),
        "rev": SearchRequest(text="data query", max_outputs=10,
                             reverse_order=True),
        "wl": SearchRequest(text="data", doc_ids=wl_ids, max_outputs=10),
        "all": SearchRequest(text="group order"),  # unlimited
        "missing": SearchRequest(text="data zzzqx", max_outputs=10),
        "orderless": SearchRequest(text="group order", orderless=True),
        "count": SearchRequest(text="data query", count_docs_only=True),
        "count_wl": SearchRequest(text="data", doc_ids=wl_ids,
                                  count_docs_only=True),
        "orderless_wl": SearchRequest(text="data", doc_ids=wl_ids,
                                      orderless=True),
        "logic": SearchRequest(must=["data"], should=["query", "spark"],
                               not_in=["dup"]),
        "logic_k": SearchRequest(must=["data"], not_in=["query"],
                                 max_outputs=8, offset=2),
    }
    got = block_eng.search_batch(reqs).collect()
    expect = flat_eng.search_batch(reqs).collect()

    def by_qid(rows):
        out: dict[str, list] = {}
        for r in rows:
            out.setdefault(r["query_id"], []).append(r)
        return out

    g, e = by_qid(got), by_qid(expect)
    assert set(g) == set(e)
    assert "missing" not in g
    for qid in g:
        gs = sorted(g[qid], key=lambda r: (r["rank"], r["doc_id"] or -1))
        es = sorted(e[qid], key=lambda r: (r["rank"], r["doc_id"] or -1))
        assert [(r["doc_id"], r["rank"]) for r in gs] == [
            (r["doc_id"], r["rank"]) for r in es
        ], qid
        np.testing.assert_allclose(
            [r["score"] for r in gs], [r["score"] for r in es],
            rtol=1e-5, atol=1e-6, err_msg=qid,
        )


def test_block_search_request_surface(sf_index, bindex):
    """Single-request block search() serves the five parity shapes
    (whitelist / offset / ReverseOrder / CountDocsOnly / orderless)
    identically to the flat engine."""
    flat_eng = SearchEngine(sf_index)
    block_eng = BlockSearchEngine(bindex)
    shapes = [
        SearchRequest(text="data", doc_ids=list(range(0, 100, 2)),
                      max_outputs=10),
        SearchRequest(text="data query", offset=5, max_outputs=5),
        SearchRequest(text="data query", max_outputs=10, reverse_order=True),
    ]
    for req in shapes:
        exp = flat_eng.search(req).select("doc_id", "score").collect()
        res = block_eng.search(req).collect()
        assert [r["doc_id"] for r in res] == [r["doc_id"] for r in exp], req
        np.testing.assert_allclose(
            [r["score"] for r in res], [r["score"] for r in exp],
            rtol=1e-5, atol=1e-6,
        )
    # count
    creq = SearchRequest(text="data query", count_docs_only=True)
    assert (block_eng.search(creq).collect()[0]["num_docs"]
            == flat_eng.search(creq).collect()[0]["num_docs"])
    # orderless
    oreq = SearchRequest(text="group order", orderless=True)
    assert sorted(r["doc_id"] for r in block_eng.search(oreq).collect()) == \
        sorted(r["doc_id"] for r in flat_eng.search(oreq).collect())
    # the one remaining unsupported shape (callable criteria) raises,
    # never silently drops
    with pytest.raises(ValueError):
        block_eng.search_batch(
            {"bad": SearchRequest(text="data",
                                  criteria=lambda pdf: pdf["score"])}
        )
    # proximity criteria on a freq-only block store raises too (no
    # packed positions to serve it from)
    with pytest.raises(ValueError):
        block_eng.search_batch(
            {"p": SearchRequest(text="data", criteria="proximity")}
        )


def test_block_batch_proximity_criteria(locs_sf_index, locs_bindex):
    """criteria='proximity' batches on the packed positions: block
    batch vs flat batch, incl. a mixed family batch (prox + AND +
    logic in one call)."""
    flat_eng = SearchEngine(locs_sf_index)
    block_eng = BlockSearchEngine(locs_bindex)
    reqs = {
        "p1": SearchRequest(tokens=["data", "query"], scorer="float32",
                            criteria="proximity", max_outputs=10),
        "p2": SearchRequest(tokens=["join", "filter"], scorer="float32",
                            criteria="proximity", max_outputs=5, offset=2),
        "a1": SearchRequest(text="data query", max_outputs=10),
        "l1": SearchRequest(must=["data"], not_in=["dup"], max_outputs=8),
    }
    got = block_eng.search_batch(reqs).collect()
    want = flat_eng.search_batch(reqs).collect()

    def by_qid(rows):
        out: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            out.setdefault(r["query_id"], []).append(r)
        return out

    g, w = by_qid(got), by_qid(want)
    assert set(g) == set(w)
    for qid in w:
        assert [(r["doc_id"], r["rank"]) for r in g[qid]] == [
            (r["doc_id"], r["rank"]) for r in w[qid]
        ], qid
        np.testing.assert_allclose(
            [r["score"] for r in g[qid]], [r["score"] for r in w[qid]],
            rtol=1e-5, atol=1e-6, err_msg=qid,
        )


def test_wand_batch_matches_unpruned(sf_index, bindex):
    """Batched block-max WAND (search_batch with the per-query gate
    forced open) is rank- and score-identical to the decode-everything
    batch pass, across mixed shapes: top-k, offset, a term pair, a
    single hot term, plus co-batched shapes the WAND gate must route
    around (ReverseOrder, whitelist, unlimited, logic, count)."""
    wl_ids = list(range(0, 100, 2))
    reqs = {
        "hot1": SearchRequest(text="data", max_outputs=10),
        "and2": SearchRequest(text="data query", max_outputs=10),
        "off": SearchRequest(text="batch", max_outputs=5, offset=3),
        "rev": SearchRequest(text="data query", max_outputs=10,
                             reverse_order=True),
        "wl": SearchRequest(text="data", doc_ids=wl_ids, max_outputs=10),
        "all": SearchRequest(text="group order"),  # k=0: not eligible
        "logic": SearchRequest(must=["data"], should=["query"],
                               not_in=["dup"], max_outputs=8),
        "count": SearchRequest(text="data query", count_docs_only=True),
        # more candidates than offset+k exist is the pruning case; a
        # query where they don't (k > n matches) exercises the no-tau
        # branch (cutoff -inf => phase 2 scores every remaining range)
        "tiny": SearchRequest(text="group", max_outputs=500),
    }
    plain = BlockSearchEngine(bindex)
    pruned = BlockSearchEngine(bindex)
    pruned.WAND_BATCH_MIN_POSTINGS = 0  # every eligible query takes WAND
    pruned.WAND_MIN_RANGES = 0  # smoke corpus has ~8 ranges
    pruned.WAND_FLAT = 2.0  # force past the skew probe
    pruned.WAND_ONEPASS_MIN_POSTINGS = 0  # one-pass kernel when jarred
    want = plain.search_batch(reqs).collect()
    onepass_calls = []
    orig_onepass = pruned._wand_onepass_jvm

    def spy(*a, **kw):
        onepass_calls.append(1)
        return orig_onepass(*a, **kw)

    pruned._wand_onepass_jvm = spy
    got = pruned.search_batch(reqs).collect()
    # engagement proof: jarred sessions take the one-pass kernel
    # (which persists NO scratch — the pruned plan is one exchange +
    # one kernel stage); jarless sessions take the two-phase walk,
    # which persists its bounds table
    from riot_spark.blocks import jvm_pack_available

    if jvm_pack_available(bindex.blocks.sparkSession):
        assert onepass_calls, "one-pass WAND kernel engaged"
    else:
        assert pruned._scratch, "WAND pass engaged (scratch persisted)"

    def by_qid(rows):
        out: dict[str, list] = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"],
                                             r["doc_id"] or -1)):
            out.setdefault(r["query_id"], []).append(r)
        return out

    g, w = by_qid(got), by_qid(want)
    assert set(g) == set(w)
    for qid in w:
        assert [(r["doc_id"], r["rank"]) for r in g[qid]] == [
            (r["doc_id"], r["rank"]) for r in w[qid]
        ], qid
        np.testing.assert_allclose(
            [r["score"] for r in g[qid]], [r["score"] for r in w[qid]],
            rtol=1e-6, atol=1e-7, err_msg=qid,
        )
    # a fresh batch releases the previous batch's scratch: the new
    # batch holds only its own persists (bounds, plus score1 on the
    # two-phase path; the one-pass JVM kernel persists NOTHING).
    # Force the two-phase walk so scratch is actually created.
    pruned.WAND_IMPL = "twophase"
    pruned.search_batch(
        {"q": SearchRequest(text="data", max_outputs=3)}
    ).collect()
    prev = list(pruned._scratch)
    assert prev and len(prev) <= 2
    pruned.search_batch({"q2": SearchRequest(text="query", max_outputs=3)})
    assert not any(df is p for df in pruned._scratch for p in prev)


def test_wand_onepass_matches_twophase(sf_index, bindex):
    """The one-pass JVM kernel (τ pruning inside
    BlockQuery.searchAndBatchPruned) must be rank- and score-identical
    to the two-phase Python-orchestrated walk it replaces, in both
    score modes."""
    from riot_spark.blocks import jvm_pack_available

    if not jvm_pack_available(bindex.blocks.sparkSession):
        import pytest

        pytest.skip("riotspark.jar not on the session classpath")
    reqs = {
        "hot1": SearchRequest(text="data", max_outputs=10),
        "and2": SearchRequest(text="data query", max_outputs=10, offset=2),
        "wl": SearchRequest(text="data", doc_ids=list(range(0, 100, 2)),
                            max_outputs=10),
        "tiny": SearchRequest(text="group", max_outputs=500),
    }

    def forced(impl):
        e = BlockSearchEngine(bindex)
        e.WAND_BATCH_MIN_POSTINGS = 0
        e.WAND_MIN_RANGES = 0
        e.WAND_FLAT = 2.0
        e.WAND_ONEPASS_MIN_POSTINGS = 0
        e.WAND_IMPL = impl
        return e

    one = forced("auto")
    two = forced("twophase")
    got = one.search_batch(reqs).collect()
    want = two.search_batch(reqs).collect()
    # the one-pass path persists nothing (one exchange + one kernel
    # stage); the two-phase walk persists bounds + score1
    assert len(one._scratch) == 0 and len(two._scratch) == 2
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"])  # noqa: E731
    g, w = sorted(got, key=key), sorted(want, key=key)
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in g] == [
        (r["query_id"], r["doc_id"], r["rank"]) for r in w
    ]
    np.testing.assert_allclose(
        [r["score"] for r in g], [r["score"] for r in w], rtol=1e-7, atol=0
    )
    # double_scores mode rides the kernel's float64 tail (andScoreD,
    # roundKeys on): still one-pass under 'auto', and bit-identical —
    # after the caller's round(4) — to the two-phase float64 walk
    one2, two2 = forced("auto"), forced("twophase")
    got2 = one2.search_batch(reqs, double_scores=True).collect()
    want2 = two2.search_batch(reqs, double_scores=True).collect()
    assert len(one2._scratch) == 0 and len(two2._scratch) == 2
    g2, w2 = sorted(got2, key=key), sorted(want2, key=key)
    assert [(r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in g2] \
        == [(r["query_id"], r["doc_id"], r["rank"], r["score"]) for r in w2]


def test_wand_batch_double_scores(sf_index, bindex):
    """The float64-oracle mode (double_scores) takes the same WAND
    pass through the pandas kernel and stays identical under the
    caller's 4-decimal rounding."""
    reqs = {
        "hot1": SearchRequest(text="data", max_outputs=15),
        "and2": SearchRequest(text="data query", max_outputs=10, offset=2),
    }
    plain = BlockSearchEngine(bindex)
    pruned = BlockSearchEngine(bindex)
    pruned.WAND_BATCH_MIN_POSTINGS = 0
    pruned.WAND_MIN_RANGES = 0
    pruned.WAND_FLAT = 2.0
    want = plain.search_batch(reqs, double_scores=True).collect()
    got = pruned.search_batch(reqs, double_scores=True).collect()
    assert pruned._scratch
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(((r["query_id"], r["rank"], r["doc_id"], r["score"])
                   for r in got)) == sorted(
        ((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in want)
    )


def test_wand_batch_probe_fallback(sf_index, bindex):
    """On a corpus whose bound distribution the skew probe rejects
    (smoke corpus: few ranges, near-uniform bounds), a WAND-eligible
    batch routes back to the single unpruned pass — identical rows,
    and no kernel scratch left persisted (only metadata jobs spent)."""
    reqs = {
        "h": SearchRequest(text="data", max_outputs=10),
        "a": SearchRequest(text="data query", max_outputs=10),
    }
    plain = BlockSearchEngine(bindex)
    probed = BlockSearchEngine(bindex)
    probed.WAND_BATCH_MIN_POSTINGS = 0  # df gate open; probe decides
    want = plain.search_batch(reqs).collect()
    got = probed.search_batch(reqs).collect()
    assert not probed._scratch, "probe declined: no persisted phases"
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_wand_pushdown_reaches_parquet_scan(tmp_path, spark, sf_index, bindex):
    """A WAND phase's small range selection must reach the parquet
    scan as a pushed In(block_id) filter on a persisted store — the
    property that makes pruned ranges bytes that are NEVER READ on a
    disk-resident index (above WAND_PUSHDOWN_IDS it degrades to a
    left-semi join: ids move, packed bytes don't, but row groups are
    still read)."""
    path = str(tmp_path / "pushdown_bidx")
    write_blocked_index(bindex, path, input_paths=[], config_repr="pd")
    bi = read_blocked_index(spark, path)  # raw parquet read, no cache
    eng = BlockSearchEngine(bi)
    matched = bi.blocks.where(F.col("term").isin(["data", "query"]))
    sel = (
        bi.blocks.where(F.col("term") == "data")
        .select("block_id").distinct().limit(3)
    )
    picked = eng._select_blocks(matched, sel)
    plan = picked._jdf.queryExecution().executedPlan().toString()
    assert "In(block_id" in plan, plan[:2000]
    # above the cap: selection stays a join (no pushed In filter)
    eng.WAND_PUSHDOWN_IDS = 0
    joined = eng._select_blocks(matched, sel)
    plan2 = joined._jdf.queryExecution().executedPlan().toString()
    assert "In(block_id" not in plan2, plan2[:2000]
    assert picked.count() == joined.count()


def test_merge_blocked_indexes_incremental(spark):
    """LSM-style append merge: two half-corpus block stores merged
    WITHOUT repacking the base must answer every query exactly like an
    index built over the full corpus — including the one boundary doc
    range both halves touch, packed-position proximity, and a forced
    WAND walk on the merged store (whose rescaled norm_max bounds must
    still dominate)."""
    from riot_spark.blocks import merge_blocked_indexes

    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    split = 300  # NOT a multiple of 2^6: block 4 becomes the boundary
    base_idx = build_index(docs.where(F.col("doc_id") < split), cfg)
    delta_idx = build_index(docs.where(F.col("doc_id") >= split), cfg)
    full_idx = build_index(docs, cfg)
    base_bi = blocked_from_index(base_idx, doc_block_bits=6)
    delta_bi = blocked_from_index(delta_idx, doc_block_bits=6)
    merged = merge_blocked_indexes(base_bi, delta_bi)

    assert merged.n_docs == 500
    np.testing.assert_allclose(merged.avgdl, full_idx.avgdl, rtol=1e-9)
    # exactly one row per (term, block_id, is_label) — the boundary
    # block's rows merged instead of duplicating
    dup = (
        merged.blocks.groupBy("term", "block_id", "is_label")
        .count().where(F.col("count") > 1).count()
    )
    assert dup == 0
    # the boundary range really was shared (split not block-aligned)
    shared = (
        base_bi.blocks.select("block_id").distinct()
        .intersect(delta_bi.blocks.select("block_id").distinct()).count()
    )
    assert shared == 1

    flat = SearchEngine(full_idx)
    eng = BlockSearchEngine(merged)
    for toks in (["data", "query"], ["join", "filter"], ["batch"]):
        want = flat.search(
            SearchRequest(tokens=toks, scorer="float32", max_outputs=50)
        ).collect()
        got = eng.search_and(toks, k=50).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], toks
        np.testing.assert_allclose(
            [float(r["score"]) for r in got],
            [float(r["score"]) for r in want],
            rtol=1e-6, err_msg=str(toks),
        )
    # packed positions survive the boundary repack: proximity parity
    want = flat.search(
        SearchRequest(tokens=["data", "query"], scorer="float32")
    ).collect()
    got = eng.search_and(["data", "query"], proximity=True).collect()
    assert {
        r["doc_id"]: (r["proximity"], list(r["snippet_locs"] or []))
        for r in got
    } == {
        r["doc_id"]: (r["proximity"], list(r["snippet_locs"] or []))
        for r in want
    }
    # WAND on the merged store: rescaled bounds must still dominate
    wand = BlockSearchEngine(merged)
    wand.WAND_MIN_POSTINGS = 0
    wand.WAND_MIN_RANGES = 0
    wand.WAND_FLAT = 2.0
    got = wand.search_and(["data", "query"], k=10).collect()
    want = eng.search_and(["data", "query"], k=10).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]
    # append-only contract enforced
    with pytest.raises(ValueError):
        merge_blocked_indexes(delta_bi, base_bi)


def test_append_blocked_index_segments(tmp_path, spark):
    """Persisted LSM segments: a base store plus two appended deltas
    must read back as ONE index that answers exactly like a
    full-corpus build — without any base file rewrite.  Re-appending
    the same input is a fingerprint skip; out-of-order appends are
    rejected at append time."""
    import os

    from riot_spark.blocks import append_blocked_index

    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    cuts = [(0, 200), (200, 330), (330, 500)]  # 200, 330 not 64-aligned
    parts = [
        blocked_from_index(
            build_index(
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                cfg,
            ),
            doc_block_bits=6,
        )
        for lo, hi in cuts
    ]
    path = str(tmp_path / "lsm_store")
    write_blocked_index(parts[0], path, input_paths=[], config_repr="seg0")
    base_files = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(f"{path}/blocks") for f in fs
    }
    m1 = append_blocked_index(parts[1], path, input_paths=[],
                              config_repr="seg1")
    m2 = append_blocked_index(parts[2], path, input_paths=[],
                              config_repr="seg2")
    assert not m1["skipped"] and not m2["skipped"]
    assert m1["segment"] == "000000" and m2["segment"] == "000001"
    # base files untouched by both appends
    after = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(f"{path}/blocks") for f in fs
    }
    assert after == base_files
    # idempotent re-append: fingerprint skip
    m3 = append_blocked_index(parts[2], path, input_paths=[],
                              config_repr="seg2")
    assert m3["skipped"]
    # out-of-order append rejected
    with pytest.raises(ValueError):
        append_blocked_index(parts[1], path, input_paths=[],
                             config_repr="seg1-again-different")

    merged = read_blocked_index(spark, path)
    assert merged.n_docs == 500
    full_idx = build_index(docs, cfg)
    flat = SearchEngine(full_idx)
    eng = BlockSearchEngine(merged)
    for toks in (["data", "query"], ["batch"]):
        want = flat.search(
            SearchRequest(tokens=toks, scorer="float32", max_outputs=30)
        ).collect()
        got = eng.search_and(toks, k=30).collect()
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want], toks
        np.testing.assert_allclose(
            [float(r["score"]) for r in got],
            [float(r["score"]) for r in want],
            rtol=1e-6, err_msg=str(toks),
        )
    # the 3-way boundary kernel: no duplicate (term, block, label) rows
    dup = (
        merged.blocks.groupBy("term", "block_id", "is_label")
        .count().where(F.col("count") > 1).count()
    )
    assert dup == 0


def test_compact_segments_folds_store(tmp_path, spark):
    """compact_segments collapses LSM segments into a single base
    (staged next to the live store, swapped atomically): the compacted
    store has no segments, keeps the streaming sidecar, answers
    identically, and further appends start from segment 0 again."""
    import json as _json
    import os

    from riot_spark.blocks import append_blocked_index, compact_segments

    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    mk = lambda lo, hi: blocked_from_index(  # noqa: E731
        build_index(
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), cfg
        ),
        doc_block_bits=6,
    )
    path = str(tmp_path / "lsm2")
    write_blocked_index(mk(0, 200), path, input_paths=[], config_repr="a")
    append_blocked_index(mk(200, 330), path, input_paths=[], config_repr="b")
    append_blocked_index(mk(330, 500), path, input_paths=[], config_repr="c")
    with open(f"{path}/stream_state.json", "w") as f:
        _json.dump({"last_batch": 7}, f)
    before = BlockSearchEngine(read_blocked_index(spark, path)).search_and(
        ["data", "query"], k=20
    ).collect()

    m = compact_segments(spark, path)
    assert not m["skipped"] and m["segments"] == 2
    assert not os.path.isdir(f"{path}/segments")
    assert not os.path.exists(f"{path}.compacting")
    assert not os.path.exists(f"{path}.precompact")
    with open(f"{path}/stream_state.json") as f:
        assert _json.load(f)["last_batch"] == 7

    merged = read_blocked_index(spark, path)
    after = BlockSearchEngine(merged).search_and(
        ["data", "query"], k=20
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in after] == [
        (r["doc_id"], np.float32(r["score"])) for r in before
    ]
    # second compaction: no-op; appends resume at segment 000000
    assert compact_segments(spark, path)["skipped"]
    docs2 = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    m2 = append_blocked_index(
        blocked_from_index(build_index(docs2, cfg), doc_block_bits=6),
        path, input_paths=[], config_repr="d",
    )
    assert m2["segment"] == "000000"
    assert read_blocked_index(spark, path).n_docs == 1000


def test_delete_from_blocked_matches_flat(spark, locs_sf_index, locs_bindex):
    """Block-level delete (S2 on the packed layout) must answer like
    the flat remove_docs rebuild: stats (N, avgdl, df) recomputed
    exactly, deleted docs gone from every query shape, untouched
    ranges byte-identical, and the forced WAND walk still exact under
    the rescaled bounds."""
    from riot_spark.blocks import delete_from_blocked
    from riot_spark.engine import remove_docs

    dead = list(range(0, 150, 3))
    flat_idx = remove_docs(locs_sf_index, dead)
    got_bi = delete_from_blocked(locs_bindex, dead)
    want_bi = blocked_from_index(flat_idx, doc_block_bits=6)

    assert got_bi.n_docs == flat_idx.n_docs
    np.testing.assert_allclose(got_bi.avgdl, flat_idx.avgdl, rtol=1e-9)
    got_df = {(r["term"]): r["df"] for r in got_bi.term_stats.collect()}
    want_df = {(r["term"]): r["df"] for r in flat_idx.term_stats.collect()}
    assert got_df == want_df

    flat_eng = SearchEngine(flat_idx)
    eng = BlockSearchEngine(got_bi)
    for toks in (["data", "query"], ["batch"], ["join", "filter"]):
        want = flat_eng.search(
            SearchRequest(tokens=toks, scorer="float32", max_outputs=30)
        ).collect()
        got = eng.search_and(toks, k=30).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
            (r["doc_id"], np.float32(r["score"])) for r in want
        ], toks
        assert not any(r["doc_id"] in set(dead) for r in got)
    # proximity survives the repack of touched ranges
    want = flat_eng.search(
        SearchRequest(tokens=["data", "query"], scorer="float32")
    ).collect()
    got = eng.search_and(["data", "query"], proximity=True).collect()
    assert {
        r["doc_id"]: (r["proximity"], list(r["snippet_locs"] or []))
        for r in got
    } == {
        r["doc_id"]: (r["proximity"], list(r["snippet_locs"] or []))
        for r in want
    }
    # packed payloads agree with a from-scratch rebuild of the
    # surviving docs (ids/tfs/lens byte-identical; norm_max differs
    # only by the conservative rescale)
    key = lambda r: (r["term"], r["block_id"], r["is_label"])  # noqa: E731
    got_rows = {
        key(r): (bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["token_lens"]))
        for r in got_bi.blocks.collect()
    }
    want_rows = {
        key(r): (bytes(r["doc_ids"]), bytes(r["tfs"]), bytes(r["token_lens"]))
        for r in want_bi.blocks.collect()
    }
    assert got_rows == want_rows
    # WAND stays exact under the rescaled norm_max bounds
    wand = BlockSearchEngine(got_bi)
    wand.WAND_MIN_POSTINGS = 0
    wand.WAND_MIN_RANGES = 0
    wand.WAND_FLAT = 2.0
    got = wand.search_and(["data", "query"], k=10).collect()
    want = eng.search_and(["data", "query"], k=10).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]


def test_delete_from_store_roundtrip(tmp_path, spark, locs_sf_index, locs_bindex):
    """Persisted delete: tombstones applied to a segmented store (fold
    first, delete once, atomic swap) must answer like the flat
    remove_docs rebuild; the staging dirs are gone afterwards."""
    import os

    from riot_spark.blocks import append_blocked_index, delete_from_store
    from riot_spark.engine import remove_docs

    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    path = str(tmp_path / "del_store")
    write_blocked_index(
        blocked_from_index(
            build_index(docs.where(F.col("doc_id") < 300), cfg),
            doc_block_bits=6,
        ),
        path, input_paths=[], config_repr="a",
    )
    append_blocked_index(
        blocked_from_index(
            build_index(docs.where(F.col("doc_id") >= 300), cfg),
            doc_block_bits=6,
        ),
        path, input_paths=[], config_repr="b",
    )
    dead = list(range(0, 400, 7))
    m = delete_from_store(spark, path, dead)
    assert not os.path.exists(f"{path}.deleting")
    assert not os.path.exists(f"{path}.predelete")
    bi = read_blocked_index(spark, path)
    assert bi.n_docs == m["n_docs"] == 500 - len(dead)
    flat = SearchEngine(remove_docs(locs_sf_index, dead))
    got = BlockSearchEngine(bi).search_and(["data", "query"], k=30).collect()
    want = flat.search(
        SearchRequest(tokens=["data", "query"], scorer="float32",
                      max_outputs=30)
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]


def test_append_empty_delta_and_partial_segment(tmp_path, spark, sf_index, bindex):
    """Review hardening: (a) a delta with docs but ZERO postings
    (everything stopworded) appends and reads back — its N/avgdl
    contribution counts, the fold doesn't crash on the empty part;
    (b) a crashed append's partial segment (no committed manifest) is
    skipped by readers and cleaned by the next append, which numbers
    past it without collision."""
    import json as _json
    import os

    from riot_spark.blocks import append_blocked_index
    from riot_spark.config import FREQUENCIES_INDEX

    docs = load_documents(spark, SF_SMOKE)
    path = str(tmp_path / "hard_store")
    write_blocked_index(bindex, path, input_paths=[], config_repr="base")

    # (a) all-stopword delta: postings empty, n_docs > 0
    every_word = {
        r["term"] for r in sf_index.term_stats.select("term").collect()
    }
    cfg_stop = EngineConfig(
        index_type=FREQUENCIES_INDEX, num_index_partitions=4,
        stopwords=frozenset(every_word),
    )
    empty_delta = blocked_from_index(
        build_index(
            docs.where(F.col("doc_id") < 10).withColumn(
                "doc_id", F.col("doc_id") + 1000
            ),
            cfg_stop,
        ),
        doc_block_bits=6,
    )
    assert empty_delta.blocks.count() == 0 and empty_delta.n_docs == 10
    m = append_blocked_index(empty_delta, path, input_paths=[],
                             config_repr="empty")
    assert not m["skipped"]
    folded = read_blocked_index(spark, path)
    assert folded.n_docs == 510  # the postings-free docs still count
    got = BlockSearchEngine(folded).search_and(["data", "query"], k=5)
    assert got.count() == 5

    # (b) a partial segment: dir exists, no committed manifest
    os.makedirs(f"{path}/segments/000001/blocks", exist_ok=True)
    with open(f"{path}/segments/000001/manifest.json", "w") as f:
        _json.dump({"status": "running"}, f)
    assert read_blocked_index(spark, path).n_docs == 510  # skipped
    delta = blocked_from_index(
        build_index(
            docs.where(F.col("doc_id") < 20).withColumn(
                "doc_id", F.col("doc_id") + 2000
            ),
            EngineConfig(index_type=FREQUENCIES_INDEX,
                         num_index_partitions=4),
        ),
        doc_block_bits=6,
    )
    m2 = append_blocked_index(delta, path, input_paths=[], config_repr="d2")
    assert m2["segment"] == "000001"  # partial removed, slot reused
    with open(f"{path}/segments/000001/manifest.json") as f:
        assert _json.load(f)["status"] == "done"
    assert read_blocked_index(spark, path).n_docs == 530


def test_single_query_onepass_matches_plain(sf_index, bindex):
    """search_and with the one-pass gate forced must return the exact
    top-k of the unpruned pass (same docs, same float32 scores), and
    labels/low-df shapes must keep their existing routes."""
    from riot_spark.blocks import jvm_pack_available

    if not jvm_pack_available(bindex.blocks.sparkSession):
        pytest.skip("riotspark.jar not on the session classpath")
    plain = BlockSearchEngine(bindex)
    plain.WAND_MIN_POSTINGS = 10**18  # decode-everything reference
    one = BlockSearchEngine(bindex)
    one.WAND_SINGLE_ONEPASS_MIN_POSTINGS = 0  # force (default gate 500k)
    for toks, k in ([["data", "query"], 10], [["data"], 25],
                    [["group"], 500]):  # k > matches: no-tau branch
        want = plain.search_and(toks, k=k).collect()
        got = one.search_and(toks, k=k).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
            (r["doc_id"], np.float32(r["score"])) for r in want
        ], (toks, k)
