"""Streaming incremental index: converges to the batch-built index."""

from __future__ import annotations

import numpy as np

from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.streaming.incremental import StreamingIndexer


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_incremental_converges_to_batch(spark, tmp_path):
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=4)
    sx = StreamingIndexer(spark, str(tmp_path / "stream_idx"), cfg)

    batch1 = [(1, "hello world data"), (2, "data query engine"),
              (3, "world query data")]
    batch2 = [(4, "spark data query"),
              (2, "data engine rewritten")]  # re-add of doc 2

    sx.process_batch(_docs(spark, batch1), 0)
    sx.process_batch(_docs(spark, batch2), 1)

    live = sx.build_live_index()
    final_docs = [(1, "hello world data"), (3, "world query data"),
                  (4, "spark data query"), (2, "data engine rewritten")]
    batch_idx = build_index(_docs(spark, final_docs), cfg)

    req = SearchRequest(tokens=["data", "query"], scorer="float32")
    got = SearchEngine(live).search(req).collect()
    want = SearchEngine(batch_idx).search(req).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in want
    ]
    # doc 2's old content must be gone
    res = SearchEngine(live).search(SearchRequest(tokens=["rewritten"])).collect()
    assert [r["doc_id"] for r in res] == [2]
    assert SearchEngine(live).search(SearchRequest(tokens=["query", "engine"])).collect() == []


def test_compact_to_blocks_with_manifest(spark, tmp_path):
    """Streaming state must compact into the packed block layout and
    persist with lineage-manifest resume: same stream state twice =
    manifest skip; a new micro-batch invalidates the fingerprint."""
    import json

    from riot_spark.blocks import BlockSearchEngine, read_blocked_index
    from riot_spark.build import build_index
    from riot_spark.config import LOCS_INDEX

    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    sx = StreamingIndexer(spark, str(tmp_path / "stream_idx"), cfg)
    sx.process_batch(_docs(spark, [(1, "hello world data"),
                                   (2, "data query engine")]), 0)
    sx.process_batch(_docs(spark, [(3, "world query data")]), 1)

    store = str(tmp_path / "bstore")
    bi = sx.compact_to_blocks(doc_block_bits=8, store_path=store)
    got = BlockSearchEngine(bi).search_and(["data", "query"]).collect()

    batch_idx = build_index(
        _docs(spark, [(1, "hello world data"), (2, "data query engine"),
                      (3, "world query data")]), cfg)
    from riot_spark.blocks import blocked_from_index
    want = BlockSearchEngine(
        blocked_from_index(batch_idx, doc_block_bits=8)
    ).search_and(["data", "query"]).collect()
    assert sorted((r["doc_id"], np.float32(r["score"])) for r in got) == \
        sorted((r["doc_id"], np.float32(r["score"])) for r in want)

    # the persisted store serves the same results
    bi2 = read_blocked_index(spark, store)
    got2 = BlockSearchEngine(bi2).search_and(["data", "query"]).collect()
    assert sorted((r["doc_id"], np.float32(r["score"])) for r in got2) == \
        sorted((r["doc_id"], np.float32(r["score"])) for r in got)

    # unchanged stream state -> manifest skip (fingerprint hit)
    fp1 = json.load(open(f"{store}/manifest.json"))["input_fingerprint"]
    sx.compact_to_blocks(doc_block_bits=8, store_path=store)
    assert json.load(open(f"{store}/manifest.json"))["input_fingerprint"] == fp1

    # a new micro-batch changes the fingerprint -> re-compact
    sx.process_batch(_docs(spark, [(4, "fresh data query")]), 2)
    sx.compact_to_blocks(doc_block_bits=8, store_path=store)
    assert json.load(open(f"{store}/manifest.json"))["input_fingerprint"] != fp1
    bi3 = read_blocked_index(spark, store)
    res = BlockSearchEngine(bi3).search_and(["data", "query"]).collect()
    assert 4 in {r["doc_id"] for r in res}


def test_stateful_first_seen_dedup(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: across micro-batches,
    one row per fingerprint carrying the doc of its first appearance."""
    from riot_spark.streaming.dedup import first_seen_stream

    src = tmp_path / "in"
    src.mkdir()
    rows1 = [(1, "fpA"), (2, "fpB"), (3, "fpA")]
    rows2 = [(4, "fpB"), (5, "fpC"), (6, "fpA")]
    spark.createDataFrame(rows1, "doc_id LONG, fingerprint STRING").write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame(rows2, "doc_id LONG, fingerprint STRING").write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema("doc_id LONG, fingerprint STRING")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("first_seen_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["fingerprint"]: r["doc_id"]
        for r in spark.sql("SELECT * FROM first_seen_t").collect()
    }
    # min doc_id per fingerprint (batches split by ascending id range,
    # so the first-seen batch contains the global min)
    assert got == {"fpA": 1, "fpB": 2, "fpC": 5}


def test_streaming_file_source_end_to_end(spark, tmp_path):
    """Drive through an actual readStream (file source, availableNow)."""
    src = tmp_path / "incoming"
    src.mkdir()
    _docs(spark, [(10, "alpha beta"), (11, "beta gamma")]).write.mode(
        "overwrite"
    ).parquet(str(src / "p1"))

    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=2)
    sx = StreamingIndexer(spark, str(tmp_path / "sidx"), cfg)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = sx.start(stream, trigger={"availableNow": True})
    q.awaitTermination(120)

    live = sx.build_live_index()
    res = SearchEngine(live).search(SearchRequest(tokens=["beta"])).collect()
    assert sorted(r["doc_id"] for r in res) == [10, 11]


def test_incremental_lsm_compaction(spark, tmp_path):
    """compact_to_blocks_incremental keeps the streaming write path
    O(new data): batch 0 seeds the store, an append-only batch lands
    as an LSM segment WITHOUT rewriting the base, a no-change call is
    a noop, and a RE-ADD batch (doc id already stored) triggers the
    one full rebuild that restores the append-only invariant — each
    state answering exactly like a batch build of the live docs."""
    import os

    from riot_spark.blocks import BlockSearchEngine
    from riot_spark.config import LOCS_INDEX

    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    sx = StreamingIndexer(spark, str(tmp_path / "stream_idx"), cfg)
    store = str(tmp_path / "lsm")

    def check(live_docs):
        bi, mode = ret[0], ret[1]
        got = BlockSearchEngine(bi).search_and(["data"], k=0).collect()
        want = SearchEngine(build_index(_docs(spark, live_docs), cfg)).search(
            SearchRequest(tokens=["data"], scorer="float32")
        ).collect()
        assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
            (r["doc_id"], np.float32(r["score"])) for r in want
        ], mode
        return mode

    sx.process_batch(_docs(spark, [(1, "hello world data"),
                                   (2, "data query engine")]), 0)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6)
    assert check([(1, "hello world data"), (2, "data query engine")]) == "initial"
    base_files = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(f"{store}/blocks") for f in fs
    }

    # append-only batch => segment, base untouched
    sx.process_batch(_docs(spark, [(3, "world data spark")]), 1)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6)
    assert check([(1, "hello world data"), (2, "data query engine"),
                  (3, "world data spark")]) == "appended"
    assert os.path.isdir(f"{store}/segments/000000")
    after = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(f"{store}/blocks") for f in fs
    }
    assert after == base_files

    # nothing new => noop
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6)
    assert ret[1] == "noop"

    # re-add of doc 2 => full rebuild (segments cleared)
    sx.process_batch(_docs(spark, [(2, "data rebuilt engine")]), 2)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6)
    assert check([(1, "hello world data"), (3, "world data spark"),
                  (2, "data rebuilt engine")]) == "rebuilt"
    assert not os.path.isdir(f"{store}/segments") or not os.listdir(
        f"{store}/segments"
    )


def test_incremental_compaction_mode_mismatch_raises(spark, tmp_path):
    """Review hardening: only the append-only violation falls back to
    a full rebuild — an index-mode mismatch must raise, never silently
    replace the store with this stream's docs."""
    import pytest

    from riot_spark.blocks import blocked_from_index, write_blocked_index
    from riot_spark.config import LOCS_INDEX

    store = str(tmp_path / "locs_store")
    cfg_locs = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    write_blocked_index(
        blocked_from_index(
            build_index(_docs(spark, [(1, "hello world data")]), cfg_locs),
            doc_block_bits=6,
        ),
        store, input_paths=[], config_repr="locs-base",
    )
    cfg_freq = EngineConfig(index_type=FREQUENCIES_INDEX,
                            num_index_partitions=4)
    sx = StreamingIndexer(spark, str(tmp_path / "freq_stream"), cfg_freq)
    sx.process_batch(_docs(spark, [(100, "data query engine")]), 0)
    sx.process_batch(_docs(spark, [(101, "spark data table")]), 1)
    # seed the sidecar past batch 0 so the APPEND path is taken for
    # batch 1 (last_batch < 0 would route to the initial full build)
    import json as _json

    with open(f"{store}/stream_state.json", "w") as f:
        _json.dump({"last_batch": 0}, f)
    with pytest.raises(ValueError, match="index mode"):
        sx.compact_to_blocks_incremental(store, doc_block_bits=6)


def test_auto_compaction_fires_at_fold_depth(spark, tmp_path):
    """max_fold_depth=2: the append that makes the SECOND live segment
    auto-compacts the store (segments folded into the base, staged +
    atomic), queries answer identically before/after, and the next
    append starts a fresh segment 000000."""
    import os

    from riot_spark.blocks import BlockSearchEngine
    from riot_spark.config import LOCS_INDEX

    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=4)
    sx = StreamingIndexer(spark, str(tmp_path / "stream_idx"), cfg)
    store = str(tmp_path / "lsm_auto")

    sx.process_batch(_docs(spark, [(1, "hello world data"),
                                   (2, "data query engine")]), 0)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6,
                                           max_fold_depth=2)
    assert ret[1] == "initial"

    sx.process_batch(_docs(spark, [(3, "world data spark")]), 1)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6,
                                           max_fold_depth=2)
    assert ret[1] == "appended"
    assert os.path.isdir(f"{store}/segments/000000")
    before = BlockSearchEngine(ret[0]).search_and(["data"], k=0).collect()

    # the 2nd segment hits the fold-depth cap => inline compaction
    sx.process_batch(_docs(spark, [(4, "data depth trigger")]), 2)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6,
                                           max_fold_depth=2)
    assert ret[1] == "compacted"
    assert not os.path.isdir(f"{store}/segments") or not os.listdir(
        f"{store}/segments"
    )
    got = BlockSearchEngine(ret[0]).search_and(["data"], k=0).collect()
    got3 = [(r["doc_id"], np.float32(r["score"])) for r in got
            if r["doc_id"] != 4]
    want = build_index(
        _docs(spark, [(1, "hello world data"), (2, "data query engine"),
                      (3, "world data spark"), (4, "data depth trigger")]),
        cfg,
    )
    wres = SearchEngine(want).search(
        SearchRequest(tokens=["data"], scorer="float32")
    ).collect()
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in wres
    ], got3

    # appends resume on the compacted base at segment 000000
    sx.process_batch(_docs(spark, [(5, "data resumes appending")]), 3)
    ret = sx.compact_to_blocks_incremental(store, doc_block_bits=6,
                                           max_fold_depth=4)
    assert ret[1] == "appended"
    assert os.path.isdir(f"{store}/segments/000000")
    assert len(before) == 3  # sanity: pre-compaction snapshot used
