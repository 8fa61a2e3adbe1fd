"""Round-4 hardening (ADVICE r3): crash recovery for the staged store
swap, cached-RDD release on superseded indexes, and exact count
carriage through the batch score column."""

import os
import shutil

import numpy as np
from pyspark.sql import functions as F

from riot_spark.blocks import (
    BlockSearchEngine,
    append_blocked_index,
    blocked_from_index,
    compact_segments,
    merge_blocked_many,
    read_blocked_index,
    recover_store,
    write_blocked_index,
)
from riot_spark.config import LOCS_INDEX, EngineConfig
from riot_spark.engine import build_index
from riot_spark.entrypoints import load_documents
from riot_spark.query import SearchRequest

SF_SMOKE = "/root/testdata/sf0.001"


def _mk_store(spark, path, lo=0, hi=200, segments=()):
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    mk = lambda a, b: blocked_from_index(  # noqa: E731
        build_index(
            docs.where((F.col("doc_id") >= a) & (F.col("doc_id") < b)), cfg
        ),
        doc_block_bits=6,
    )
    write_blocked_index(mk(lo, hi), path, input_paths=[], config_repr="base")
    for a, b in segments:
        append_blocked_index(
            mk(a, b), path, input_paths=[], config_repr=f"seg{a}"
        )


def test_recover_store_rolls_back_half_swap(tmp_path, spark):
    """A crash between _swap_store's two renames leaves `path` missing
    and the original at `<path>.precompact`; the next open must roll
    it back and answer exactly as before the crash."""
    path = str(tmp_path / "store")
    _mk_store(spark, path, segments=[(200, 330)])
    before = (
        BlockSearchEngine(read_blocked_index(spark, path))
        .search_and(["data", "query"], k=10)
        .collect()
    )
    # simulate the crash window: path renamed away, stage never moved
    os.rename(path, path + ".precompact")
    assert recover_store(path)
    got = (
        BlockSearchEngine(read_blocked_index(spark, path))
        .search_and(["data", "query"], k=10)
        .collect()
    )
    assert [(r["doc_id"], np.float32(r["score"])) for r in got] == [
        (r["doc_id"], np.float32(r["score"])) for r in before
    ]


def test_recover_store_removes_stale_post_swap_dir(tmp_path, spark):
    """A crash AFTER the swap completed (old dir not yet rmtree'd)
    leaves a stale `.predelete` twin next to a live store; open removes
    it instead of resurrecting stale data."""
    path = str(tmp_path / "store")
    _mk_store(spark, path)
    shutil.copytree(path, path + ".predelete")
    assert not recover_store(path)
    assert not os.path.exists(path + ".predelete")
    # read_blocked_index runs recovery implicitly too
    shutil.copytree(path, path + ".precompact")
    read_blocked_index(spark, path)
    assert not os.path.exists(path + ".precompact")


def test_recover_store_waits_for_inflight_swap(tmp_path):
    """A reader that opens during another process's swap window (path
    absent, live sentinel) must WAIT for the writer's second rename,
    not roll the in-flight swap back under it (r4 advice: the
    rollback made the writer's os.rename fail with the target
    restored)."""
    import threading

    path = str(tmp_path / "store")
    old, stage = path + ".precompact", path + ".compacting"
    os.makedirs(old)
    os.makedirs(stage)
    open(os.path.join(stage, "NEW"), "w").close()
    with open(path + ".swap_inflight", "w") as f:
        f.write(f"{os.getpid()} {stage}\n")  # live writer: this pid

    def finish_swap():
        # the writer's second rename + cleanup, mid-reader-wait
        os.rename(stage, path)
        os.remove(path + ".swap_inflight")
        shutil.rmtree(old)

    t = threading.Timer(0.4, finish_swap)
    t.start()
    try:
        assert not recover_store(path)  # waited; nothing rolled back
    finally:
        t.join()
    assert os.path.exists(os.path.join(path, "NEW"))  # new store won
    assert not os.path.exists(stage)
    assert not os.path.exists(path + ".swap_inflight")


def test_recover_store_cleans_crashed_swap_leftovers(tmp_path):
    """A DEAD writer's sentinel is a crash marker, not a wait signal:
    recovery rolls the original back immediately and removes both the
    orphaned stage dir and the sentinel."""
    path = str(tmp_path / "store")
    old, stage = path + ".precompact", path + ".compacting"
    os.makedirs(old)
    open(os.path.join(old, "ORIG"), "w").close()
    os.makedirs(stage)
    with open(path + ".swap_inflight", "w") as f:
        f.write(f"999999999 {stage}\n")  # no such pid
    import time

    t0 = time.monotonic()
    assert recover_store(path)
    assert time.monotonic() - t0 < 5  # no 30 s wait on a dead writer
    assert os.path.exists(os.path.join(path, "ORIG"))  # rolled back
    assert not os.path.exists(stage)  # orphan cleaned
    assert not os.path.exists(path + ".swap_inflight")


def test_compaction_swap_is_recoverable_end_to_end(tmp_path, spark):
    """compact_segments on a segmented store leaves no .pre*/.stage
    residue, and a fresh open of the compacted store still passes
    recovery (idempotent no-op)."""
    path = str(tmp_path / "store")
    _mk_store(spark, path, segments=[(200, 330), (330, 500)])
    m = compact_segments(spark, path)
    assert not m["skipped"]
    for suf in (".precompact", ".compacting"):
        assert not os.path.exists(path + suf)
    assert not recover_store(path)
    assert read_blocked_index(spark, path).n_docs == 500


def test_merge_release_unpersists_boundary_repack(tmp_path, spark):
    """merge_blocked_many pins its boundary-repack DataFrame (a query
    filter cannot push below applyInPandas, so it must be materialized
    once) — release() must drop that pin so a superseded index doesn't
    leak cached RDDs for the session's lifetime."""
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    mk = lambda a, b: blocked_from_index(  # noqa: E731
        build_index(
            docs.where((F.col("doc_id") >= a) & (F.col("doc_id") < b)), cfg
        ),
        doc_block_bits=4,  # small ranges => a shared boundary block
        cache=False,
    )
    merged = merge_blocked_many([mk(0, 130), mk(130, 260)], cache=False)
    assert merged._pinned, "boundary repack should be pinned"
    pinned = list(merged._pinned)
    assert all(df.storageLevel.useMemory for df in pinned)
    merged.release()
    assert all(not df.storageLevel.useMemory for df in pinned)
    merged.release()  # idempotent


def test_batch_count_rides_score_as_exact_double(spark):
    """CountDocsOnly in a float32 batch: the count row must be DOUBLE
    (float32 is exact only to 2^24 — silently wrong above ~16.7M docs
    at target scale) and the widened float32 score rows keep their
    exact values."""
    docs = load_documents(spark, SF_SMOKE)
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    idx = build_index(docs, cfg)
    bi = blocked_from_index(idx, doc_block_bits=6)
    eng = BlockSearchEngine(bi)
    reqs = {
        "c": SearchRequest(text="data query", count_docs_only=True),
        "r": SearchRequest(text="data query", max_outputs=5),
    }
    res = eng.search_batch(reqs, double_scores=False)
    assert dict(res.dtypes)["score"] == "double"
    rows = {r["query_id"]: r for r in res.collect() if r["rank"] <= 1}
    cnt = rows["c"]["score"]
    assert cnt == int(cnt) and cnt > 0
    # the widened ranked score is still the exact float32 value
    top = [r for r in res.collect() if r["query_id"] == "r" and r["rank"] == 1]
    assert np.float32(top[0]["score"]) == np.float64(top[0]["score"])

    # flat engine twin
    from riot_spark.query import SearchEngine

    flat = SearchEngine(idx).search_batch(reqs, double_scores=False)
    assert dict(flat.dtypes)["score"] == "double"
    fcnt = {r["query_id"]: r["score"] for r in flat.collect() if r["doc_id"] is None}
    assert fcnt["c"] == cnt
