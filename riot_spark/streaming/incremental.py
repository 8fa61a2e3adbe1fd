"""Incremental indexing via Structured Streaming.

riot's realtime path buffers adds/deletes in caches and splices them
into sorted posting arrays under a write lock (AddDocToCache /
RemoveDocToCache, core/indexer.go:116-366; docs/en/realtime_indexing.md).
The Spark-native analogue:

  doc stream --readStream--> foreachBatch:
      tokenize batch -> append flat postings segment (parquet)
      append tombstones for re-added doc_ids (riot's delete-then-insert
      docsState machine, core/indexer.go:135-158)
  compact(): merge segments, apply tombstones (left_anti), rebuild
      term-partitioned postings + stats — riot's cache flush (B2/B7).

Queries against the live index read base + segments minus tombstones,
so results converge per micro-batch without rewriting the base index.
Exactly-once: foreachBatch is idempotent per batchId (segment dir is
batch-keyed and overwritten on replay).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from riot_spark.build import Index, build_index_from_tokens
from riot_spark.config import DEFAULT_CONFIG, EngineConfig, LOCS_INDEX
from riot_spark.tokenizer import tokenize_freq, tokenize_locs


class StreamingIndexer:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        config: EngineConfig = DEFAULT_CONFIG,
    ):
        self.spark = spark
        self.path = path
        self.config = config

    # ------------------------------------------------------ write side

    def _tokenize(self, docs: DataFrame) -> DataFrame:
        if self.config.index_type == LOCS_INDEX:
            return tokenize_locs(
                docs, stopwords=self.config.stopwords,
                doc_len_mode=self.config.doc_len_mode,
            )
        return tokenize_freq(
            docs, stopwords=self.config.stopwords,
            doc_len_mode=self.config.doc_len_mode,
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        """foreachBatch body: idempotent per batch_id (overwrite)."""
        seg = f"{self.path}/segments/batch={batch_id}"
        # re-adds: tombstone the incoming doc_ids so a doc's newest
        # version wins (riot re-add = delete-then-insert,
        # core/indexer.go:195-199)
        docs = docs.cache()
        docs.select("doc_id").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(f"{self.path}/tombstones/batch={batch_id}")
        self._tokenize(docs).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("overwrite").parquet(seg)
        docs.unpersist()

    def start(self, doc_stream: DataFrame, trigger: dict | None = None):
        """Attach to a streaming documents DataFrame and run."""
        writer = doc_stream.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", f"{self.path}/_checkpoint"
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()

    # ------------------------------------------------------- read side

    def _segments(self) -> DataFrame | None:
        seg_dir = f"{self.path}/segments"
        if not os.path.isdir(seg_dir) or not os.listdir(seg_dir):
            return None
        return self.spark.read.option("basePath", seg_dir).parquet(
            f"{seg_dir}/batch=*"
        )

    def current_tokens(self, min_batch: int = -1) -> DataFrame | None:
        """Live flat tokens = newest segment row per doc (later batch
        tombstones shadow earlier segments).  ``min_batch`` restricts
        the view to micro-batches with ``batch_id > min_batch`` — the
        incremental-compaction window (newest-wins applies WITHIN the
        window; a window doc that also lives in an older batch is the
        caller's contract violation to detect)."""
        segs = self._segments()
        if segs is None:
            return None
        tomb = self.spark.read.option(
            "basePath", f"{self.path}/tombstones"
        ).parquet(f"{self.path}/tombstones/batch=*")
        if min_batch >= 0:
            segs = segs.where(F.col("batch_id") > min_batch)
            tomb = tomb.where(F.col("batch_id") > min_batch)
        # a doc is shadowed if a LATER batch re-added (tombstoned) it
        latest = tomb.groupBy("doc_id").agg(F.max("batch_id").alias("last_batch"))
        return (
            segs.join(latest, "doc_id")
            .where(F.col("batch_id") == F.col("last_batch"))
            .select("doc_id", "term", "tf", "positions", "token_len")
        )

    def build_live_index(self, cache: bool = False) -> Index | None:
        """Compact the current stream state into a queryable Index —
        riot's Flush barrier (engine.go:812-842) as a batch job."""
        toks = self.current_tokens()
        if toks is None:
            return None
        # current_tokens keeps only the newest segment row per doc and
        # the tokenizers emit one row per (term, doc) — unique postings
        return build_index_from_tokens(
            toks, self.config, cache=cache, unique_postings=True
        )

    def compact_to_blocks(
        self,
        doc_block_bits: int = 13,
        store_path: str | None = None,
    ):
        """Compact the stream state into the PACKED BLOCK layout — the
        index shape that exists at 100 TB (delta+PFOR blocks, WAND
        metadata), not just the flat correctness twin.

        With `store_path`, the blocked index persists through
        `write_blocked_index` with the current segment/tombstone files
        as the lineage fingerprint: re-compacting with no new
        micro-batches is a manifest-skip no-op, and a restarted driver
        resumes from the stored blocks instead of re-packing
        (strictly better than riot's full re-index from the KV store,
        store_worker.go:73-91).  Returns the BlockedIndex, or None if
        no segments exist yet."""
        from riot_spark.blocks import blocked_from_index, write_blocked_index

        idx = self.build_live_index()
        if idx is None:
            return None
        bi = blocked_from_index(idx, doc_block_bits=doc_block_bits)
        if store_path is not None:
            inputs = []
            for sub in ("segments", "tombstones"):
                d = f"{self.path}/{sub}"
                if os.path.isdir(d):
                    for root, _, files in os.walk(d):
                        inputs.extend(
                            os.path.join(root, f)
                            for f in files
                            if f.endswith(".parquet")
                        )
            write_blocked_index(
                bi,
                store_path,
                input_paths=inputs,
                config_repr=f"stream:{self.config!r}:{doc_block_bits}",
            )
        return bi

    def _batch_ids(self) -> list[int]:
        seg_dir = f"{self.path}/segments"
        if not os.path.isdir(seg_dir):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(seg_dir)
            if d.startswith("batch=")
        )

    def _window_files(self, min_batch: int) -> list[str]:
        out: list[str] = []
        for sub in ("segments", "tombstones"):
            root = f"{self.path}/{sub}"
            if not os.path.isdir(root):
                continue
            for d in os.listdir(root):
                if not d.startswith("batch="):
                    continue
                if int(d.split("=", 1)[1]) <= min_batch:
                    continue
                for r, _, files in os.walk(f"{root}/{d}"):
                    out.extend(
                        os.path.join(r, f)
                        for f in files
                        if f.endswith(".parquet")
                    )
        return out

    def compact_to_blocks_incremental(
        self,
        store_path: str,
        doc_block_bits: int = 13,
        max_fold_depth: int | None = 8,
    ):
        """Incremental LSM compaction — the streaming write path kept
        O(new data): only the micro-batches that arrived since the
        last compaction are tokenized and packed, and they land as ONE new
        segment of the block store (`blocks.append_blocked_index`);
        the store's existing bytes are never rewritten.  A window that
        re-adds a doc id already in the store violates the append-only
        contract (riot's delete-then-insert re-add,
        core/indexer.go:195-199) — detected by the append's own
        doc-id-range check, and the method falls back to ONE full
        rebuild (`compact_to_blocks` semantics: segments dir cleared,
        base rewritten), after which appends resume.

        ``max_fold_depth`` (default 8) caps read-side fold depth: a
        long-running stream appends one segment per compaction call,
        and every reader folds them all — when the segment count hits
        the cap the append auto-compacts (blocks.compact_segments,
        staged + atomic), so query cost stays bounded while append
        cost stays O(increment) between compactions.  None = manual.

        Returns (BlockedIndex read back from the store, mode) with
        mode ∈ 'initial' | 'appended' | 'compacted' | 'noop' |
        'rebuilt', or (None, None) when the stream has produced
        nothing yet."""
        import shutil

        from riot_spark.blocks import (
            AppendOnlyViolation,
            append_blocked_index,
            blocked_from_index,
            read_blocked_index,
            write_blocked_index,
        )

        batches = self._batch_ids()
        if not batches:
            return None, None
        state_path = f"{store_path}/stream_state.json"
        last = -1
        if os.path.exists(state_path):
            with open(state_path) as f:
                last = json.load(f)["last_batch"]
        new = [b for b in batches if b > last]
        if not new:
            return read_blocked_index(self.spark, store_path), "noop"

        def _full_rebuild():
            # staged + atomic, like compact_segments: a crash mid-
            # rebuild must never leave the live store with its
            # segments deleted but the base not yet rewritten
            idx = self.build_live_index()
            bi = blocked_from_index(idx, doc_block_bits=doc_block_bits)
            stage = f"{store_path}.rebuilding"
            shutil.rmtree(stage, ignore_errors=True)
            write_blocked_index(
                bi, stage,
                input_paths=self._window_files(-1),
                config_repr=f"stream:{self.config!r}:{doc_block_bits}",
            )
            if os.path.exists(store_path):
                from riot_spark.blocks import _swap_store

                _swap_store(store_path, stage, ".prerebuild")
            else:
                os.rename(stage, store_path)

        mode = None
        if last < 0 or not os.path.exists(f"{store_path}/manifest.json"):
            _full_rebuild()
            mode = "initial"
        else:
            toks = self.current_tokens(min_batch=last)
            delta_idx = build_index_from_tokens(
                toks, self.config, cache=False, unique_postings=True
            )
            delta_bi = blocked_from_index(
                delta_idx, doc_block_bits=doc_block_bits, cache=False
            )
            try:
                am = append_blocked_index(
                    delta_bi, store_path,
                    input_paths=self._window_files(last),
                    config_repr=f"stream:{self.config!r}:{doc_block_bits}",
                    max_fold_depth=max_fold_depth,
                )
                mode = "compacted" if am.get("compacted") else "appended"
            except AppendOnlyViolation:
                # a window doc id already lives in the store (re-add):
                # one full rebuild restores the append-only invariant.
                # ONLY this exception falls back — a mode/params
                # mismatch must raise, not silently replace the store
                _full_rebuild()
                mode = "rebuilt"
        with open(state_path, "w") as f:
            json.dump({"last_batch": max(batches)}, f)
        return read_blocked_index(self.spark, store_path), mode
