"""Packed posting blocks + block-pruned query kernel (SURVEY.md M3/M4).

Layout: postings are packed per (term, doc-range block):

    block_id = doc_id >> doc_block_bits

so blocks of DIFFERENT terms with the same block_id cover the same
doc-id range.  That alignment is the distribution trick: a query
groups its terms' blocks by block_id and every group is an
independent intersection problem — the AND kernel runs embarrassingly
parallel across doc ranges, and a group missing any query term is
pruned before decoding a single byte (the batch analogue of WAND's
pointer-skipping; riot instead binary-searches posting arrays,
core/indexer.go:690-721).

Each block stores doc_ids (delta+varint), tfs and token_lens (varint),
`positions` (LocsIndex mode: per-doc byte offsets, delta + patched-FOR
packed, offsets implied by tfs — mirroring riot's locations-beside-
frequencies parallel arrays, core/indexer.go:71-73), and `norm_max` —
the exact per-block maximum of the BM25 tf/length normalization term,
so the query-time upper bound is idf * norm_max (block-max WAND
metadata).  Label postings (searchable keywords with no positions,
segment.go:264-279) pack as separate `is_label` rows with tf=0, so the
block path serves the FULL query surface: AND+BM25, labels, logic
must/should/notIn, token proximity + snippet locations.

At 100 TB: blocks shrink the index ~4-8x vs flat rows, shuffle volume
for a query is the packed bytes of its terms only, and hot terms
split across doc-range blocks naturally (no single-reducer skew).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from riot_spark.build import Index
from riot_spark.codec import (
    delta_decode,
    delta_encode,
    pack_floats_as_ints,
    pack_position_lists,
    pack_position_lists_flat,
    unpack_ints_as_floats,
    unpack_position_lists,
    varint_decode,
    varint_encode,
)
from riot_spark.config import LOCS_INDEX, BM25Params

class AppendOnlyViolation(ValueError):
    """A delta's doc-id range overlaps data already in the store —
    the append-only contract of the LSM layer.  Deliberately its own
    type: callers with a fallback (streaming re-add -> full rebuild)
    must not swallow OTHER ValueErrors (mode/params mismatches) as if
    they were re-adds."""


BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("is_label", T.BooleanType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("token_lens", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), True),
        T.StructField("norm_max", T.FloatType(), False),
    ]
)


def _norm_term(tf: np.ndarray, dl: np.ndarray, k1: float, b: float, avgdl: float):
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def build_blocks(index: Index, doc_block_bits: int = 13) -> DataFrame:
    """Pack the (already (term, salt)-partitioned, (term, doc_id)-
    sorted) flat postings into blocks.  Pure mapInPandas — zero
    shuffles: salting is doc-range-aligned (salt_block_bits >=
    doc_block_bits), so a (term, block) group never straddles
    partitions, and the packer re-groups rows across Arrow batch
    boundaries.

    Doc ids must be DENSE (the pages_to_documents contract): block_id
    = doc_id >> doc_block_bits partitions the corpus into doc RANGES.
    Feeding sparse/hashed 64-bit ids degenerates every block to a
    single doc (2^50 ranges) — same reason riot keeps docIds sorted
    and contiguous inside posting arrays (core/indexer.go:68-74)."""
    if getattr(index.config, "build_salts", 1) > 1:
        assert doc_block_bits <= index.config.salt_block_bits, (
            "block granularity must be at least as coarse-grained as the "
            "build salt ranges or a block would straddle partitions"
        )
    k1, b = index.config.bm25.k1, index.config.bm25.b
    avgdl = index.avgdl
    locs = index.config.index_type == LOCS_INDEX
    cols = ["doc_id", "term", "tf", "token_len", "is_label"]
    if locs:
        cols.append("positions")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []

        def flush(pdf: pd.DataFrame, final: bool) -> pd.DataFrame | None:
            nonlocal buf
            if pdf is not None:
                buf.append(pdf)
            if not buf:
                return None
            all_df = (
                pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            ).assign(
                block_id=lambda d: d["doc_id"].to_numpy(np.int64) >> doc_block_bits
            )
            if not final:
                # hold back the stream-tail (term, block) — it may
                # continue in the next Arrow batch (rows arrive
                # (term, doc_id)-sorted, label/content interleaved)
                tail_term = all_df["term"].iloc[-1]
                tail_block = int(all_df["block_id"].iloc[-1])
                tail_mask = (all_df["term"] == tail_term) & (
                    all_df["block_id"] == tail_block
                )
                buf = [all_df[tail_mask]]
                all_df = all_df[~tail_mask]
            else:
                buf = []
            if all_df.empty:
                return None
            # numpy segment sweep — one lexsort + reduceat instead of a
            # pandas group iterator: per-group pandas column access was
            # ~80% of pack wall (profiled), the codec only ~20%
            term_codes, term_uniq = pd.factorize(all_df["term"], sort=False)
            bl = all_df["block_id"].to_numpy(np.int64)
            lb = all_df["is_label"].to_numpy(bool)
            dc = all_df["doc_id"].to_numpy(np.int64)
            tf = all_df["tf"].to_numpy(np.float32)
            dl = all_df["token_len"].to_numpy(np.float32)
            pos = all_df["positions"].to_numpy() if locs else None
            order = np.lexsort((dc, lb.astype(np.int8), bl, term_codes))
            tc_s, bl_s, lb_s = term_codes[order], bl[order], lb[order]
            dc_s, tf_s, dl_s = dc[order], tf[order], dl[order]
            pos_s = pos[order] if locs else None
            change = (
                np.flatnonzero(
                    (np.diff(tc_s) != 0)
                    | (np.diff(bl_s) != 0)
                    | (np.diff(lb_s.astype(np.int8)) != 0)
                )
                + 1
            )
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(tc_s)]))
            if avgdl:
                norm_all = _norm_term(tf_s, dl_s, k1, b, avgdl)
                norm_max = np.maximum.reduceat(norm_all, starts)
            else:
                norm_max = np.zeros(len(starts))
            terms_arr = term_uniq.to_numpy() if hasattr(term_uniq, "to_numpy") else np.asarray(term_uniq)
            out = {
                "term": terms_arr[tc_s[starts]],
                "block_id": bl_s[starts],
                "is_label": lb_s[starts],
                "n": (ends - starts).astype(np.int32),
                "first_doc_id": dc_s[starts],
                "last_doc_id": dc_s[ends - 1],
                "doc_ids": [
                    delta_encode(dc_s[s0:e0]) for s0, e0 in zip(starts, ends)
                ],
                "tfs": [
                    pack_floats_as_ints(tf_s[s0:e0])
                    for s0, e0 in zip(starts, ends)
                ],
                "token_lens": [
                    pack_floats_as_ints(dl_s[s0:e0])
                    for s0, e0 in zip(starts, ends)
                ],
                "positions": (
                    [
                        None
                        if lb_s[s0]
                        else pack_position_lists(
                            [p if p is not None else [] for p in pos_s[s0:e0]]
                        )
                        for s0, e0 in zip(starts, ends)
                    ]
                    if locs
                    else [None] * len(starts)
                ),
                "norm_max": norm_max.astype(np.float32),
            }
            return pd.DataFrame(out)

        for pdf in batches:
            out = flush(pdf[cols], final=False)
            if out is not None:
                yield out
        out = flush(None, final=True)
        if out is not None:
            yield out

    return index.postings.mapInPandas(pack, schema=BLOCKS_SCHEMA)


def build_blocks_arrow(index: Index, doc_block_bits: int = 13) -> DataFrame:
    """Arrow-native twin of :func:`build_blocks` (byte-identical
    output, differential-tested).

    SCALING.md limit 2 proved the pandas packer is bound by the
    JVM→Python transfer — and profiling shows that cost is per-row
    OBJECT BOXING, not bytes: pandas materializes every `positions`
    list as a Python list of ints and every term as a str.  mapInArrow
    hands us the raw Arrow buffers instead: doc_ids/tfs/offsets come
    out as zero-copy numpy views, positions stay one flat int buffer
    gathered with a single vectorized ragged index, and terms
    dictionary-encode JVM-side (one Python string per DISTINCT term
    per batch, not per row)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if getattr(index.config, "build_salts", 1) > 1:
        assert doc_block_bits <= index.config.salt_block_bits, (
            "block granularity must be at least as coarse-grained as the "
            "build salt ranges or a block would straddle partitions"
        )
    k1, b = index.config.bm25.k1, index.config.bm25.b
    avgdl = index.avgdl
    locs = index.config.index_type == LOCS_INDEX
    cols = ["doc_id", "term", "tf", "token_len", "is_label"]
    if locs:
        cols.append("positions")
    out_type = pa.schema(
        [
            pa.field("term", pa.string()),
            pa.field("block_id", pa.int64()),
            pa.field("is_label", pa.bool_()),
            pa.field("n", pa.int32()),
            pa.field("first_doc_id", pa.int64()),
            pa.field("last_doc_id", pa.int64()),
            pa.field("doc_ids", pa.binary()),
            pa.field("tfs", pa.binary()),
            pa.field("token_lens", pa.binary()),
            pa.field("positions", pa.binary()),
            pa.field("norm_max", pa.float32()),
        ]
    )

    def pack(batches):
        held: pa.Table | None = None

        def flush(tbl: pa.Table | None, final: bool):
            nonlocal held
            if tbl is not None and held is not None:
                tbl = pa.concat_tables([held, tbl])
                held = None
            elif tbl is None:
                tbl, held = held, None
            if tbl is None or tbl.num_rows == 0:
                return None
            tbl = tbl.combine_chunks()
            dc = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            bl = dc >> doc_block_bits
            if not final:
                # hold back the stream-tail (term, block) — it may
                # continue in the next Arrow batch
                tail_term = tbl.column("term")[-1].as_py()
                term_eq = pc.equal(
                    tbl.column("term"), pa.scalar(tail_term)
                ).to_numpy(zero_copy_only=False)
                mask = term_eq & (bl == bl[-1])
                hold_idx = np.flatnonzero(mask)
                keep_idx = np.flatnonzero(~mask)
                held = tbl.take(pa.array(hold_idx)) if hold_idx.size else None
                if keep_idx.size == 0:
                    return None
                tbl = tbl.take(pa.array(keep_idx)).combine_chunks()
                dc, bl = dc[keep_idx], bl[keep_idx]
            denc = pc.dictionary_encode(tbl.column("term")).combine_chunks()
            dch = denc.chunk(0) if isinstance(denc, pa.ChunkedArray) else denc
            term_codes = dch.indices.to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False
            )
            term_uniq = np.asarray(dch.dictionary.to_pylist(), dtype=object)
            lb = tbl.column("is_label").to_numpy(zero_copy_only=False)
            tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(
                np.float32, copy=False
            )
            dl = tbl.column("token_len").to_numpy(
                zero_copy_only=False
            ).astype(np.float32, copy=False)
            order = np.lexsort((dc, lb.astype(np.int8), bl, term_codes))
            tc_s, bl_s, lb_s = term_codes[order], bl[order], lb[order]
            dc_s, tf_s, dl_s = dc[order], tf[order], dl[order]
            if locs:
                pcol = tbl.column("positions").combine_chunks()
                la = pcol.chunk(0) if isinstance(pcol, pa.ChunkedArray) else pcol
                offs = la.offsets.to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
                vals = la.values.to_numpy(zero_copy_only=False).astype(
                    np.int64, copy=False
                )
                valid = ~la.is_null().to_numpy(zero_copy_only=False)
                counts = np.where(valid, np.diff(offs), 0)
                row_start = offs[:-1]
                rs, rc = row_start[order], counts[order]
                tot = int(rc.sum())
                if tot:
                    cum = np.cumsum(rc) - rc
                    gidx = np.repeat(rs - cum, rc) + np.arange(tot)
                    flat_sorted = vals[gidx]
                else:
                    flat_sorted = np.empty(0, np.int64)
                pstart = np.concatenate(([0], np.cumsum(rc)))
            change = (
                np.flatnonzero(
                    (np.diff(tc_s) != 0)
                    | (np.diff(bl_s) != 0)
                    | (np.diff(lb_s.astype(np.int8)) != 0)
                )
                + 1
            )
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(tc_s)]))
            if avgdl:
                norm_all = _norm_term(tf_s, dl_s, k1, b, avgdl)
                norm_max = np.maximum.reduceat(norm_all, starts)
            else:
                norm_max = np.zeros(len(starts))
            pos_col = (
                [
                    None
                    if lb_s[s0]
                    else pack_position_lists_flat(
                        flat_sorted[pstart[s0] : pstart[e0]], rc[s0:e0]
                    )
                    for s0, e0 in zip(starts, ends)
                ]
                if locs
                else [None] * len(starts)
            )
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(term_uniq[tc_s[starts]].tolist(), pa.string()),
                    pa.array(bl_s[starts]),
                    pa.array(lb_s[starts]),
                    pa.array((ends - starts).astype(np.int32)),
                    pa.array(dc_s[starts]),
                    pa.array(dc_s[ends - 1]),
                    pa.array(
                        [delta_encode(dc_s[s0:e0]) for s0, e0 in zip(starts, ends)],
                        pa.binary(),
                    ),
                    pa.array(
                        [
                            pack_floats_as_ints(tf_s[s0:e0])
                            for s0, e0 in zip(starts, ends)
                        ],
                        pa.binary(),
                    ),
                    pa.array(
                        [
                            pack_floats_as_ints(dl_s[s0:e0])
                            for s0, e0 in zip(starts, ends)
                        ],
                        pa.binary(),
                    ),
                    pa.array(pos_col, pa.binary()),
                    pa.array(norm_max.astype(np.float32)),
                ],
                schema=out_type,
            )

        for batch in batches:
            out = flush(pa.Table.from_batches([batch]).select(cols), final=False)
            if out is not None:
                yield out
        out = flush(None, final=True)
        if out is not None:
            yield out

    return index.postings.select(cols).mapInArrow(pack, schema=BLOCKS_SCHEMA)


def jvm_pack_available(spark: SparkSession) -> bool:
    """True when the compiled JVM packer (riotspark.jar) is on this
    session's driver classpath.  False for sessions created outside
    riot_spark.session.get_spark (e.g. the correctness harness) —
    those fall back to the Arrow packer transparently."""
    try:
        spark._jvm.java.lang.Class.forName("riotspark.BlockPack")
        return True
    except Exception:
        return False


def build_blocks_jvm(index: Index, doc_block_bits: int = 13) -> DataFrame:
    """JVM-native twin of :func:`build_blocks_arrow` (byte-identical
    output, differential-tested in tests/test_jvm_packer.py).

    The Arrow packer's floor is the JVM->Python->JVM transfer itself
    (~9s of a 10.8s pack at 30M postings — BENCH.md); this one runs
    the identical pack as a Scala mapPartitions inside the executor
    JVM (riot_spark/jvm/BlockPack.scala), so the only cost left is the
    codec.  Same contract as the Python packers: input arrives
    (term, salt)-partitioned and (term, doc_id)-sorted from the build,
    so (term, block) groups are contiguous within a partition."""
    if getattr(index.config, "build_salts", 1) > 1:
        assert doc_block_bits <= index.config.salt_block_bits, (
            "block granularity must be at least as coarse-grained as the "
            "build salt ranges or a block would straddle partitions"
        )
    spark = index.postings.sparkSession
    locs = index.config.index_type == LOCS_INDEX
    cols = [
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("term"),
        F.col("tf").cast("float").alias("tf"),
        F.col("token_len").cast("float").alias("token_len"),
        F.col("is_label").cast("boolean").alias("is_label"),
    ]
    if locs:
        cols.append(F.col("positions").cast("array<int>").alias("positions"))
    jdf = spark._jvm.riotspark.BlockPack.pack(
        index.postings.select(cols)._jdf,
        doc_block_bits,
        float(index.config.bm25.k1),
        float(index.config.bm25.b),
        float(index.avgdl or 0.0),
        locs,
    )
    return DataFrame(jdf, spark)


@dataclass
class BlockedIndex:
    blocks: DataFrame
    term_stats: DataFrame
    n_docs: int
    avgdl: float
    params: BM25Params
    has_positions: bool = False
    # doc-range width exponent (block_id = doc_id >> doc_block_bits);
    # None on stores written before the stat existed — block_bits()
    # infers it from one block row
    doc_block_bits: int | None = None
    _term_df_cache: dict | None = None
    # DataFrames THIS index pinned in executor memory (its own cached
    # blocks, the boundary-repack persist from merge_blocked_many) —
    # released via release() when the index is superseded, so a
    # session folding many segmented stores doesn't leak cached RDDs
    _pinned: list | None = None

    def release(self) -> None:
        """Unpersist everything this index pinned.  Call when the
        index is superseded (compaction swap, store re-open); safe to
        call more than once.  Only DataFrames created BY this index
        are released — a merge's input segments keep their own pins."""
        for df in self._pinned or []:
            try:
                df.unpersist()
            except Exception:
                pass
        self._pinned = []

    def block_bits(self) -> int | None:
        """doc_block_bits, inferring it from one block row on stores
        written before the stat was persisted: for block_id B >= 1
        holding first_doc_id F, the b with F >> b == B is unique.
        None on a single-block corpus (block prune impossible AND
        pointless there)."""
        if self.doc_block_bits is not None:
            return self.doc_block_bits
        rows = (
            self.blocks.where(F.col("block_id") > 0)
            .select("block_id", "first_doc_id")
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        blk, first = int(rows[0]["block_id"]), int(rows[0]["first_doc_id"])
        for b in range(1, 48):
            if first >> b == blk:
                self.doc_block_bits = b
                return b
        return None

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        if self._term_df_cache is not None:
            return {t: self._term_df_cache[t] for t in terms if t in self._term_df_cache}
        rows = self.term_stats.where(F.col("term").isin(terms)).collect()
        return {r["term"]: r["df"] for r in rows}


def blocked_from_index(
    index: Index,
    doc_block_bits: int = 13,
    cache: bool = True,
    packer: str = "auto",
) -> BlockedIndex:
    """packer='auto' (default) picks the JVM mapPartitions packer when
    riotspark.jar is on the session classpath, else the boxing-free
    mapInArrow one; 'jvm'/'arrow'/'pandas' force a specific packer
    (byte-identical outputs, differential-tested)."""
    if packer == "auto":
        packer = (
            "jvm"
            if jvm_pack_available(index.postings.sparkSession)
            else "arrow"
        )
    build = {
        "jvm": build_blocks_jvm,
        "arrow": build_blocks_arrow,
        "pandas": build_blocks,
    }[packer]
    blocks = build(index, doc_block_bits)
    pinned: list = []
    if cache:
        blocks = blocks.cache()
        pinned.append(blocks)
    bi = BlockedIndex(
        blocks=blocks,
        term_stats=index.term_stats,
        n_docs=index.n_docs,
        avgdl=index.avgdl,
        params=index.config.bm25,
        has_positions=index.config.index_type == LOCS_INDEX,
        doc_block_bits=doc_block_bits,
        _term_df_cache=index._term_df_cache,
        _pinned=pinned,
    )
    return bi


def merge_blocked_indexes(
    base: BlockedIndex, delta: BlockedIndex, cache: bool = True
) -> BlockedIndex:
    """Append a DELTA block store to a BASE store — see
    :func:`merge_blocked_many` (this is the two-store case)."""
    return merge_blocked_many([base, delta], cache=cache)


def merge_blocked_many(
    parts: list[BlockedIndex], cache: bool = True
) -> BlockedIndex:
    """LSM-style incremental maintenance: fold an ordered list of
    block stores (each packing a LATER dense doc-id range — the
    append-only id assignment of a growing corpus) into one queryable
    index WITHOUT repacking any segment's bytes.  riot's incremental
    AddDocs (core/indexer.go:116-366) re-expressed at the block level:
    index-update cost is O(new data), never O(corpus).

    Contract (asserted): segment doc-id ranges are strictly
    increasing.  Doc-range blocks of different segments are then
    disjoint except for boundary ranges (a segment's tail block shared
    with the next segment's head), found with ONE metadata aggregation
    and repacked in one tiny keyed kernel (rows per boundary range ≤
    2·|terms in it|); every other block row passes through as a
    column-level union.

    Statistics: N adds, avgdl re-weights, per-term df sums.  Each
    segment's stored `norm_max` WAND metadata was computed against its
    own avgdl; under the merged avgdl a norm can only grow by the
    factor avgdl_merged/avgdl_segment (BM25's dl normalization is
    monotone in dl/avgdl), so each segment's norm_max scales by
    max(1, that factor) — bounds stay provable upper bounds (slightly
    looser, never wrong) and WAND on the merged store remains exact
    (differential-tested)."""
    parts = [p for p in parts if p.n_docs > 0]
    if not parts:
        raise ValueError("nothing to merge")
    if len(parts) == 1:
        return parts[0]
    first = parts[0]
    for p in parts[1:]:
        if p.has_positions != first.has_positions:
            raise ValueError(
                "cannot merge LocsIndex and FrequenciesIndex stores"
            )
        if p.params != first.params:
            raise ValueError("BM25 parameters differ between the stores")
    # a part can carry stats but ZERO block rows (every doc
    # stopworded/empty): it still contributes N/avgdl, but has no
    # range to check or rows to union
    ranges = []
    for p in parts:
        r = p.blocks.agg(
            F.min("first_doc_id").alias("lo"), F.max("last_doc_id").alias("hi")
        ).first()
        ranges.append(
            None if r["lo"] is None else (int(r["lo"]), int(r["hi"]))
        )
    present = [rg for rg in ranges if rg is not None]
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(present, present[1:]):
        if lo_b <= hi_a:
            raise AppendOnlyViolation(
                f"segment doc-id ranges must be strictly increasing "
                f"({lo_b} <= {hi_a}) — merge is append-only"
            )
    n_docs = sum(p.n_docs for p in parts)
    avgdl = sum(p.avgdl * p.n_docs for p in parts) / n_docs
    pinned: list = []
    tagged = []
    for side, p in enumerate(parts):
        if ranges[side] is None:
            continue
        f = max(1.0, avgdl / p.avgdl) if p.avgdl else 1.0
        tagged.append(
            p.blocks.withColumn(
                "norm_max",
                (F.col("norm_max").cast("double") * F.lit(f)).cast("float"),
            ).withColumn("side", F.lit(side))
        )
    if not tagged:
        return BlockedIndex(
            blocks=parts[0].blocks,
            term_stats=parts[0].term_stats,
            n_docs=n_docs,
            avgdl=avgdl,
            params=first.params,
            has_positions=first.has_positions,
            doc_block_bits=first.doc_block_bits,
        )
    union = tagged[0]
    for t in tagged[1:]:
        union = union.unionByName(t)
    # boundary ranges: block ids touched by >1 segment — one metadata
    # agg over (block_id, side); at most len(parts)-1 ids by contract
    shared = [
        int(r["block_id"])
        for r in union.groupBy("block_id")
        .agg(F.countDistinct("side").alias("ns"))
        .where(F.col("ns") > 1)
        .select("block_id")
        .collect()
    ]
    if len(shared) >= len(tagged):
        raise AssertionError(
            f"append-only segments share {len(shared)} doc ranges; "
            f"expected < {len(tagged)} (tail/head boundaries only)"
        )
    if shared:
        plain = union.where(~F.col("block_id").isin(shared)).drop("side")
        bnd = union.where(F.col("block_id").isin(shared))
        # only keys written by MORE THAN ONE segment repack; a boundary
        # range's single-segment rows (the vocabulary tail) flow
        # through untouched and keep predicate pushdown
        keys = ["term", "block_id", "is_label"]
        multi = (
            bnd.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
            .drop("c")
        )
        bnd_single = bnd.join(F.broadcast(multi), keys, "left_anti").drop(
            "side"
        )
        bnd = bnd.join(F.broadcast(multi), keys, "left_semi")
        locs = first.has_positions

        def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("side")
            if len(pdf) == 1:
                return pdf.drop(columns=["side"])
            ids = np.concatenate(
                [delta_decode(bytes(r)) for r in pdf["doc_ids"]]
            )
            tfs = np.concatenate(
                [unpack_ints_as_floats(bytes(r)) for r in pdf["tfs"]]
            )
            lens = np.concatenate(
                [unpack_ints_as_floats(bytes(r)) for r in pdf["token_lens"]]
            )
            head = pdf.iloc[0]
            is_label = bool(head["is_label"])
            if locs and not is_label:
                lists = []
                off = 0
                for _, r in pdf.iterrows():
                    counts = tfs[off: off + int(r["n"])].astype(np.int64)
                    flat, offs = unpack_position_lists(
                        bytes(r["positions"]), counts
                    )
                    lists.extend(
                        flat[offs[i]: offs[i] + counts[i]]
                        for i in range(int(r["n"]))
                    )
                    off += int(r["n"])
                positions = pack_position_lists(lists)
            else:
                positions = head["positions"]  # None for freq/label rows
            return pd.DataFrame(
                {
                    "term": [head["term"]],
                    "block_id": np.array([head["block_id"]], np.int64),
                    "is_label": [is_label],
                    "n": np.array([len(ids)], np.int32),
                    "first_doc_id": np.array([ids[0]], np.int64),
                    "last_doc_id": np.array([ids[-1]], np.int64),
                    "doc_ids": [delta_encode(ids)],
                    "tfs": [pack_floats_as_ints(tfs)],
                    "token_lens": [pack_floats_as_ints(lens)],
                    "positions": [positions],
                    "norm_max": np.array(
                        [float(pdf["norm_max"].max())], np.float32
                    ),
                }
            )

        merged_bnd = bnd.groupBy("term", "block_id", "is_label").applyInPandas(
            lambda _key, pdf: merge_rows(pdf), BLOCKS_SCHEMA
        )
        # ALWAYS materialized (even under cache=False): a query filter
        # cannot push below the applyInPandas barrier, so an unpersisted
        # boundary kernel would repack the whole boundary vocabulary on
        # EVERY query (measured 10+s/query on a 1M store).  Bounded:
        # ≤ 2·|terms both segments share in a boundary range| rows,
        # decoded once for the life of the index.
        merged_bnd = merged_bnd.persist()
        merged_bnd.count()
        pinned.append(merged_bnd)
        blocks = plain.unionByName(bnd_single).unionByName(merged_bnd)
    else:
        blocks = union.drop("side")
    term_stats = parts[0].term_stats
    for p in parts[1:]:
        term_stats = term_stats.unionByName(p.term_stats)
    term_stats = term_stats.groupBy("term").agg(F.sum("df").alias("df"))
    if cache:
        blocks = blocks.cache()
        pinned.append(blocks)
    return BlockedIndex(
        blocks=blocks,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        params=first.params,
        has_positions=first.has_positions,
        doc_block_bits=first.doc_block_bits,
        _pinned=pinned,
    )


def block_batchable(req, has_positions: bool) -> bool:
    """Single source of truth for which request shapes the packed
    block executor can batch.  Both :meth:`BlockSearchEngine.
    search_batch`'s loud gate and ``SearchEngine``'s dispatcher
    (which routes non-batchable requests to the flat executor)
    derive from this predicate, so the two can never drift."""
    is_logic = bool(req.must or req.should or req.not_in)
    if not is_logic:
        if req.count_docs_only or req.orderless:
            return True
        if req.criteria == "bm25":
            return True
        if req.criteria == "proximity":
            return has_positions
        return False  # callable ScoringCriteria
    return (
        not req.count_docs_only
        and not req.orderless
        and not req.reverse_order
        and req.criteria == "bm25"
    )


class BlockSearchEngine:
    """Full query surface over packed blocks.

    Plan: scan blocks (term filter -> parquet row-group pruning on the
    sorted term column) -> shuffle packed bytes by block_id -> Arrow
    kernel per doc-range group (decode, k-way intersect via sorted
    merge, float32 BM25, proximity DP when positions are packed) ->
    global top-k.  Rank-identical to the flat float32 engine
    (differential-tested); labels and must/should/notIn logic run on
    the same packed layout."""

    def __init__(self, bindex: BlockedIndex):
        self.bi = bindex
        # DataFrames persisted by the batched WAND pass: they must
        # outlive search_batch (the returned DF references them
        # lazily), so each new batch releases the previous batch's
        self._scratch: list[DataFrame] = []

    # WAND's bound walk trades 2-3 extra sequential Spark jobs
    # (~0.3-0.6 s of scheduling latency) for skipped posting decodes.
    # The kernel decodes several million postings per second across
    # the executors, so below ~half a million candidate postings
    # (driver-side bound: Σ df over the query's keywords, known from
    # the stats cache without touching data) the single-pass
    # decode-everything plan is strictly cheaper — same df-gated
    # philosophy as the flat path's PARTIAL_TOPK_MIN_DF.  The budgeted
    # walk ignores this gate: its partial-result contract needs
    # bound-ordered increments regardless of cost.
    WAND_MIN_POSTINGS = 500_000

    def _make_jvm_and_apply(
        self,
        tok_list: list[str],
        keywords: list[str],
        dfs: dict[str, int],
        whitelist: np.ndarray | None = None,
    ):
        """JVM twin of the pandas AND kernel (non-proximity): returns
        an apply(df)->DataFrame that decodes/intersects/scores inside
        the executor (riot_spark/jvm/BlockQuery.scala), or None when
        riotspark.jar is not on this session's classpath.  idf values
        are fixed driver-side with numpy's float64 log2 and truncated
        to float32 so the JVM never computes a log — bit-identical
        scores to bm25_score_f32_vec by construction of the op order
        (differential-tested)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        p = bi.params
        idf = self._idf_list(tok_list, dfs, False)
        df_list = [int(dfs[t]) for t in tok_list]
        wl = (
            None
            if whitelist is None
            else [int(x) for x in np.sort(np.asarray(whitelist))]
        )
        cols = ["term", "block_id", "is_label", "doc_ids", "tfs", "token_lens"]

        def apply_and(df: DataFrame) -> DataFrame:
            jdf = spark._jvm.riotspark.BlockQuery.searchAnd(
                df.select(cols)._jdf,
                list(tok_list),
                idf,
                df_list,
                list(keywords),
                float(p.k1),
                float(p.b),
                float(bi.avgdl),
                bool(bi.has_positions),
                wl,
            )
            return DataFrame(jdf, spark)

        return apply_and

    def _idf_list(
        self, tokens: list[str], dfs: dict[str, int], double_scores: bool
    ) -> list[float]:
        """Per-token idf for the JVM kernels, precision-critical and
        shared by every call site so the kernel/pandas differential
        tests pin ONE expression: full-precision numpy float64 log2 in
        double mode; in f32 mode the float32 fix happens driver-side,
        so no JVM log enters either fixed-point path."""
        n = self.bi.n_docs
        if double_scores:
            return [float(np.log2(n / dfs[t] + 1.0)) for t in tokens]
        return [float(np.float32(np.log2(n / dfs[t] + 1.0))) for t in tokens]

    def _jvm_and_batch(
        self,
        matched: DataFrame,
        qmeta: list[tuple],
        dfs: dict[str, int],
        double_scores: bool = False,
    ) -> DataFrame | None:
        """JVM twin of the batch AND dispatcher
        (BlockQuery.scala::searchAndBatch): every query of the batch is
        served from ONE executor-side decode of each block, so the
        packed bytes never cross into Python at all.  Returns None when
        riotspark.jar is not on the session classpath (the pandas
        dispatcher takes over).  idf fixed driver-side exactly as in
        _make_jvm_and_apply; bit-identical to the pandas batch path
        in BOTH score modes — float32 riot-exact, or float64
        (andScoreD, the oracle-parity twin of bm25_score_f64_vec)
        when `double_scores` (tests/test_jvm_packer.py::
        test_jvm_batch_bit_identical / _double_bit_identical)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        p = bi.params
        qids, toks_b, idf_b, df_b, kws_b, wl_b = [], [], [], [], [], []
        for qid, tokens, keywords, wl in qmeta:
            qids.append(qid)
            toks_b.append(list(tokens))
            idf_b.append(self._idf_list(tokens, dfs, double_scores))
            df_b.append([int(dfs[t]) for t in tokens])
            kws_b.append(list(keywords))
            # np.unique output is already sorted — the JVM kernel's
            # whitelist intersection requires sorted distinct ids
            wl_b.append(None if wl is None else [int(x) for x in wl])
        cols = ["term", "block_id", "is_label", "doc_ids", "tfs", "token_lens"]
        jdf = spark._jvm.riotspark.BlockQuery.searchAndBatch(
            matched.select(cols)._jdf,
            qids, toks_b, idf_b, df_b, kws_b,
            float(p.k1), float(p.b), float(bi.avgdl),
            bool(bi.has_positions), wl_b, bool(double_scores),
        )
        return DataFrame(jdf, spark)

    def _make_jvm_prox_apply(
        self,
        tok_list: list[str],
        keywords: list[str],
        dfs: dict[str, int],
        whitelist: list[int] | None = None,
    ):
        """JVM twin of the pandas AND+proximity kernel
        (BlockQuery.scala::searchProx): float32 BM25 via the shared
        andScore body plus the token-proximity DP with snippet-path
        reconstruction, all over the packed positions inside the
        executor.  `whitelist` (sorted doc ids) restricts scoring/DP
        to those docs — the hydrate half of the rank-then-hydrate
        top-k route.  Returns an apply(df)->DataFrame or None when
        riotspark.jar is absent.  Bit-identical to the pandas kernel
        (tests/test_jvm_packer.py::test_jvm_prox_single)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        p = bi.params
        idf = self._idf_list(tok_list, dfs, False)
        df_list = [int(dfs[t]) for t in tok_list]
        wl = None if whitelist is None else sorted(int(x) for x in whitelist)
        cols = [
            "term", "block_id", "is_label", "doc_ids", "tfs",
            "token_lens", "positions",
        ]

        def apply_prox(df: DataFrame) -> DataFrame:
            jdf = spark._jvm.riotspark.BlockQuery.searchProx(
                df.select(cols)._jdf,
                list(tok_list), idf, df_list, list(keywords),
                float(p.k1), float(p.b), float(bi.avgdl), wl,
            )
            return DataFrame(jdf, spark)

        return apply_prox

    def _jvm_prox_batch(
        self, matched: DataFrame, qmeta: list[tuple]
    ) -> DataFrame | None:
        """JVM twin of the batch proximity-criteria dispatcher
        (BlockQuery.scala::searchProxBatch): AND-intersection plus the
        token-proximity DP run inside the executor, every query served
        from ONE decode of each block — the packed positions never
        cross into Python.  Proximity is an exact integer, so this
        path serves the float64-oracle mode too.  Returns None when
        riotspark.jar is not on the session classpath.  Bit-identical
        to the pandas dispatcher (tests/test_jvm_packer.py)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        qids, toks_b, kws_b, wl_b = [], [], [], []
        for qid, tokens, keywords, wl in qmeta:
            qids.append(qid)
            toks_b.append(list(tokens))
            kws_b.append(list(keywords))
            wl_b.append(None if wl is None else [int(x) for x in wl])
        cols = [
            "term", "block_id", "is_label", "doc_ids", "tfs",
            "token_lens", "positions",
        ]
        jdf = spark._jvm.riotspark.BlockQuery.searchProxBatch(
            matched.select(cols)._jdf, qids, toks_b, kws_b, wl_b
        )
        return DataFrame(jdf, spark)

    def _jvm_logic_batch(
        self,
        matched: DataFrame,
        lmeta: list[tuple],
        ms: dict[str, int] | None = None,
        dfs: dict[str, int] | None = None,
    ) -> DataFrame | None:
        """JVM twin of the batch logic dispatcher
        (BlockQuery.scala::searchLogicBatch): must/should/notIn set
        algebra per doc-range group inside the executor — the logic
        path decodes doc-id bytes only, and those never cross into
        Python.  `lmeta` rows are (qid, must, should, not_in, wl) with
        the term lists already filtered to globally-present terms
        (exactly what _make_logic_kernel receives).  Candidates are
        exact doc ids, so this serves the float64-oracle mode too.

        `ms` caps a query's per-task emission at offset+k.  Logic
        ranks by doc_id ascending, so each task walks its blocks
        block_id-ascending and stops a query at m candidates — the
        union over tasks still contains the global top-m, and tasks
        whose capped queries are all filled skip their remaining
        blocks undecoded (the doc-id-ordered analogue of WAND's
        early exit).  Callers needing every candidate (CountDocsOnly,
        the unlimited search_logic surface) pass no caps.  Returns
        None when riotspark.jar is absent."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        qids, must_b, should_b, notin_b, wl_b, ms_b = [], [], [], [], [], []
        for qid, must, should, not_in, wl in lmeta:
            qids.append(qid)
            must_b.append(list(must))
            should_b.append(list(should))
            notin_b.append(list(not_in))
            wl_b.append(None if wl is None else [int(x) for x in wl])
            ms_b.append(int(ms.get(qid, 0)) if ms else 0)
        cols = ["term", "block_id", "is_label", "doc_ids"]
        n_parts = self._onepass_parts(
            self._lmeta_postings(lmeta, dfs), self.BYTES_PER_POSTING_IDS
        )
        if n_parts is None:
            return None  # spill guard: per-group pandas kernel instead
        arranged = matched.select(cols).repartition(n_parts, "block_id")
        jdf = spark._jvm.riotspark.BlockQuery.searchLogicBatch(
            arranged._jdf, qids, must_b, should_b, notin_b, wl_b, ms_b
        )
        return DataFrame(jdf, spark)

    def _lmeta_postings(
        self, lmeta: list[tuple], dfs: dict[str, int] | None
    ) -> int:
        """Estimated matched postings for a logic/count dispatch: the
        sum of dfs over the batch's distinct terms (each term's block
        rows ship once regardless of how many queries reference it)."""
        terms = set()
        for _qid, must, should, not_in, _wl in lmeta:
            terms |= set(must) | set(should) | set(not_in)
        if dfs is None:
            dfs = self.bi.lookup_terms(sorted(terms))
        return sum(int(dfs.get(t, 0)) for t in terms)

    def _jvm_count_batch(
        self,
        matched: DataFrame,
        lmeta: list[tuple],
        dfs: dict[str, int] | None = None,
    ) -> DataFrame | None:
        """JVM per-task count kernel (BlockQuery.countLogicBatch):
        must-intersection sizes summed per block inside each task —
        only (query_id, partial-count) longs ever move, instead of
        O(df) candidate rows.  Exact because blocks partition the doc
        space.  Returns None when riotspark.jar is absent."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        if not jvm_pack_available(spark):
            return None
        qids, must_b, wl_b = [], [], []
        for qid, must, _should, _notin, wl in lmeta:
            qids.append(qid)
            must_b.append(list(must))
            wl_b.append(None if wl is None else [int(x) for x in wl])
        cols = ["term", "block_id", "is_label", "doc_ids"]
        n_parts = self._onepass_parts(
            self._lmeta_postings(lmeta, dfs), self.BYTES_PER_POSTING_IDS
        )
        if n_parts is None:
            return None  # spill guard: per-group pandas kernel instead
        arranged = matched.select(cols).repartition(n_parts, "block_id")
        jdf = spark._jvm.riotspark.BlockQuery.countLogicBatch(
            arranged._jdf, qids, must_b, wl_b
        )
        return DataFrame(jdf, spark)

    def _pandas_and_batch(
        self,
        matched: DataFrame,
        qmeta: list[tuple],
        qsets: dict[str, set],
        dfs: dict[str, int],
        double_scores: bool,
    ) -> DataFrame:
        """Arrow/pandas batch AND dispatcher — the fallback (and the
        float64-scores path) when the JVM kernel is unavailable.

        ONE group per block (not per (query, block)): every query is
        served from the same decoded arrays via the shared per-block
        cache, so a block's packed bytes decode once per batch —
        marginal per-query cost is its intersection, not a re-decode
        (this is what keeps batch wall flat in query count)."""
        score_type = "DOUBLE" if double_scores else "FLOAT"
        out_schema = f"query_id STRING, doc_id LONG, score {score_type}"
        score_np = np.float64 if double_scores else np.float32
        kernels = {
            qid: self._make_and_kernel(
                tokens, keywords, dfs, False,
                whitelist=wl, f64=double_scores,
            )
            for qid, tokens, keywords, wl in qmeta
        }

        def dispatch(pdf: pd.DataFrame) -> pd.DataFrame:
            shared: dict = {}
            in_block = set(pdf["term"])
            outs = []
            for qid, kern in kernels.items():
                qs = qsets[qid]
                if not qs <= in_block:
                    continue  # AND prune before any decode
                out = kern.impl(pdf[pdf["term"].isin(qs)], shared)
                if len(out):
                    out.insert(0, "query_id", qid)
                    outs.append(out)
            if not outs:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype=object),
                        "doc_id": np.array([], np.int64),
                        "score": np.array([], score_np),
                    }
                )
            return pd.concat(outs, ignore_index=True)

        return matched.groupBy("block_id").applyInPandas(dispatch, out_schema)

    def _kernel_and_batch(
        self,
        matched: DataFrame,
        qmeta: list[tuple],
        qsets: dict[str, set],
        dfs: dict[str, int],
        double_scores: bool,
    ) -> DataFrame:
        """One decode-once batch AND pass: the JVM kernel when the jar
        is present (float32 or float64 tail), else the pandas
        dispatcher."""
        scored = self._jvm_and_batch(matched, qmeta, dfs, double_scores)
        if scored is None:
            scored = self._pandas_and_batch(
                matched, qmeta, qsets, dfs, double_scores
            )
        return scored

    def _wand_batch_eligible(
        self, qm: tuple, mrow: tuple, dfs: dict[str, int]
    ) -> bool:
        """Gate a batched query into the WAND-pruned pass: top-k
        requested, forward order (block-max bounds say nothing about
        the LOWEST scores ReverseOrder wants), no whitelist (the
        whitelist already caps the candidate set), and enough postings
        for pruning to beat the decode-everything pass — the batch
        crossover sits far above the single-query one (see
        WAND_BATCH_MIN_POSTINGS below)."""
        qid, tokens, keywords, wl = qm
        _, k, _qoffset, rev = mrow
        return (
            k > 0
            and not rev
            and wl is None
            and sum(dfs[t] for t in keywords) >= self.WAND_BATCH_MIN_POSTINGS
        )

    # batch crossover, measured (BENCH.md round-3 soak): with the
    # block cache in executor memory the decode-everything batch pass
    # beats the pruned plan up to at least sum-df 2M (the bounds
    # build + skew probe alone cost ~1s of scheduling), so the batch
    # gate sits an order of magnitude above the single-query one.
    # The pruned plan is for the disk-resident index shape where
    # phase-2's block pruning skips real I/O.
    WAND_BATCH_MIN_POSTINGS = 5_000_000

    # a query's bound distribution must be STRONGLY skewed for
    # block-max WAND to prune anything: the kth actual score lands
    # near the top of the bound distribution, so unless a large
    # fraction of ranges bound WELL under the max, phase 2 keeps
    # nearly everything and the two-phase plan just decodes (and
    # scans) everything twice.  The probe therefore demands the 90th
    # PERCENTILE bound sit under FLAT * max — i.e. at least ~10% of
    # ranges must be clearly dominated before pruning is even
    # plausible.  Both knobs are instance-overridable (tests force
    # them open).
    WAND_FLAT = 0.95  # p90 >= FLAT * max  =>  unprunable
    WAND_MIN_RANGES = 128  # fewer ranges: single pass is cheaper

    def _wand_and_batch(
        self,
        qmeta: list[tuple],
        meta_by_qid: dict[str, tuple],
        qsets: dict[str, set],
        dfs: dict[str, int],
        double_scores: bool,
    ) -> tuple[DataFrame | None, set[str]]:
        """Batched block-max WAND — per-query pruning INSIDE the batch
        executor (beyond-reference; the batch analogue of
        :meth:`_wand_topk`'s threshold mode).

        Phase 0 computes a bounds table per (query_id, block_id) from
        block metadata only (norm_max · idf summed over the query's
        terms; ranges missing a term are AND-pruned) — 1 row per
        2^doc_block_bits docs per term, never the postings themselves.
        A skew probe over that table then routes each query: flat
        bound distributions (synthetic-uniform corpora, stopword
        conjunctions over large blocks) cannot be pruned by ANY
        block-max scheme, so those queries return to the caller's
        single decode-everything pass having spent two metadata jobs,
        not a kernel pass.  Phase 1 scores the top-C ranges of every
        surviving query in ONE decode-once kernel pass and collects
        each query's (offset+k)th actual score (τ) — capped by the
        shuffle-free partial top-k before the τ window, so a hot
        query's phase-1 candidates never funnel through one reducer.
        Phase 2 scores, again as one shared pass, only the ranges
        whose bound could still beat τ.

        Exactness: a range's bound dominates every score inside it, so
        for query q any range outside phase 1 ∪ phase 2 satisfies
        bound < (τ_q − eps)/(1 + eps) where τ_q (the kth of a score
        SUBSET) never exceeds the true kth — no top-(offset+k) doc is
        lost.  Phase 2 excludes ALL phase-1 ranges, so no (query, doc)
        row duplicates.  Scoring a query in a range selected for a
        different query only adds true candidates below its own
        cutoff — harmless to the final rank slice.  In double_scores
        mode an extra 1e-4 slack keeps docs that could round into a
        tie at the caller's 4-decimal rounding.  Differential-tested
        rank-identical to the unpruned batch pass.

        Returns (scored DataFrame or None, qids routed back to the
        plain pass).  Scale shape: the bounds table is metadata
        (2^doc_block_bits× smaller than postings) aggregated
        distributed; both kernel passes stay decode-once per block;
        only (query_id, block_id) longs and final candidate rows ever
        move."""
        import math as _m

        from pyspark.sql.window import Window

        from riot_spark.query import SearchEngine

        bi = self.bi
        spark = bi.blocks.sparkSession
        m_by_qid: dict[str, int] = {}
        eps_by_qid: dict[str, float] = {}
        qterm_rows: list[tuple] = []
        for qid, tokens, keywords, _wl in qmeta:
            _, k, qoffset, _rev = meta_by_qid[qid]
            m_by_qid[qid] = int(k) + int(qoffset)
            idf = {t: _m.log2(bi.n_docs / dfs[t] + 1.0) for t in tokens}
            kw_set = set(keywords)
            for t in kw_set:
                qterm_rows.append((qid, t, float(idf.get(t, 0.0)), len(kw_set)))
            eps_by_qid[qid] = max(1.0, float(len(tokens))) * 2.0**-20
        # --- one-pass JVM kernel dispatch (no probe) ---------------
        # The skew probe's premise — "flat bound distributions cannot
        # be pruned, so two kernel passes + a tau collect are wasted"
        # — is a property of the TWO-PHASE plan.  The one-pass kernel
        # wins differently (10M-doc soak, BENCH.md): bounded top-m
        # emission per task, high-bound-first order tightening tau
        # in-task, zero metadata jobs, no driver round-trips —
        # it beat decode-everything 2.4x cold / 1.3x warm on hot
        # uniform-Zipf terms the probe would have declined.  So
        # one-pass-eligible queries skip the probe entirely; the probe
        # keeps gating the two-phase walk (jarless sessions, forced
        # WAND_IMPL='twophase', and the sum-df band between the batch
        # gate and the one-pass gate).
        # double_scores rides the kernel's float64 tail (andScoreD)
        # with roundKeys on, so its in-kernel top-m selection uses the
        # caller's final rounded total order.  Measured crossover:
        # one-pass ~ plain at sum-df 5M, clear win at 15M -> gate
        # at 8M.
        op_qids: set[str] = set()
        if self.WAND_IMPL != "twophase" and jvm_pack_available(spark):
            op_qids = {
                qid
                for qid, _tokens, keywords, _wl in qmeta
                if sum(dfs[t] for t in keywords)
                >= self.WAND_ONEPASS_MIN_POSTINGS
            }
        scored_op = None
        if op_qids:
            op_meta = [qm for qm in qmeta if qm[0] in op_qids]
            # the one-pass kernel needs NO bounds table: it orders
            # block groups by bounds it computes itself from the
            # shuffled metadata columns — only the op queries' term
            # rows ship
            op_terms = sorted({t for _q, _tk, kws, _w in op_meta
                               for t in kws})
            scored_op = self._wand_onepass_jvm(
                bi.blocks.where(F.col("term").isin(op_terms)),
                op_meta,
                {q: m_by_qid[q] for q in op_qids},
                eps_by_qid,
                dfs,
                double_scores,
            )
            if scored_op is not None:
                qmeta = [qm for qm in qmeta if qm[0] not in op_qids]
                m_by_qid = {
                    q: m for q, m in m_by_qid.items() if q not in op_qids
                }
                if not qmeta:
                    return scored_op, set()
            # scored_op None: the spill guard refused the one-pass
            # dispatch — the op queries stay in qmeta and ride the
            # (spillable) two-phase walk below

        # --- two-phase walk behind the skew probe ------------------
        # the bounds table ((query_id, block_id) rows from block
        # metadata only — norm_max · idf summed over the query's
        # terms, ranges missing a term AND-pruned) is built lazily
        # here, for the two-phase queries only: all-one-pass batches
        # never pay its jobs.  Label rows pack norm_max = 0, so the
        # when() guard only matters for a term present BOTH ways in a
        # range; label-only query terms carry idf 0 (they intersect,
        # never score).
        rest_terms = sorted({t for _q, _tk, kws, _w in qmeta for t in kws})
        matched = bi.blocks.where(F.col("term").isin(rest_terms))
        rest_qids = {qm[0] for qm in qmeta}
        qterms = spark.createDataFrame(
            [r for r in qterm_rows if r[0] in rest_qids],
            "query_id STRING, term STRING, idf DOUBLE, n_kw INT",
        )
        bounds = (
            matched.select("term", "block_id", "is_label", "norm_max")
            .join(F.broadcast(qterms), "term")
            .groupBy("query_id", "block_id")
            .agg(
                F.countDistinct("term").alias("nt"),
                F.sum(
                    F.when(
                        ~F.col("is_label"), F.col("idf") * F.col("norm_max")
                    ).otherwise(F.lit(0.0))
                ).alias("bound"),
                F.first("n_kw").alias("n_kw"),
            )
            .where(F.col("nt") == F.col("n_kw"))
            .select("query_id", "block_id", "bound")
            .persist()
        )
        self._scratch.append(bounds)
        chunk = max(8, min(64, max(m_by_qid.values())))
        probe = (
            bounds.groupBy("query_id")
            .agg(
                F.max("bound").alias("mx"),
                F.percentile_approx("bound", 0.9).alias("p90"),
                F.count(F.lit(1)).alias("nr"),
            )
            .collect()
        )
        prunable = {
            r["query_id"]
            for r in probe
            if r["nr"] >= self.WAND_MIN_RANGES
            and r["p90"] < self.WAND_FLAT * r["mx"]
        }
        fallback = {qid for qid in m_by_qid if qid not in prunable}
        # queries with zero bound rows have NO range holding every
        # term => provably empty either way; drop them from fallback
        fallback &= {r["query_id"] for r in probe}
        if not prunable:
            # bounds is two-phase-only now (one-pass never reads it)
            bounds.unpersist()
            self._scratch.remove(bounds)
            return scored_op, fallback
        qmeta = [qm for qm in qmeta if qm[0] in prunable]
        m_by_qid = {q: m for q, m in m_by_qid.items() if q in prunable}
        bounds = bounds.where(
            F.col("query_id").isin(sorted(prunable))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("bound"), F.asc("block_id")
        )
        blocks1 = (
            bounds.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= chunk)
            .select("block_id")
            .distinct()
        )
        score1 = self._kernel_and_batch(
            self._select_blocks(matched, blocks1),
            qmeta, qsets, dfs, double_scores,
        ).persist()
        self._scratch.append(score1)
        mdf = spark.createDataFrame(
            list(m_by_qid.items()), "query_id STRING, m INT"
        )
        wq = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        kth = (
            SearchEngine._partial_topk(
                score1.join(F.broadcast(mdf), "query_id")
                .withColumn("k", F.col("m"))
                .withColumn("qoffset", F.lit(0))
            )
            .withColumn("r", F.row_number().over(wq))
            .where(F.col("r") == F.col("m"))
            .select("query_id", "score")
            .collect()
        )
        taus = {r["query_id"]: float(r["score"]) for r in kth}
        round_slack = 1e-4 if double_scores else 0.0
        cut_rows = [
            (
                qid,
                (taus[qid] - round_slack - eps_by_qid[qid])
                / (1.0 + eps_by_qid[qid])
                if qid in taus
                # fewer than offset+k candidates scored: every
                # remaining range must be scored (no valid threshold)
                else -1e300,
            )
            for qid in m_by_qid
        ]
        cuts = spark.createDataFrame(cut_rows, "query_id STRING, cutoff DOUBLE")
        blocks2 = (
            bounds.join(blocks1, "block_id", "left_anti")
            .join(F.broadcast(cuts), "query_id")
            .where(F.col("bound") >= F.col("cutoff"))
            .select("block_id")
            .distinct()
        )
        score2 = self._kernel_and_batch(
            self._select_blocks(matched, blocks2),
            qmeta, qsets, dfs, double_scores,
        )
        scored = score1.unionByName(score2)
        if scored_op is not None:
            scored = scored.unionByName(scored_op)
        return scored, fallback

    # WAND implementation: 'auto' = the one-pass JVM kernel with
    # in-kernel τ pruning when riotspark.jar is on the classpath,
    # falling back to the two-phase Python-orchestrated walk;
    # 'twophase' forces the walk (the A/B twin, and the jarless path).
    WAND_IMPL = "auto"

    # single-keyword no-whitelist counts answered from block metadata
    # (sum of n; doc_ids bytes never scanned) — False forces every
    # count through the kernel (the A/B twin)
    COUNT_METADATA_ROUTE = True

    # one-pass df gate: sum of keyword dfs above which the single-pass
    # pruned kernel beats the decode-everything batch pass.  Measured
    # on the 10M-doc disk-resident soak (BENCH.md round 4): at sum-df
    # ~15M the one-pass wins 2.4x cold / 1.3x warm; at ~5M it's a
    # wash cold and loses warm; at ~300k it loses — the crossover sits
    # between, so the gate takes the midpoint.
    WAND_ONEPASS_MIN_POSTINGS = 8_000_000

    # single-query one-pass gate (None = disabled).  Round 3 measured
    # the single one-pass LOSING (plain 3.4 s vs one-pass 7.8 s cold)
    # — but that loss was the bounds-table jobs + bkey broadcast +
    # sort the plan carried then.  With in-kernel block ordering
    # (round 4) the one-pass is one exchange + one kernel stage, and
    # the fresh-JVM cold A/B (tools/soak_disk-style cells, top-100,
    # digests identical) has it WINNING the threshold walk at every
    # tier with a measurable walk: 10M-doc store sum-df 19M: 3.8-4.1 s
    # vs 6.7-7.9 s; 5M: 3.4 vs 10.7; 4M/2M/1M: ~3.0 vs 9-11; and on
    # the skewed 4M-doc store (the In-pushdown regime the walk was
    # built for): 2.8-3.5 vs 8-9.  Warm it wins 2.6-5x.  At sum-df
    # ~340k it's a wash (3.06 vs 3.13 — session fixed cost), so the
    # gate sits at 500k; below it the walk/plain pass is never worse.
    WAND_SINGLE_ONEPASS_MIN_POSTINGS: int | None = 500_000

    # --- spill-safety auto-guard (SCALING.md limit 5) --------------
    # The one-pass kernels (searchAndBatchPruned / searchLogicBatch /
    # countLogicBatch) buffer each task's shuffled rows on the JVM
    # heap to group and order its doc ranges — unlike the pre-shuffle
    # sort they replaced, that buffer cannot spill.  Before dispatch
    # the matched packed bytes are estimated driver-side from term
    # dfs (metadata already in hand — no job) with a conservative
    # per-posting envelope; the block_id exchange's partition count
    # is raised until the per-task estimate fits the heap budget, and
    # when raising cannot help (needed partitions exceed the distinct
    # doc-range count, i.e. a single range group could blow the
    # budget) the dispatch returns None and the caller takes the
    # spillable plan instead (the two-phase walk / per-group
    # applyInPandas, whose shuffle sort spills and whose groups are
    # single bounded doc ranges).
    ONEPASS_TASK_BUDGET_BYTES = 256 << 20
    ONEPASS_BUDGET_CONF = "spark.riot.onepass.taskBudgetBytes"
    # varint envelopes per posting, deliberately high — over-
    # estimating only raises the partition count early, which is
    # cheap (real packed postings run ~1.5-4 B)
    BYTES_PER_POSTING_FULL = 12  # doc_ids + tfs + token_lens (WAND cols)
    BYTES_PER_POSTING_IDS = 6  # doc_ids only (logic/count cols)

    def _onepass_parts(
        self, est_postings: int, bytes_per_posting: int
    ) -> int | None:
        """Partition count for a one-pass kernel exchange such that
        the per-task heap buffer stays under budget, or None when no
        partitioning can guarantee it (caller must fall back to a
        spillable plan)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        budget = int(
            spark.conf.get(
                self.ONEPASS_BUDGET_CONF,
                str(self.ONEPASS_TASK_BUDGET_BYTES),
            )
        )
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        est = int(est_postings) * int(bytes_per_posting)
        needed = -(-est // max(budget, 1))
        if needed <= n_parts:
            return n_parts
        bits = bi.block_bits()
        if bits is None:
            return None  # single-block corpus: cannot subdivide
        max_parts = max(1, -(-int(bi.n_docs) // (1 << bits)))
        if needed > max_parts:
            return None
        # 2x headroom absorbs hash imbalance across block ids
        return int(min(2 * needed, max_parts))

    def _wand_onepass_jvm(
        self,
        matched: DataFrame,
        qmeta: list[tuple],
        m_by_qid: dict[str, int],
        eps_by_qid: dict[str, float],
        dfs: dict[str, int],
        double_scores: bool = False,
    ) -> DataFrame | None:
        """Single-pass batched WAND (BlockQuery.scala::
        searchAndBatchPruned): τ-threshold skipping folded INTO the
        kernel, so the pruned plan costs one kernel pass instead of
        two passes + a driver τ collect.  Block rows are colocated by
        block_id; the kernel itself orders each task's block groups by
        their best bound (computed from the shuffled norm_max
        metadata), descending — each task walks its most-promising
        ranges first, exactly like a sequential WAND walk, and emits
        only its local top-(offset+k) per query (downstream
        rank-slices the union).  No bounds-table jobs, no broadcast
        join, no pre-shuffle sort: the whole pruned plan is ONE
        exchange + ONE kernel stage.  Exact by the same
        bound-domination argument as the two-phase walk
        (differential-tested against it and against the unpruned
        pass)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        p = bi.params
        qids, toks_b, idf_b, df_b, kws_b, wl_b, ms, eps = (
            [], [], [], [], [], [], [], []
        )
        for qid, tokens, keywords, wl in qmeta:
            qids.append(qid)
            toks_b.append(list(tokens))
            idf_b.append(self._idf_list(tokens, dfs, double_scores))
            df_b.append([int(dfs[t]) for t in tokens])
            kws_b.append(list(keywords))
            wl_b.append(None if wl is None else [int(x) for x in wl])
            ms.append(int(m_by_qid[qid]))
            eps.append(float(eps_by_qid[qid]))
        cols = [
            "term", "block_id", "is_label", "doc_ids", "tfs",
            "token_lens", "norm_max",
        ]
        est = sum(
            int(dfs.get(t, 0))
            for t in {t for _q, _tk, kws, _w in qmeta for t in kws}
        )
        n_parts = self._onepass_parts(est, self.BYTES_PER_POSTING_FULL)
        if n_parts is None:
            return None  # spill-unsafe: caller takes the two-phase walk
        # positional contract for the kernel; block-colocated, order
        # within the partition irrelevant (the kernel orders groups)
        arranged = matched.select(cols).repartition(n_parts, "block_id")
        # double mode ranks in-kernel by the caller's FINAL total
        # order (round-half-up 4-decimal key) with the same 1e-4
        # slack the two-phase walk uses, so rounding ties survive
        jdf = spark._jvm.riotspark.BlockQuery.searchAndBatchPruned(
            arranged._jdf,
            qids, toks_b, idf_b, df_b, kws_b,
            float(p.k1), float(p.b), float(bi.avgdl),
            bool(bi.has_positions), wl_b,
            ms, bool(double_scores),
            1e-4 if double_scores else 0.0, eps,
            bool(double_scores),
        )
        return DataFrame(jdf, spark)

    # scan-pushdown cap for a WAND phase's selected range-id set: at
    # or below this size the ids are collected and applied as an In()
    # predicate, which REACHES THE SCAN (parquet row-group pruning on
    # the block_id stats / in-memory batch stats) — a disk-resident
    # store then never reads the pruned ranges' bytes.  Above the cap
    # the selection stays a left-semi join: only ids move, the packed
    # bytes never shuffle, but every row group is still read.
    WAND_PUSHDOWN_IDS = 4096

    def _select_blocks(self, matched: DataFrame, sel: DataFrame) -> DataFrame:
        rows = sel.limit(self.WAND_PUSHDOWN_IDS + 1).collect()
        if len(rows) <= self.WAND_PUSHDOWN_IDS:
            ids = sorted(int(r["block_id"]) for r in rows)
            return matched.where(F.col("block_id").isin(ids))
        return matched.join(F.broadcast(sel), "block_id", "left_semi")

    @staticmethod
    def _decode_ids(row) -> np.ndarray:
        return delta_decode(bytes(row["doc_ids"]))

    @staticmethod
    def _member(ids: np.ndarray, cur: np.ndarray):
        """(found mask, index-into-ids) membership of cur in sorted ids."""
        if ids.size == 0:
            return np.zeros(cur.size, dtype=bool), np.zeros(cur.size, dtype=np.int64)
        pos = np.searchsorted(ids, cur)
        safe = np.minimum(pos, ids.size - 1)
        return (pos < ids.size) & (ids[safe] == cur), safe

    def search_and(
        self,
        tokens: list[str],
        labels: list[str] | tuple = (),
        k: int = 0,
        proximity: bool = False,
        wand_mode: str = "threshold",
    ) -> DataFrame:
        """AND + BM25 (+ labels, + proximity/snippets in LocsIndex
        blocks).  Semantics match the flat engine: labels intersect but
        never score; under packed positions a query token matched only
        via a label posting makes the doc unscorable (score 0,
        indexer.go:489-507).

        Top-k routing: above ``WAND_SINGLE_ONEPASS_MIN_POSTINGS``
        sum-df (jarred sessions) the query rides the one-pass JVM
        kernel — one exchange + one kernel stage, measured fastest at
        every tier cold and warm.  Otherwise `wand_mode` picks the
        top-k walk's latency/throughput trade (both exact,
        differential-tested):

        * ``"threshold"`` (default) — after the first bound-ordered
          chunk establishes a kth score, ONE distributed pass scores
          every remaining group whose bound could still beat it:
          ~4 Spark jobs per query regardless of index size.
        * ``"chunk"`` — bound-descending chunk walk with growing takes;
          2 jobs per chunk but prunes the most work when the score
          distribution has a long flat tail.  Crossover: prefer chunk
          only when driver round-trip latency is cheap relative to
          scoring the sub-threshold groups the walk would skip (rare —
          bounds below the kth score are excluded in BOTH modes)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        tok_list = list(tokens)
        keywords = tok_list + [t for t in labels if t not in tok_list]
        do_prox = proximity and bi.has_positions
        out_schema = (
            "doc_id LONG, score FLOAT, proximity INT, snippet_locs ARRAY<INT>"
            if do_prox
            else "doc_id LONG, score FLOAT"
        )
        dfs = bi.lookup_terms(keywords)
        if not keywords or any(t not in dfs for t in keywords):
            return spark.createDataFrame([], out_schema)
        matched = bi.blocks.where(F.col("term").isin(keywords))
        apply_and = (
            self._make_jvm_and_apply(tok_list, keywords, dfs)
            if not do_prox
            else self._make_jvm_prox_apply(tok_list, keywords, dfs)
        )
        if apply_and is None:
            kernel = self._make_and_kernel(tok_list, keywords, dfs, do_prox)

            def apply_and(df):
                return df.groupBy("block_id").applyInPandas(kernel, out_schema)

        if (
            k
            and do_prox
            and self.WAND_IMPL != "twophase"
            and self.WAND_SINGLE_ONEPASS_MIN_POSTINGS is not None
            and sum(dfs.values()) >= self.WAND_SINGLE_ONEPASS_MIN_POSTINGS
            and k <= self.WAND_PUSHDOWN_IDS
            and jvm_pack_available(spark)
        ):
            # rank-then-hydrate: the ranking is BM25 (proximity +
            # snippets are supplementary columns), so the top-k ids
            # come from the positions-FREE one-pass kernel (column
            # pruning keeps the packed positions unread), and only
            # the k winners' blocks are decoded for the DP
            out = self._prox_rank_then_hydrate(
                matched, tok_list, keywords, dfs, int(k)
            )
            if out is not None:
                return out
        if (
            k
            and not do_prox
            and self.WAND_IMPL != "twophase"
            and self.WAND_SINGLE_ONEPASS_MIN_POSTINGS is not None
            and sum(dfs.values()) >= self.WAND_SINGLE_ONEPASS_MIN_POSTINGS
            and jvm_pack_available(spark)
        ):
            # single-query twin of the batch one-pass dispatch — ON by
            # default above 500k sum-df since the in-kernel ordering
            # made the pruned plan one exchange + one kernel stage
            # (cold 10M-doc A/B: 3.0-4.1 s vs the walk's 6.7-11.3 s,
            # identical top-k digests; see the gate constant's note).
            scored = self._wand_single_onepass(
                matched, tok_list, keywords, dfs, int(k)
            )
            if scored is not None:
                return scored
        if k and not do_prox and sum(dfs.values()) >= self.WAND_MIN_POSTINGS:
            wand, _ = self._wand_topk(
                matched, apply_and, tok_list, [dfs[t] for t in tok_list],
                len(set(keywords)), k, mode=wand_mode,
            )
            if wand is not None:
                return wand
        scored = apply_and(matched)
        out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k else out

    def _prox_rank_then_hydrate(
        self,
        matched: DataFrame,
        tok_list: list[str],
        keywords: list[str],
        dfs: dict[str, int],
        k: int,
    ) -> DataFrame | None:
        """Top-k proximity/snippet queries in two exact phases:

        1. RANK — the positions-free one-pass WAND kernel finds the
           top-k (doc_id, score); parquet column pruning means the
           packed positions bytes (the largest store column) are
           never read.  locsMode keeps the partial-locations guard:
           label-only matches score 0 here exactly as the full prox
           kernel would score them, so the top-k id set is identical.
        2. HYDRATE — only the winners' blocks (In(block_id) scan
           pushdown, <= k row-group-prunable ranges) are decoded for
           the proximity DP + snippet path, whitelisted to the k ids.

        Same rows as the decode-everything prox plan (same float32
        andScore both phases; `test_prox_rank_then_hydrate`)."""
        ranked = self._wand_single_onepass(
            matched, tok_list, keywords, dfs, k
        )
        if ranked is None:
            return None
        bi = self.bi
        spark = bi.blocks.sparkSession
        out_schema = (
            "doc_id LONG, score FLOAT, proximity INT, "
            "snippet_locs ARRAY<INT>"
        )
        winners = ranked.collect()  # <= k <= WAND_PUSHDOWN_IDS rows
        if not winners:
            return spark.createDataFrame([], out_schema)
        ids = sorted(int(r["doc_id"]) for r in winners)
        bits = bi.block_bits()
        hyd = matched
        if bits is not None:
            blks = sorted({d >> bits for d in ids})
            hyd = matched.where(F.col("block_id").isin(blks))
        apply_p = self._make_jvm_prox_apply(
            tok_list, keywords, dfs, whitelist=ids
        )
        if apply_p is None:
            return None
        return (
            apply_p(hyd)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def _wand_single_onepass(
        self,
        matched: DataFrame,
        tok_list: list[str],
        keywords: list[str],
        dfs: dict[str, int],
        k: int,
    ) -> DataFrame | None:
        """One-pass pruned top-k for a single AND query: the batch
        kernel with one query id (in-kernel best-bound-first walk ->
        per-task top-k heaps -> global rank slice)."""
        eps = {"q": max(1.0, float(len(tok_list))) * 2.0**-20}
        scored = self._wand_onepass_jvm(
            matched, [("q", tok_list, keywords, None)],
            {"q": k}, eps, dfs,
        )
        if scored is None:
            return None
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .select("doc_id", "score")
        )

    def _make_and_kernel(
        self,
        tok_list: list[str],
        keywords: list[str],
        dfs: dict[str, int],
        do_prox: bool,
        whitelist: np.ndarray | None = None,
        f64: bool = False,
    ):
        """Build the per-block-group AND/BM25(/proximity) kernel —
        shared by search_and, the budgeted (Q13) walk, and the batch
        executor.  `whitelist` (sorted int64) keeps only those doc ids
        (Q3, applied right after the intersection); `f64` scores in
        float64 for double-precision oracle parity."""
        bi = self.bi
        kw_set = set(keywords)
        n_kw = len(kw_set)
        df_list = [dfs[t] for t in tok_list]
        n_docs, avgdl = bi.n_docs, bi.avgdl
        params = bi.params
        locs = bi.has_positions
        n_tok = len(tok_list)

        from riot_spark.oracle import (
            bm25_score_f32_vec,
            bm25_score_f64_vec,
            token_proximity,
        )

        score_fn = bm25_score_f64_vec if f64 else bm25_score_f32_vec
        score_dtype = np.float64 if f64 else np.float32

        # plain-function refs: the kernel closure must NOT capture self
        # (it holds DataFrames -> SparkContext -> PicklingError)
        decode_ids = BlockSearchEngine._decode_ids
        member = BlockSearchEngine._member

        empty_cols = {"doc_id": np.array([], np.int64),
                      "score": np.array([], score_dtype)}
        if do_prox:
            empty_cols["proximity"] = np.array([], np.int32)
            empty_cols["snippet_locs"] = []

        def kernel_impl(
            pdf: pd.DataFrame, shared: dict | None = None
        ) -> pd.DataFrame:
            """`shared` is a per-block decode cache: the batch executor
            passes one dict per block group so N queries referencing
            the same term decode its packed bytes ONCE, not N times."""
            empty = pd.DataFrame(empty_cols)
            if pdf["term"].nunique() != n_kw:
                return empty  # AND prune: a keyword absent in this range
            dec = shared if shared is not None else {}

            def dget(r, what):
                key = (r["term"], bool(r["is_label"]), what)
                v = dec.get(key)
                if v is None:
                    if what == "ids":
                        v = decode_ids(r)
                    elif what == "tfs":
                        v = unpack_ints_as_floats(bytes(r["tfs"]))
                    elif what == "lens":
                        v = unpack_ints_as_floats(bytes(r["token_lens"]))
                    elif what == "pos":
                        counts = dget(r, "tfs").astype(np.int64)
                        flat, offs = unpack_position_lists(
                            bytes(r["positions"] or b""), counts
                        )
                        v = (flat, offs, counts)
                    dec[key] = v
                return v

            tok_rows: dict = {}
            lab_rows: dict = {}
            for _, r in pdf.iterrows():
                (lab_rows if r["is_label"] else tok_rows)[r["term"]] = r
            ids_cache: dict = {}

            def kw_ids(t):
                if t not in ids_cache:
                    parts = []
                    if t in tok_rows:
                        parts.append(dget(tok_rows[t], "ids"))
                    if t in lab_rows:
                        parts.append(dget(lab_rows[t], "ids"))
                    ids_cache[t] = (
                        parts[0] if len(parts) == 1 else np.union1d(*parts)
                    )
                return ids_cache[t]

            # k-way sorted intersection, smallest candidate set first
            ordered = sorted(kw_set, key=lambda t: kw_ids(t).size)
            cur = kw_ids(ordered[0])
            for t in ordered[1:]:
                cur = cur[np.isin(cur, kw_ids(t), assume_unique=True)]
                if cur.size == 0:
                    return empty
            if whitelist is not None:
                cur = cur[np.isin(cur, whitelist, assume_unique=True)]
                if cur.size == 0:
                    return empty
            # gather tf / token_len aligned to cur, in query-token order
            tf_cols = []
            dl = np.zeros(cur.size, dtype=np.float32)
            unscor = np.zeros(cur.size, dtype=bool)
            tok_found: list[np.ndarray] = []
            tok_idx: list[np.ndarray] = []
            for t in tok_list:
                if t in tok_rows:
                    r = tok_rows[t]
                    ids = dget(r, "ids")
                    found, safe = member(ids, cur)
                    tfs = dget(r, "tfs")
                    tf_cols.append(
                        np.where(found, tfs[safe], np.float32(0.0)).astype(
                            np.float32
                        )
                    )
                    dls = dget(r, "lens")
                    dl = np.where(found, dls[safe], dl).astype(np.float32)
                else:
                    found = np.zeros(cur.size, dtype=bool)
                    safe = np.zeros(cur.size, dtype=np.int64)
                    tf_cols.append(np.zeros(cur.size, dtype=np.float32))
                if locs:
                    unscor |= ~found  # label-only match => unscorable
                tok_found.append(found)
                tok_idx.append(safe)
            # docs matched purely via labels still need a token_len for
            # BM25 — any keyword row carries it
            if not dl.all():
                for t in keywords:
                    for rows_d in (lab_rows, tok_rows):
                        if t in rows_d:
                            r = rows_d[t]
                            ids = dget(r, "ids")
                            found, safe = member(ids, cur)
                            dls = dget(r, "lens")
                            fill = (dl == 0) & found
                            dl = np.where(fill, dls[safe], dl).astype(np.float32)
            scores = score_fn(tf_cols, df_list, dl, n_docs, avgdl, params)
            if locs:
                scores = np.where(unscor, score_dtype(0.0), scores)
            out = {"doc_id": cur.astype("int64"), "score": scores}
            if do_prox:
                prox = np.full(cur.size, -1, dtype=np.int32)
                snippets: list[list[int]] = [[] for _ in range(cur.size)]
                # decode each token's packed positions once per block
                decoded: dict[str, tuple] = {}
                for t in tok_list:
                    if t in tok_rows:
                        decoded[t] = dget(tok_rows[t], "pos")
                for j in range(cur.size):
                    if unscor[j] or n_tok == 0:
                        continue
                    poss = []
                    for i, t in enumerate(tok_list):
                        flat, offs, counts = decoded[t]
                        ix = int(tok_idx[i][j])
                        if tok_found[i][j]:
                            poss.append(
                                flat[offs[ix] : offs[ix] + counts[ix]].tolist()
                            )
                        else:
                            poss.append([])
                    prox[j], snippets[j] = token_proximity(poss, tok_list)
                out["proximity"] = prox
                out["snippet_locs"] = snippets
            return pd.DataFrame(out)

        # applyInPandas treats a 2-parameter function as (key, pdf) —
        # expose a strictly-1-arg wrapper for it, with the cache-aware
        # implementation attached for the batch dispatcher
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return kernel_impl(pdf)

        kernel.impl = kernel_impl
        return kernel

    def search_and_budgeted(
        self,
        tokens: list[str],
        k: int,
        budget_s: float,
        labels: list[str] | tuple = (),
    ) -> tuple[DataFrame, bool]:
        """Timeout partial results (Q13, engine.go:591-630), batch form.

        riot's per-shard deadline returns whatever shards answered in
        time with Timeout=true; the batch analogue budgets the WAND
        refinement walk — chunks are processed in score-bound order, so
        when the clock runs out the partial top-k comes from the
        highest-potential doc ranges (strictly better than riot's
        arbitrary surviving-shard subset).  Returns (results,
        timed_out); timed_out=False means the exact top-k."""
        import time as _time

        bi = self.bi
        spark = bi.blocks.sparkSession
        tok_list = list(tokens)
        keywords = tok_list + [t for t in labels if t not in tok_list]
        dfs = bi.lookup_terms(keywords)
        if not keywords or any(t not in dfs for t in keywords):
            return spark.createDataFrame([], "doc_id LONG, score FLOAT"), False
        matched = bi.blocks.where(F.col("term").isin(keywords))
        apply_and = self._make_jvm_and_apply(tok_list, keywords, dfs)
        if apply_and is None:
            kernel = self._make_and_kernel(tok_list, keywords, dfs, False)

            def apply_and(df):
                return df.groupBy("block_id").applyInPandas(
                    kernel, "doc_id LONG, score FLOAT"
                )

        wand, timed_out = self._wand_topk(
            matched, apply_and, tok_list, [dfs[t] for t in tok_list],
            len(set(keywords)), k,
            deadline=_time.monotonic() + budget_s,
        )
        if wand is not None:
            return wand, timed_out
        # too few groups for WAND: the single-pass result is exact
        scored = apply_and(matched)
        return (
            scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k),
            False,
        )

    def search_logic(
        self,
        must: list[str] | tuple = (),
        should: list[str] | tuple = (),
        not_in: list[str] | tuple = (),
    ) -> DataFrame:
        """must/should/notIn set algebra on the packed layout
        (LogicLookup, core/indexer.go:561-685).  Correct per doc-range
        group because ALL of a doc's postings for the referenced terms
        live in that group — subtraction and the should-filter never
        need cross-range information.  notIn-only returns the notIn
        docs themselves (indexer.go:660-682)."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        must, should, not_in = list(must), list(should), list(not_in)
        present = bi.lookup_terms(list(set(must) | set(should) | set(not_in)))
        out_schema = "doc_id LONG"
        if any(t not in present for t in must):
            return spark.createDataFrame([], out_schema)
        should_p = [t for t in should if t in present]
        notin_p = [t for t in not_in if t in present]
        if should and not should_p:
            return spark.createDataFrame([], out_schema)
        notin_only = not must and not should
        if notin_only and not notin_p:
            return spark.createDataFrame([], out_schema)
        must_set, should_set, notin_set = (
            sorted(set(must)), sorted(set(should_p)), sorted(set(notin_p))
        )
        all_terms = sorted(set(must_set) | set(should_set) | set(notin_set))
        matched = bi.blocks.where(F.col("term").isin(all_terms))
        jvm = self._jvm_logic_batch(
            matched, [("q", must_set, should_set, notin_set, None)],
            dfs=present,
        )
        if jvm is not None:
            return jvm.select("doc_id")
        kernel = self._make_logic_kernel(must_set, should_set, notin_set)
        return matched.groupBy("block_id").applyInPandas(kernel, out_schema)

    @staticmethod
    def _make_logic_kernel(
        must_set: list[str],
        should_set: list[str],
        notin_set: list[str],
        whitelist: np.ndarray | None = None,
    ):
        """Per-doc-range must/should/notIn set-algebra kernel — shared
        by search_logic and the batch executor.  Correct per group
        because all of a doc's postings for the referenced terms share
        its block_id.  `whitelist` (sorted int64) keeps only those doc
        ids (the reference's LogicLookup applies DocIds the same way,
        core/indexer.go:632-637)."""
        decode_ids = BlockSearchEngine._decode_ids

        def kernel_impl(
            pdf: pd.DataFrame, shared: dict | None = None
        ) -> pd.DataFrame:
            dec = shared if shared is not None else {}
            rows_by_term: dict[str, list] = {}
            for _, r in pdf.iterrows():
                rows_by_term.setdefault(r["term"], []).append(r)

            def term_ids(t):
                # decoded per-term union memoized in the per-block
                # cache — N queries referencing a term decode it once
                key = ("union_ids", t)
                v = dec.get(key)
                if v is None:
                    parts = []
                    for r in rows_by_term.get(t, []):
                        rkey = (t, bool(r["is_label"]), "ids")
                        p = dec.get(rkey)
                        if p is None:
                            p = decode_ids(r)
                            dec[rkey] = p
                        parts.append(p)
                    v = (
                        np.array([], dtype=np.int64)
                        if not parts
                        else parts[0]
                        if len(parts) == 1
                        else np.union1d(*parts)
                    )
                    dec[key] = v
                return v

            empty = pd.DataFrame({"doc_id": np.array([], np.int64)})
            if must_set:
                if any(t not in rows_by_term for t in must_set):
                    return empty  # a must term absent in this doc range
                ordered = sorted(must_set, key=lambda t: term_ids(t).size)
                cur = term_ids(ordered[0])
                for t in ordered[1:]:
                    cur = cur[np.isin(cur, term_ids(t), assume_unique=True)]
                    if cur.size == 0:
                        return empty
                if should_set:
                    sh = [term_ids(t) for t in should_set if t in rows_by_term]
                    if not sh:
                        return empty
                    union = sh[0] if len(sh) == 1 else np.union1d(*sh) if len(sh) == 2 else np.unique(np.concatenate(sh))
                    cur = cur[np.isin(cur, union)]
            elif should_set:
                sh = [term_ids(t) for t in should_set if t in rows_by_term]
                if not sh:
                    return empty
                cur = np.unique(np.concatenate(sh))
            else:
                ni = [term_ids(t) for t in notin_set if t in rows_by_term]
                if not ni:
                    return empty
                # notIn-only quirk: the notIn docs themselves
                cur = np.unique(np.concatenate(ni))
                if whitelist is not None:
                    cur = cur[np.isin(cur, whitelist, assume_unique=True)]
                return pd.DataFrame({"doc_id": cur.astype("int64")})
            if notin_set:
                ni = [term_ids(t) for t in notin_set if t in rows_by_term]
                if ni:
                    cur = cur[~np.isin(cur, np.unique(np.concatenate(ni)))]
            if whitelist is not None:
                cur = cur[np.isin(cur, whitelist, assume_unique=True)]
            return pd.DataFrame({"doc_id": cur.astype("int64")})

        # 1-arg wrapper for applyInPandas (2 params would read as
        # (key, pdf)); .impl carries the cache-aware form
        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return kernel_impl(pdf)

        kernel.impl = kernel_impl
        return kernel

    # --------------------------------------------------------- batch

    def search_batch(
        self, requests: dict, double_scores: bool = False
    ) -> DataFrame:
        """Batched multi-query execution ON THE PACKED BLOCK LAYOUT —
        the QPS story on the index that exists at 100 TB (the flat
        postings are a correctness twin you cannot afford to keep at
        scale).

        One block scan per shape family, each a single applyInPandas
        pass keyed by block_id where every query of the family is
        served from one per-block decode cache: AND/BM25 (labels,
        DocIds whitelist, ReverseOrder, offset), proximity-criteria
        (packed positions), logic must/should/notIn incl. whitelist
        (+ orderless rides as must, with or without a whitelist), and
        CountDocsOnly incl. whitelist (no tf decode).  Hot terms
        spread across doc-range blocks (no single-reducer skew);
        ranking reuses the flat batch's df-gated partial top-k.

        Returns (query_id, doc_id, score, rank) like
        SearchEngine.search_batch: count rows as doc_id = NULL /
        score = match count / rank = 0; the one remaining unsupported
        shape (a callable ScoringCriteria) raises ValueError (never
        silently dropped)."""
        from riot_spark.query import SearchEngine, SearchRequest

        bi = self.bi
        spark = bi.blocks.sparkSession
        # a NEW batch invalidates the previous batch's WAND scratch
        # (its returned DF has been consumed or abandoned by now)
        for df in self._scratch:
            df.unpersist()
        self._scratch = []
        score_type = "DOUBLE" if double_scores else "FLOAT"
        and_q: dict[str, SearchRequest] = {}
        prox_q: dict[str, SearchRequest] = {}
        logic_q: dict[str, SearchRequest] = {}
        count_q: dict[str, SearchRequest] = {}
        for qid, req in requests.items():
            if not block_batchable(req, bi.has_positions):
                raise ValueError(
                    f"{qid!r}: request shape not batchable on the block "
                    "path (callable ScoringCriteria, proximity without "
                    "packed positions, or an unsupported logic combo) — "
                    "dispatch via SearchEngine.search_batch for the "
                    "automatic flat fallback"
                )
            is_logic = bool(req.must or req.should or req.not_in)
            if not is_logic:
                if req.count_docs_only:
                    count_q[qid] = req
                elif req.orderless:
                    logic_q[qid] = SearchRequest(
                        must=req.all_tokens() + list(req.labels),
                        doc_ids=req.doc_ids,
                    )
                elif req.criteria == "bm25":
                    and_q[qid] = req
                else:  # proximity — positions guaranteed by the gate
                    prox_q[qid] = req
            else:
                logic_q[qid] = req

        parts: list[DataFrame] = []

        if and_q:
            all_kw: set[str] = set()
            for req in and_q.values():
                all_kw |= set(req.all_tokens()) | set(req.labels)
            dfs = bi.lookup_terms(sorted(all_kw))
            qmeta: list[tuple] = []  # (qid, tokens, keywords, wl)
            qsets: dict[str, set] = {}
            meta_rows: list[tuple] = []
            for qid, req in and_q.items():
                tokens = req.all_tokens()
                keywords = tokens + [t for t in req.labels if t not in tokens]
                if not keywords or any(t not in dfs for t in keywords):
                    continue  # missing keyword => empty (indexer.go:423-427)
                wl = None
                if req.doc_ids is not None:
                    wl = np.unique(
                        np.asarray([int(d) for d in req.doc_ids], np.int64)
                    )
                qmeta.append((qid, tokens, keywords, wl))
                qsets[qid] = set(keywords)
                meta_rows.append(
                    (qid, int(req.max_outputs), int(req.offset),
                     bool(req.reverse_order))
                )
            if qmeta:
                meta_by_qid = {m[0]: m for m in meta_rows}
                wand_meta = [
                    qm
                    for qm in qmeta
                    if self._wand_batch_eligible(qm, meta_by_qid[qm[0]], dfs)
                ]
                wand_ids = {qm[0] for qm in wand_meta}
                rest_meta = [qm for qm in qmeta if qm[0] not in wand_ids]
                scored_parts: list[DataFrame] = []
                if wand_meta:
                    wand_scored, fallback = self._wand_and_batch(
                        wand_meta, meta_by_qid, qsets, dfs, double_scores
                    )
                    if wand_scored is not None:
                        scored_parts.append(wand_scored)
                    if fallback:
                        # skew probe said unprunable: one plain pass
                        rest_meta += [
                            qm for qm in wand_meta if qm[0] in fallback
                        ]
                if rest_meta:
                    rest_terms = sorted(
                        set().union(*(qsets[qm[0]] for qm in rest_meta))
                    )
                    scored_parts.append(
                        self._kernel_and_batch(
                            bi.blocks.where(F.col("term").isin(rest_terms)),
                            rest_meta, qsets, dfs, double_scores,
                        )
                    )
                scored = (
                    scored_parts[0]
                    if scored_parts
                    # every query provably empty (no range holds all
                    # of any query's terms)
                    else spark.createDataFrame(
                        [], f"query_id STRING, doc_id LONG, score {score_type}"
                    )
                )
                for sdf in scored_parts[1:]:
                    scored = scored.unionByName(sdf)
                meta = spark.createDataFrame(
                    meta_rows, "query_id STRING, k INT, qoffset INT, rev BOOLEAN"
                )
                dir_col = F.when(F.col("rev"), F.lit(-1.0)).otherwise(F.lit(1.0))
                score_col = (
                    F.round(F.col("score"), 4)
                    if double_scores
                    else F.col("score")
                )
                parts.append(
                    SearchEngine._rank_slice(
                        scored.join(F.broadcast(meta), "query_id").select(
                            "query_id", "doc_id", score_col.alias("score"),
                            "k", "qoffset", dir_col.alias("dir"),
                        ),
                        partial=SearchEngine._needs_partial(and_q, dfs),
                    )
                )

        if prox_q:
            ranked = self._prox_batch_exec(prox_q, score_type, double_scores)
            if ranked is not None:
                parts.append(ranked)

        if logic_q:
            ranked = self._logic_batch_exec(logic_q, score_type)
            if ranked is not None:
                parts.append(ranked)

        if count_q:
            counted = self._count_batch_exec(count_q)
            if counted is not None:
                # count rows ride the score column as exact DOUBLEs; a
                # float32 batch mixing in counts widens its score rows
                # to double (float->double is value-exact, so the
                # riot-bit-exact float32 scores are unchanged)
                if parts and score_type == "FLOAT":
                    parts = [
                        p.withColumn(
                            "score", F.col("score").cast("double")
                        )
                        for p in parts
                    ]
                parts.append(counted)

        if not parts:
            return spark.createDataFrame(
                [], f"query_id STRING, doc_id LONG, score {score_type}, rank INT"
            )
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        return out

    def _prox_batch_exec(
        self, requests: dict, score_type: str, double_scores: bool
    ) -> DataFrame | None:
        """All RankByTokenProximity queries as one keyed pass over the
        packed positions (Q8 criteria batched on the block layout):
        score = 1/(proximity+1), 0 for unscorable docs — the flat
        batch's criteria contract.  Same decode-once multi-query
        dispatch as the AND family."""
        from riot_spark.query import SearchEngine

        bi = self.bi
        all_kw: set[str] = set()
        for req in requests.values():
            all_kw |= set(req.all_tokens()) | set(req.labels)
        dfs = bi.lookup_terms(sorted(all_kw))
        qmeta: list[tuple] = []  # (qid, tokens, keywords, wl)
        qsets: dict[str, set] = {}
        meta_rows: list[tuple] = []
        for qid, req in requests.items():
            tokens = req.all_tokens()
            keywords = tokens + [t for t in req.labels if t not in tokens]
            if not keywords or any(t not in dfs for t in keywords):
                continue  # missing keyword => empty
            wl = None
            if req.doc_ids is not None:
                wl = np.unique(
                    np.asarray([int(d) for d in req.doc_ids], np.int64)
                )
            qmeta.append((qid, tokens, keywords, wl))
            qsets[qid] = set(keywords)
            meta_rows.append(
                (qid, int(req.max_outputs), int(req.offset),
                 bool(req.reverse_order))
            )
        if not qmeta:
            return None
        spark = bi.blocks.sparkSession
        matched = bi.blocks.where(
            F.col("term").isin(sorted(set().union(*qsets.values())))
        )
        # proximity is an exact int, so the JVM kernel serves the
        # float64-oracle mode too (unlike the AND family's f32 scores)
        scored = self._jvm_prox_batch(matched, qmeta)
        if scored is None:
            kernels = {
                qid: self._make_and_kernel(
                    tokens, keywords, dfs, True, whitelist=wl
                )
                for qid, tokens, keywords, wl in qmeta
            }

            def dispatch(pdf: pd.DataFrame) -> pd.DataFrame:
                shared: dict = {}
                in_block = set(pdf["term"])
                outs = []
                for qid, kern in kernels.items():
                    qs = qsets[qid]
                    if not qs <= in_block:
                        continue
                    out = kern.impl(pdf[pdf["term"].isin(qs)], shared)
                    if len(out):
                        out = out[["doc_id", "proximity"]].copy()
                        out.insert(0, "query_id", qid)
                        outs.append(out)
                if not outs:
                    return pd.DataFrame(
                        {
                            "query_id": pd.Series([], dtype=object),
                            "doc_id": np.array([], np.int64),
                            "proximity": np.array([], np.int32),
                        }
                    )
                return pd.concat(outs, ignore_index=True)

            scored = matched.groupBy("block_id").applyInPandas(
                dispatch, "query_id STRING, doc_id LONG, proximity INT"
            )
        meta = spark.createDataFrame(
            meta_rows, "query_id STRING, k INT, qoffset INT, rev BOOLEAN"
        )
        crit = F.when(
            F.col("proximity") >= 0,
            (F.lit(1.0) / (F.col("proximity") + 1.0)).cast("float"),
        ).otherwise(F.lit(0.0).cast("float"))
        if double_scores:
            crit = F.round(crit.cast("double"), 4)
        dir_col = F.when(F.col("rev"), F.lit(-1.0)).otherwise(F.lit(1.0))
        return SearchEngine._rank_slice(
            scored.join(F.broadcast(meta), "query_id").select(
                "query_id", "doc_id", crit.alias("score"),
                "k", "qoffset", dir_col.alias("dir"),
            ),
            partial=SearchEngine._needs_partial(requests, dfs),
        )

    def _logic_batch_exec(
        self, requests: dict, score_type: str
    ) -> DataFrame | None:
        """All logic queries as ONE keyed kernel pass over the blocks
        (LogicLookup Q7 batched on the packed layout).  Logic results
        carry no BM25 (score 0, ranked by doc_id) — the all-equal
        scores make the shared _rank_slice order collapse to doc_id
        asc, so ranking reuses the skew-proof partial top-k."""
        from riot_spark.query import SearchEngine

        bi = self.bi
        spark = bi.blocks.sparkSession
        all_terms: set[str] = set()
        for req in requests.values():
            all_terms |= set(req.must) | set(req.should) | set(req.not_in)
        present = bi.lookup_terms(sorted(all_terms))
        lmeta: list[tuple] = []  # (qid, must, should_p, notin_p, wl)
        qsets: dict[str, set] = {}
        meta_rows: list[tuple] = []
        for qid, req in requests.items():
            must = sorted(set(req.must))
            should_p = sorted({t for t in req.should if t in present})
            notin_p = sorted({t for t in req.not_in if t in present})
            if any(t not in present for t in must):
                continue  # missing must term => empty
            if req.should and not should_p:
                continue  # every should term absent => empty
            if not must and not req.should and not notin_p:
                continue
            wl = None
            if req.doc_ids is not None:
                wl = np.unique(
                    np.asarray([int(d) for d in req.doc_ids], np.int64)
                )
            lmeta.append((qid, must, should_p, notin_p, wl))
            qsets[qid] = set(must) | set(should_p) | set(notin_p)
            meta_rows.append((qid, int(req.max_outputs), int(req.offset)))
        if not lmeta:
            return None
        matched = bi.blocks.where(
            F.col("term").isin(sorted(set().union(*qsets.values())))
        )
        # logic ranks by doc_id: cap each query's per-task emission at
        # offset+k so hot-term logic queries stop decoding early
        # (k == 0 stays unlimited)
        ms = {q: (k + off if k > 0 else 0) for q, k, off in meta_rows}
        cand = self._jvm_logic_batch(matched, lmeta, ms=ms, dfs=present)
        if cand is None:
            # one group per block; all queries share the per-block
            # decode cache (see the AND dispatch for the rationale)
            kernels = {
                qid: self._make_logic_kernel(
                    must, should_p, notin_p, whitelist=wl
                )
                for qid, must, should_p, notin_p, wl in lmeta
            }

            def dispatch(pdf: pd.DataFrame) -> pd.DataFrame:
                shared: dict = {}
                in_block = set(pdf["term"])
                outs = []
                for qid, kern in kernels.items():
                    qs = qsets[qid]
                    if not qs & in_block:
                        continue  # no referenced term in this doc range
                    out = kern.impl(pdf[pdf["term"].isin(qs)], shared)
                    if len(out):
                        out.insert(0, "query_id", qid)
                        outs.append(out)
                if not outs:
                    return pd.DataFrame(
                        {
                            "query_id": pd.Series([], dtype=object),
                            "doc_id": np.array([], np.int64),
                        }
                    )
                return pd.concat(outs, ignore_index=True)

            cand = matched.groupBy("block_id").applyInPandas(
                dispatch, "query_id STRING, doc_id LONG"
            )
        meta = spark.createDataFrame(
            meta_rows, "query_id STRING, k INT, qoffset INT"
        )
        return SearchEngine._rank_slice(
            cand.join(F.broadcast(meta), "query_id").select(
                "query_id", "doc_id",
                F.lit(0.0).cast(score_type).alias("score"),
                "k", "qoffset", F.lit(1.0).alias("dir"),
            ),
            partial=SearchEngine._needs_partial(requests, present),
        )

    def _count_batch_exec(
        self, requests: dict
    ) -> DataFrame | None:
        """All CountDocsOnly queries as one keyed must-intersection
        pass (no tf decode); one row per query (query_id,
        doc_id = NULL, score = match count, rank = 0), count 0 for
        missing keywords — the flat batch contract.  Counts are
        carried as DOUBLE regardless of the batch's score type:
        float32 is exact only to 2^24, so a count above ~16.7M docs
        (routine at the target scale) would silently round; double is
        exact to 2^53.

        Count routing, cheapest plan first:

        * single keyword, no whitelist — METADATA ONLY: per (term,
          block) rows are distinct sorted doc ids, and blocks
          partition the doc space, so count = Σ n over the term's
          block rows.  The scan reads the 8-byte ``n`` column, never
          the packed doc_ids bytes (column pruning) — a hot-term count
          at 10^12 docs is O(term's blocks) metadata rows, not O(df)
          decoded postings.  A term carrying BOTH a content and a
          label row in some block could double-count the docs present
          in both, so any such term falls back to the kernel.
        * everything else — in-kernel per-block counting
          (BlockQuery.countLogicBatch): the intersection SIZE is
          summed per task and only (query_id, partial-count) longs
          move; the jarless fallback keeps the emit-candidates
          + count aggregation."""
        bi = self.bi
        spark = bi.blocks.sparkSession
        all_kw: set[str] = set()
        for req in requests.values():
            all_kw |= set(req.all_tokens()) | set(req.labels)
        present = bi.lookup_terms(sorted(all_kw))
        lmeta: list[tuple] = []  # (qid, keywords-as-must, [], [], wl)
        qsets: dict[str, set] = {}
        zero_qids: list[str] = []
        for qid, req in requests.items():
            keywords = sorted(set(req.all_tokens()) | set(req.labels))
            if not keywords or any(t not in present for t in keywords):
                zero_qids.append(qid)  # missing keyword => count 0
                continue
            wl = None
            if req.doc_ids is not None:
                wl = np.unique(
                    np.asarray([int(d) for d in req.doc_ids], np.int64)
                )
            lmeta.append((qid, keywords, [], [], wl))
            qsets[qid] = set(keywords)
        meta_rows_out: list[tuple] = []
        if lmeta:
            single_terms = sorted(
                {kw[0] for _q, kw, _s, _n, wl in lmeta
                 if len(kw) == 1 and wl is None}
            ) if self.COUNT_METADATA_ROUTE else []
            if single_terms:
                stats = (
                    bi.blocks.where(F.col("term").isin(single_terms))
                    .groupBy("term", "block_id")
                    .agg(
                        F.count(F.lit(1)).alias("ways"),
                        F.sum("n").alias("sn"),
                    )
                    .groupBy("term")
                    .agg(
                        F.sum("sn").alias("total"),
                        F.max("ways").alias("mx"),
                    )
                    .collect()
                )  # O(batch's single terms) rows
                meta_count = {
                    r["term"]: int(r["total"])
                    for r in stats
                    if r["mx"] == 1  # no dual content+label block
                }
                kept: list[tuple] = []
                for qm in lmeta:
                    qid, kw, _s, _n, wl = qm
                    if len(kw) == 1 and wl is None and kw[0] in meta_count:
                        meta_rows_out.append((qid, meta_count[kw[0]]))
                    else:
                        kept.append(qm)
                lmeta = kept
        out = None
        if lmeta:
            matched = bi.blocks.where(
                F.col("term").isin(
                    sorted(set().union(*(set(qm[1]) for qm in lmeta)))
                )
            )
            # count = must-only candidates: the JVM count kernel sums
            # intersection sizes in-task (no tf decode on either path)
            cand = None
            counts = self._jvm_count_batch(matched, lmeta, dfs=present)
            if counts is None:
                kernels = {
                    qid: self._make_logic_kernel(kw, [], [], whitelist=wl)
                    for qid, kw, _s, _n, wl in lmeta
                }

                def dispatch(pdf: pd.DataFrame) -> pd.DataFrame:
                    shared: dict = {}
                    in_block = set(pdf["term"])
                    outs = []
                    for qid, kern in kernels.items():
                        qs = qsets[qid]
                        if not qs <= in_block:
                            continue  # AND prune before any decode
                        res = kern.impl(pdf[pdf["term"].isin(qs)], shared)
                        if len(res):
                            res.insert(0, "query_id", qid)
                            outs.append(res)
                    if not outs:
                        return pd.DataFrame(
                            {
                                "query_id": pd.Series([], dtype=object),
                                "doc_id": np.array([], np.int64),
                            }
                        )
                    return pd.concat(outs, ignore_index=True)

                cand = matched.groupBy("block_id").applyInPandas(
                    dispatch, "query_id STRING, doc_id LONG"
                )
                counts = cand.groupBy("query_id").agg(
                    F.count(F.lit(1)).cast("long").alias("cnt")
                )
            else:
                counts = counts.groupBy("query_id").agg(
                    F.sum("cnt").alias("cnt")
                )
            all_qids = spark.createDataFrame(
                [(qm[0],) for qm in lmeta], "query_id STRING"
            )
            out = all_qids.join(counts, "query_id", "left").select(
                "query_id",
                F.lit(None).cast("long").alias("doc_id"),
                F.coalesce("cnt", F.lit(0)).cast("double").alias("score"),
                F.lit(0).alias("rank"),
            )
        if meta_rows_out:
            meta_df = spark.createDataFrame(
                meta_rows_out, "query_id STRING, cnt LONG"
            ).select(
                "query_id",
                F.lit(None).cast("long").alias("doc_id"),
                F.col("cnt").cast("double").alias("score"),
                F.lit(0).alias("rank"),
            )
            out = meta_df if out is None else out.unionByName(meta_df)
        if zero_qids:
            zeros = spark.createDataFrame(
                [(q,) for q in zero_qids], "query_id STRING"
            ).select(
                "query_id",
                F.lit(None).cast("long").alias("doc_id"),
                F.lit(0).cast("double").alias("score"),
                F.lit(0).alias("rank"),
            )
            out = zeros if out is None else out.unionByName(zeros)
        return out

    def search(self, req) -> DataFrame:
        """Single-request twin of SearchEngine.search on the packed
        layout — serves the full riot request-shape surface
        (types/search_request.go:19-54): DocIds whitelist, offset,
        ReverseOrder, CountDocsOnly, orderless, logic, labels,
        proximity criteria — and every pairwise combination of them
        (count+whitelist, orderless+whitelist, logic+whitelist, ...).
        Output shapes mirror the flat engine: count -> (num_docs),
        orderless/logic -> (doc_id), ranked -> (doc_id, score)."""
        dbl = bool(getattr(req, "double_scores", False))
        res = self.search_batch({"q": req}, double_scores=dbl)
        if req.count_docs_only:
            return res.select(F.col("score").cast("long").alias("num_docs"))
        if req.orderless or req.must or req.should or req.not_in:
            return res.select("doc_id")
        return res.orderBy("rank").select("doc_id", "score")

    def _wand_topk(
        self,
        matched: DataFrame,
        apply_and,
        tok_list: list[str],
        df_list: list[int],
        n_kw: int,
        k: int,
        deadline: float | None = None,
        mode: str = "threshold",
    ) -> tuple[DataFrame | None, bool]:
        """Block-max WAND, batch-shaped.

        Phase 1 computes block metadata as a DataFrame (no posting
        bytes decoded): each doc-range group's score upper bound is
        Σ_t idf_t * norm_max_t, and groups missing a query term are
        dropped outright (AND prune).  Phase 2 walks that bounds table
        in bound-descending chunks — each chunk is a TakeOrdered
        (orderBy + limit) over the CACHED metadata, so the driver only
        ever holds the current chunk, never O(n_blocks) rows; the
        chunk's +1 peek row supplies the best unprocessed bound for
        the termination test.  It stops as soon as the kth best actual
        score exceeds that bound (plus a float32 rounding margin) — no
        later group can contribute (scores inside a group never exceed
        its bound).  Exact, differential-tested against the unpruned
        kernel.

        ``mode="threshold"`` (latency knob, VERDICT r2 #9): after the
        first chunk establishes a kth score, ONE distributed pass
        scores every remaining group whose bound could still beat it
        (bound >= (kth - eps)/(1 + eps), the inverse of the chunk
        termination test) — a 100-chunk walk collapses to ~4 Spark
        jobs total.  Still exact: the final kth only rises, so a group
        below the phase-1 cutoff can never re-enter.  The budgeted
        (deadline) walk always uses chunk mode — its partial-result
        contract needs bound-ordered increments.

        Returns None to fall back to the unpruned path (too few groups
        for pruning to pay).
        """
        import math as _m

        bi = self.bi
        spark = bi.blocks.sparkSession
        idf = {
            t: _m.log2(bi.n_docs / df + 1.0)
            for t, df in zip(tok_list, df_list)
        }
        # label rows carry norm_max = 0 (tf = 0) so they never inflate
        # a bound; label-only terms get idf 0 and contribute nothing
        idf_col = F.lit(0.0)
        for t, v in idf.items():
            idf_col = F.when(
                (F.col("term") == t) & ~F.col("is_label"), F.lit(v)
            ).otherwise(idf_col)
        meta_df = (
            matched.groupBy("block_id")
            .agg(
                F.countDistinct("term").alias("nt"),
                F.sum(idf_col * F.col("norm_max")).alias("bound"),
                F.min("n").alias("cap"),
            )
            .where(F.col("nt") == n_kw)
            .select("block_id", "bound")
            .cache()
        )
        out_schema = "doc_id LONG, score FLOAT"
        if deadline is None:
            # skew probe (shared with the batch path): a flat bound
            # distribution cannot be pruned by ANY block-max scheme —
            # the walk would score everything anyway, in more jobs.
            # The budgeted walk skips this: its partial-result contract
            # needs bound-ordered increments regardless of payoff.
            pr = meta_df.agg(
                F.max("bound").alias("mx"),
                F.percentile_approx("bound", 0.9).alias("p90"),
                F.count(F.lit(1)).alias("nr"),
            ).first()
            if pr["nr"] == 0:
                meta_df.unpersist()
                return spark.createDataFrame([], out_schema), False
            if (
                pr["nr"] < self.WAND_MIN_RANGES
                or pr["p90"] >= self.WAND_FLAT * pr["mx"]
            ):
                meta_df.unpersist()
                return None, False
        # float32 rounding margin for the termination test: the kernel
        # accumulates ~n_tok float32 adds, each <= 0.5 ulp (2**-24)
        # relative, so worst-case drift grows with the term count;
        # 2**-20 per term keeps 16x headroom over the bound (a fixed
        # 1e-6 could in principle be outgrown by a very long query).
        eps = max(1.0, float(len(tok_list))) * 2.0**-20
        timed_out = False
        try:
            best: list[tuple[float, int]] = []  # (-score, doc_id) asc
            # cursor over (bound desc, block_id asc); ties split cleanly
            last_bound, last_blk = None, None
            take, take_max = max(8, min(64, k)), 4096
            done_ids: list[int] = []  # groups already scored (any mode)
            while True:
                remaining = meta_df
                if last_bound is not None:
                    remaining = meta_df.where(
                        (F.col("bound") < F.lit(last_bound))
                        | (
                            (F.col("bound") == F.lit(last_bound))
                            & (F.col("block_id") > F.lit(last_blk))
                        )
                    )
                # TakeOrdered: the driver holds only this chunk (+1
                # peek row for the best unprocessed bound)
                chunk = (
                    remaining.orderBy(F.desc("bound"), F.asc("block_id"))
                    .limit(take + 1)
                    .collect()
                )
                if not chunk:
                    if last_bound is None:
                        # zero groups survive the AND prune
                        return spark.createDataFrame([], out_schema), False
                    break
                if last_bound is None and len(chunk) <= 2:
                    # nothing to prune — single-pass is cheaper (the
                    # first chunk doubles as the group census, saving
                    # the separate metadata count job)
                    return None, False
                body, peek = chunk[:take], chunk[take:]
                chunk_ids = [int(g["block_id"]) for g in body]
                rows = (
                    apply_and(matched.where(F.col("block_id").isin(chunk_ids)))
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k)
                    .collect()
                )
                best.extend((-float(r["score"]), int(r["doc_id"])) for r in rows)
                best.sort()
                best = best[:k]
                done_ids.extend(chunk_ids)
                if not peek:
                    break  # metadata exhausted
                if mode == "threshold" and deadline is None and len(best) >= k:
                    # latency knob: finish with ONE distributed pass
                    # over every group that could still beat the kth
                    # score (inverse of the chunk termination test)
                    cutoff = (-best[k - 1][0] - eps) / (1.0 + eps)
                    rest = meta_df.where(
                        (F.col("bound") >= F.lit(cutoff))
                        & ~F.col("block_id").isin(done_ids)
                    ).select("block_id")
                    more = (
                        # isin when small so the selection reaches the
                        # scan (row-group pruning on a persisted store)
                        apply_and(self._select_blocks(matched, rest))
                        .orderBy(F.desc("score"), F.asc("doc_id"))
                        .limit(k)
                        .collect()
                    )
                    best.extend(
                        (-float(r["score"]), int(r["doc_id"])) for r in more
                    )
                    best.sort()
                    best = best[:k]
                    break
                if deadline is not None:
                    import time as _time

                    if _time.monotonic() > deadline:
                        # Q13: budget spent with groups remaining — the
                        # running top-k (drawn bound-first) is the
                        # partial result
                        timed_out = True
                        break
                last_bound = float(body[-1]["bound"])
                last_blk = int(body[-1]["block_id"])
                next_bound = float(peek[0]["bound"])
                take = min(take * 4, take_max)
                # kth result must beat every remaining bound by the
                # term-count-scaled float32 margin: the kernel
                # accumulates in float32, so an actual score can exceed
                # its group's (float64-assembled) bound by ~n_tok ulps —
                # without the epsilon a group holding a true top-k doc
                # could be pruned inside that sliver.
                if (
                    len(best) >= k
                    and -best[k - 1][0] > next_bound * (1.0 + eps) + eps
                ):
                    break
            return (
                spark.createDataFrame(
                    [(doc_id, -negs) for negs, doc_id in best], out_schema
                ),
                timed_out,
            )
        finally:
            meta_df.unpersist()


# ------------------------------------------------------- persistence


def _write_term_stats(term_stats: DataFrame, path: str) -> None:
    """Persist term_stats term-sorted with small parquet row groups.

    Above the ~200k-term driver df-cache gate every query pays a
    distributed filter+collect over this table; laid out term-sorted
    with tight row groups, the query's `term IN (...)` predicate
    reaches the scan and the row-group min/max stats skip every group
    not containing a probe term — a 10^9-term vocabulary answers a
    query's df lookup from a handful of row groups instead of a full
    table scan (same layout idea as the round-4 term-major block
    store)."""
    n_out = max(1, term_stats.rdd.getNumPartitions())
    (
        term_stats.repartitionByRange(n_out, "term")
        .sortWithinPartitions("term")
        .write.option("parquet.block.size", 512 << 10)
        .mode("overwrite")
        .parquet(path)
    )


def _input_fingerprint(paths: list[str], config_repr: str) -> str:
    h = hashlib.md5()
    for p in sorted(paths):
        st_ = os.stat(p)
        h.update(f"{p}:{st_.st_size}:{int(st_.st_mtime)}".encode())
    h.update(config_repr.encode())
    return h.hexdigest()


def write_blocked_index(
    bindex: BlockedIndex,
    path: str,
    input_paths: list[str] | None = None,
    config_repr: str = "",
) -> dict:
    """Write blocks + stats + per-partition lineage manifest.

    Resume semantics: if the manifest at `path` already records
    status='done' for this input fingerprint, the write is skipped
    entirely (riot re-indexes everything from its KV store at startup,
    store_worker.go:73-91 — we rebuild nothing that is unchanged).
    At Iceberg scale the fingerprint would be the source snapshot id
    and skipping would be per-partition; file mtime+size is the local
    stand-in.
    """
    fp = _input_fingerprint(input_paths or [], config_repr)
    manifest_path = f"{path}/manifest.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("input_fingerprint") == fp and m.get("status") == "done":
            return {"skipped": True, **m}

    t0 = time.time()
    # Layout for read-side I/O pruning (measured on the 4M skew store,
    # BENCH.md round 4): lay the store out term-major / block-minor
    # with small row groups, so (a) a term filter's row-group min/max
    # stats skip every group not containing the term and (b) a WAND
    # In(block_id) selection prunes row groups WITHIN a hot term's
    # contiguous run.  Block rows are fat (tens of KB packed), so an
    # 8 MB row group is only a few hundred rows — tight stats, and a
    # write-once cost (one range shuffle) paid against every future
    # cold read.
    n_out = max(1, bindex.blocks.rdd.getNumPartitions())
    (
        bindex.blocks.repartitionByRange(n_out, "term", "block_id")
        .sortWithinPartitions("term", "block_id")
        .write.option("parquet.block.size", 8 << 20)
        .mode("overwrite")
        .parquet(f"{path}/blocks")
    )
    _write_term_stats(bindex.term_stats, f"{path}/term_stats")
    spark = bindex.blocks.sparkSession
    spark.createDataFrame(
        [
            (
                bindex.n_docs,
                bindex.avgdl,
                bindex.params.k1,
                bindex.params.b,
                bool(bindex.has_positions),
                bindex.doc_block_bits,
            )
        ],
        "n_docs LONG, avgdl DOUBLE, k1 DOUBLE, b DOUBLE, "
        "has_positions BOOLEAN, doc_block_bits INT",
    ).write.mode("overwrite").parquet(f"{path}/global_stats")
    per_part = (
        bindex.blocks.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count("*").alias("rows"),
            F.sum("n").alias("postings"),
            F.min("term").alias("min_term"),
            F.max("term").alias("max_term"),
        )
        .collect()
    )
    manifest = {
        "input_fingerprint": fp,
        "status": "done",
        "wall_ms": int((time.time() - t0) * 1000),
        "n_docs": bindex.n_docs,
        "avgdl": bindex.avgdl,
        "partitions": [
            {
                "partition_id": r["partition_id"],
                "rows": r["rows"],
                "postings": int(r["postings"] or 0),
                "min_term": r["min_term"],
                "max_term": r["max_term"],
                "status": "done",
            }
            for r in per_part
        ],
    }
    os.makedirs(path, exist_ok=True)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    return {"skipped": False, **manifest}


def append_blocked_index(
    bindex: BlockedIndex,
    path: str,
    input_paths: list[str] | None = None,
    config_repr: str = "",
    max_fold_depth: int | None = None,
) -> dict:
    """Append a DELTA block store to a persisted store as a new LSM
    SEGMENT — the persisted twin of :func:`merge_blocked_many`.

    The base store's files are NEVER rewritten: the delta lands under
    ``path/segments/<n>/`` (a complete store with its own lineage
    manifest, written by :func:`write_blocked_index`, so each
    segment's resume/fingerprint semantics apply unchanged), and the
    reader folds root + segments back together.  A year of daily crawl
    increments is 365 appends costing O(that day's docs) each — the
    base's packed bytes are written once, ever.

    Append-only contract checked HERE (cheap parquet-stats aggs), not
    just at read: the delta's smallest doc id must exceed the stored
    store's largest.  Re-appending an identical input (same
    fingerprint as any existing segment) is a skip, keyed the same way
    as write_blocked_index's resume.

    ``max_fold_depth`` is the automatic compaction policy: every open
    folds root + live segments, so read-side cost grows with segment
    count (one boundary repack per adjacent pair); when the committed
    segment count after this append reaches the threshold,
    :func:`compact_segments` runs inline (staged + atomic, same swap
    protocol) and the result dict carries ``compacted=True``.  None
    (default) keeps compaction manual — the base is then written once,
    ever, and the caller owns read amplification."""
    if not os.path.exists(f"{path}/manifest.json"):
        raise ValueError(f"no base store at {path} — write_blocked_index first")
    spark = bindex.blocks.sparkSession
    fp = _input_fingerprint(input_paths or [], config_repr)
    import shutil

    seg_root = f"{path}/segments"
    existing = sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []
    done: list[str] = []
    for seg in existing:
        mpath = f"{seg_root}/{seg}/manifest.json"
        m = None
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
        if not m or m.get("status") != "done":
            # a crashed append left a partial segment (the manifest is
            # written LAST, so it is the commit marker): remove it —
            # readers skip it too, but a retry must not collide
            shutil.rmtree(f"{seg_root}/{seg}", ignore_errors=True)
            continue
        done.append(seg)
        if m.get("input_fingerprint") == fp:
            return {"skipped": True, "segment": seg, **m}
    existing = done
    stored = read_blocked_index(spark, path)
    if stored.has_positions != bindex.has_positions:
        raise ValueError("cannot append a different index mode to this store")
    if stored.params != bindex.params:
        raise ValueError("BM25 parameters differ from the stored index")
    hi = stored.blocks.agg(F.max("last_doc_id").alias("hi")).first()["hi"]
    lo = bindex.blocks.agg(F.min("first_doc_id").alias("lo")).first()["lo"]
    if hi is not None and lo is not None and int(lo) <= int(hi):
        raise AppendOnlyViolation(
            f"append-only: delta doc ids must exceed the stored maximum "
            f"({int(lo)} <= {int(hi)})"
        )
    seg = f"{(int(existing[-1]) + 1 if existing else 0):06d}"
    m = write_blocked_index(
        bindex, f"{seg_root}/{seg}", input_paths=input_paths,
        config_repr=config_repr,
    )
    stored.release()
    out = {"segment": seg, "compacted": False, **m}
    if max_fold_depth is not None and len(existing) + 1 >= max_fold_depth:
        cm = compact_segments(spark, path)
        out["compacted"] = not cm.get("skipped", False)
    return out


def delete_from_blocked(
    bi: BlockedIndex, doc_ids: list[int], cache: bool = True
) -> BlockedIndex:
    """Functional doc delete ON THE PACKED LAYOUT (S2/B4,
    engine.go:429-463 — the block-level twin of
    :func:`riot_spark.engine.remove_docs`): only the doc ranges that
    actually contain a tombstoned id are decoded and repacked; every
    other block row passes through untouched, so the delete costs
    O(touched ranges), never O(corpus).

    Statistics recompute EXACTLY as riot does: N drops by the number
    of deleted docs found in the index, avgdl re-weights by their doc
    lengths (read out of the touched rows' packed token_lens — a doc
    reachable only through stopworded/label terms keeps its length on
    the flat path only, a documented edge), and per-term df drops by
    the removed posting count (label rows included, matching the
    build's df = full posting-list length).  Every surviving row's
    norm_max is rescaled by max(1, avgdl_new/avgdl_old) so WAND bounds
    keep dominating under the new stats (same argument as
    :func:`merge_blocked_many`)."""
    ids = np.unique(np.asarray([int(d) for d in doc_ids], np.int64))
    if ids.size == 0:
        return bi
    spark = bi.blocks.sparkSession
    tomb = F.broadcast(
        spark.createDataFrame([(int(d),) for d in ids], "tomb_id LONG")
    )
    overlap = (F.col("tomb_id") >= F.col("first_doc_id")) & (
        F.col("tomb_id") <= F.col("last_doc_id")
    )
    affected = bi.blocks.join(tomb, overlap, "left_semi")
    if cache:
        # reused by the rewrite, the dl extraction and the df agg;
        # released below once the result blocks are materialized
        affected = affected.persist()
    untouched = bi.blocks.join(tomb, overlap, "left_anti")
    id_list = [int(d) for d in ids]

    def rewrite(batches):
        tomb_np = np.asarray(id_list, np.int64)
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                dc = delta_decode(bytes(r["doc_ids"]))
                keep = ~np.isin(dc, tomb_np)
                if keep.all():
                    out.append(r)
                    continue
                if not keep.any():
                    continue  # the whole row was tombstoned
                tf = unpack_ints_as_floats(bytes(r["tfs"]))
                dl = unpack_ints_as_floats(bytes(r["token_lens"]))
                r = r.copy()
                if r["positions"] is not None:
                    counts = tf.astype(np.int64)
                    flat, offs = unpack_position_lists(
                        bytes(r["positions"]), counts
                    )
                    r["positions"] = pack_position_lists(
                        [
                            flat[offs[i]: offs[i] + counts[i]]
                            for i in range(len(dc))
                            if keep[i]
                        ]
                    )
                dc, tf, dl = dc[keep], tf[keep], dl[keep]
                r["doc_ids"] = delta_encode(dc)
                r["tfs"] = pack_floats_as_ints(tf)
                r["token_lens"] = pack_floats_as_ints(dl)
                r["n"] = np.int32(len(dc))
                r["first_doc_id"] = dc[0]
                r["last_doc_id"] = dc[-1]
                # norm_max stays: an upper bound over a SUPERSET of the
                # surviving docs still dominates (rescaled for the new
                # avgdl below, like every other row)
                out.append(r)
            if out:
                yield pd.DataFrame(out)
            else:
                # typed empty frame: an all-object empty batch breaks
                # the Arrow cast (same gotcha as the locs tokenizer)
                yield pd.DataFrame(
                    {
                        "term": pd.Series([], dtype=object),
                        "block_id": np.array([], np.int64),
                        "is_label": np.array([], bool),
                        "n": np.array([], np.int32),
                        "first_doc_id": np.array([], np.int64),
                        "last_doc_id": np.array([], np.int64),
                        "doc_ids": pd.Series([], dtype=object),
                        "tfs": pd.Series([], dtype=object),
                        "token_lens": pd.Series([], dtype=object),
                        "positions": pd.Series([], dtype=object),
                        "norm_max": np.array([], np.float32),
                    }
                )

    rewritten = affected.mapInPandas(rewrite, BLOCKS_SCHEMA)

    # removed doc lengths from the touched CONTENT rows (one pass;
    # each deleted doc counted once via drop_duplicates on doc_id)
    def extract_dl(batches):
        tomb_np = np.asarray(id_list, np.int64)
        for pdf in batches:
            got_ids, got_dl = [], []
            for _, r in pdf.iterrows():
                if bool(r["is_label"]):
                    continue
                dc = delta_decode(bytes(r["doc_ids"]))
                hit = np.isin(dc, tomb_np)
                if hit.any():
                    dl = unpack_ints_as_floats(bytes(r["token_lens"]))
                    got_ids.append(dc[hit])
                    got_dl.append(dl[hit])
            if got_ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(got_ids),
                        "dl": np.concatenate(got_dl).astype(np.float64),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "doc_id": np.array([], np.int64),
                        "dl": np.array([], np.float64),
                    }
                )

    gone = (
        affected.mapInPandas(extract_dl, "doc_id LONG, dl DOUBLE")
        .dropDuplicates(["doc_id"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s"))
        .first()
    )
    n_gone, dl_gone = int(gone["n"] or 0), float(gone["s"] or 0.0)
    n_docs = bi.n_docs - n_gone
    avgdl = (
        (bi.avgdl * bi.n_docs - dl_gone) / n_docs if n_docs > 0 else 0.0
    )
    # df drops by removed postings per term: old minus new row counts
    old_n = affected.groupBy("term").agg(F.sum("n").alias("df_old"))
    removed = (
        old_n.join(
            rewritten.groupBy("term").agg(F.sum("n").alias("df_new")),
            "term", "left",
        )
        .select(
            "term",
            (F.col("df_old") - F.coalesce(F.col("df_new"), F.lit(0))).alias(
                "removed"
            ),
        )
        .where(F.col("removed") > 0)
    )
    term_stats = (
        bi.term_stats.join(F.broadcast(removed), "term", "left")
        .select(
            "term",
            (
                F.col("df") - F.coalesce(F.col("removed"), F.lit(0))
            ).alias("df"),
        )
        .where(F.col("df") > 0)
    )
    factor = max(1.0, avgdl / bi.avgdl) if bi.avgdl else 1.0
    blocks = (
        untouched.unionByName(rewritten)
        .withColumn(
            "norm_max",
            (F.col("norm_max").cast("double") * F.lit(factor)).cast("float"),
        )
    )
    pinned: list = []
    if cache:
        blocks = blocks.cache()
        blocks.count()  # materialize so the scratch can be released
        affected.unpersist()
        pinned.append(blocks)
    return BlockedIndex(
        blocks=blocks,
        term_stats=term_stats,
        n_docs=n_docs,
        avgdl=avgdl,
        params=bi.params,
        has_positions=bi.has_positions,
        doc_block_bits=bi.doc_block_bits,
        _pinned=pinned,
    )


def delete_from_store(
    spark: SparkSession, path: str, doc_ids: list[int]
) -> dict:
    """Persisted twin of :func:`delete_from_blocked`: apply the delete
    to a stored index (folding LSM segments first, so the tombstones
    land exactly once) and swap the result in atomically — same
    staging protocol as :func:`compact_segments`.  The rewrite is
    O(corpus) in WRITTEN bytes (a new base replaces the old store),
    but only the touched ranges are decoded/repacked; batch deletes
    with appends between them amortize like compactions do."""
    import shutil

    merged = read_blocked_index(spark, path)
    after = delete_from_blocked(merged, doc_ids, cache=False)
    stage = f"{path}.deleting"
    shutil.rmtree(stage, ignore_errors=True)
    inputs: list[str] = []
    for root, _, files in os.walk(path):
        inputs.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    m = write_blocked_index(
        after, stage, input_paths=inputs,
        config_repr=f"delete:{_input_fingerprint([], repr(sorted(set(map(int, doc_ids)))))}",
    )
    state = f"{path}/stream_state.json"
    if os.path.exists(state):
        shutil.copy(state, f"{stage}/stream_state.json")
    merged.release()
    _swap_store(path, stage, ".predelete")
    return {"n_docs": after.n_docs, **m}


def compact_segments(spark: SparkSession, path: str) -> dict:
    """Fold a store's LSM segments back into a single base — the
    periodic compaction that bounds read-side cost (each open folds
    every live segment; reads stay cheap when appends are batched into
    a handful of segments, and this collapses them once they are not).

    Staged + atomic: the folded store is written NEXT TO the live one
    (``<path>.compacting``) while readers of the old layout keep
    working, then swapped in with directory renames; the streaming
    sidecar (stream_state.json) survives the swap.  A store without
    segments is a no-op."""
    import shutil

    seg_root = f"{path}/segments"
    segs = sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []
    if not segs:
        return {"skipped": True, "segments": 0}
    merged = read_blocked_index(spark, path)
    stage = f"{path}.compacting"
    shutil.rmtree(stage, ignore_errors=True)
    inputs: list[str] = []
    for root, _, files in os.walk(path):
        inputs.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    m = write_blocked_index(
        merged, stage, input_paths=inputs,
        config_repr=f"compact:{len(segs)}",
    )
    state = f"{path}/stream_state.json"
    if os.path.exists(state):
        shutil.copy(state, f"{stage}/stream_state.json")
    merged.release()
    _swap_store(path, stage, ".precompact")
    return {"skipped": False, "segments": len(segs), **m}


#: A reader that finds the store path absent with a live swap sentinel
#: waits this long for the writer's second rename before treating the
#: sentinel as a crash leftover.
SWAP_INFLIGHT_TIMEOUT_S = 30.0


def _swap_store(path: str, stage: str, old_suffix: str) -> None:
    """Swap a fully-written staged store into place.  The two renames
    are individually atomic but NOT as a pair; a writer-owned
    sentinel file (``<path>.swap_inflight``, written before the first
    rename, removed after the second) marks the window so concurrent
    readers in :func:`recover_store` WAIT instead of rolling back an
    in-flight swap — a crash mid-swap leaves `path` absent, the
    untouched original at ``<path><old_suffix>``, and a stale
    sentinel, which recovery rolls back.  Contract: single writer per
    store path."""
    import shutil

    old = path + old_suffix
    shutil.rmtree(old, ignore_errors=True)
    sentinel = path + ".swap_inflight"
    with open(sentinel, "w") as f:
        f.write(f"{os.getpid()} {stage}\n")
    os.rename(path, old)
    os.rename(stage, path)
    os.remove(sentinel)
    shutil.rmtree(old)


def recover_store(path: str) -> bool:
    """Crash recovery for :func:`_swap_store`: if `path` is missing
    but a ``.predelete``/``.precompact`` twin exists, the crash hit
    between the swap's two renames — the twin IS the untouched
    original, so roll it back (the half-finished mutation re-runs from
    scratch) and remove the orphaned stage directory the sentinel
    names.  A FRESH sentinel means another process's swap is in
    flight right now: wait for its second rename rather than rolling
    back under the writer (which would make its rename fail with the
    target restored).  If `path` exists, any leftover ``.pre*`` twin
    is a stale post-swap copy and is removed.  Returns True on
    rollback.  Idempotent; called by every store open."""
    import shutil
    import time

    def _writer_alive() -> bool:
        try:
            with open(sentinel) as f:
                pid = int(f.read().split(None, 1)[0])
            os.kill(pid, 0)  # signal 0: existence probe only
            return True
        except (OSError, ValueError, ProcessLookupError):
            return False

    sentinel = path + ".swap_inflight"
    if not os.path.exists(path) and os.path.exists(sentinel):
        # a live writer is between its two renames — give it time;
        # a dead writer's sentinel is a crash leftover, don't wait
        deadline = time.monotonic() + SWAP_INFLIGHT_TIMEOUT_S
        while time.monotonic() < deadline and _writer_alive():
            if os.path.exists(path) or not os.path.exists(sentinel):
                break
            time.sleep(0.05)
    rolled = False
    for suf in (".predelete", ".precompact", ".prerebuild"):
        old = path + suf
        if not os.path.isdir(old):
            continue
        if os.path.exists(path):
            shutil.rmtree(old, ignore_errors=True)  # stale post-swap
        else:
            os.rename(old, path)
            rolled = True
    if os.path.exists(sentinel) and os.path.exists(path):
        # crash leftover (rolled back, or the writer died post-swap
        # pre-cleanup): drop the sentinel and its orphaned stage dir
        try:
            with open(sentinel) as f:
                stage = f.read().split(None, 1)[1].strip()
            if os.path.abspath(os.path.dirname(stage)) == os.path.abspath(
                os.path.dirname(path)
            ):
                shutil.rmtree(stage, ignore_errors=True)
        except (OSError, IndexError):
            pass
        try:
            os.remove(sentinel)
        except OSError:
            pass
    return rolled


def read_blocked_index(spark: SparkSession, path: str) -> BlockedIndex:
    """Open a persisted store.  A store with LSM segments (see
    :func:`append_blocked_index`) folds root + segments through
    :func:`merge_blocked_many` — no segment's bytes are repacked
    except the tail/head boundary ranges."""
    recover_store(path)
    g = spark.read.parquet(f"{path}/global_stats").collect()[0]
    row = g.asDict()
    blocks = spark.read.parquet(f"{path}/blocks")
    # forward-compat with pre-0.2 block parquet (no label rows, no
    # packed positions): default the absent columns so the kernels'
    # is_label / positions references stay analyzable, instead of
    # failing at analysis time with no migration path
    if "is_label" not in blocks.columns:
        blocks = blocks.withColumn("is_label", F.lit(False))
    if "positions" not in blocks.columns:
        blocks = blocks.withColumn("positions", F.lit(None).cast("binary"))
    root = BlockedIndex(
        blocks=blocks,
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        n_docs=int(g["n_docs"]),
        avgdl=float(g["avgdl"]),
        params=BM25Params(k1=float(g["k1"]), b=float(g["b"])),
        has_positions=bool(row.get("has_positions", False)),
        doc_block_bits=(
            int(row["doc_block_bits"])
            if row.get("doc_block_bits") is not None
            else None  # pre-stat store: block_bits() infers on demand
        ),
    )
    seg_root = f"{path}/segments"
    segs = sorted(os.listdir(seg_root)) if os.path.isdir(seg_root) else []
    committed = []
    for seg in segs:
        mpath = f"{seg_root}/{seg}/manifest.json"
        if os.path.exists(mpath):
            with open(mpath) as f:
                if json.load(f).get("status") == "done":
                    committed.append(seg)
        # a segment without a done manifest is a crashed append —
        # never committed, skipped here, removed by the next append
    if not committed:
        return root
    parts = [root] + [
        read_blocked_index(spark, f"{seg_root}/{s}") for s in committed
    ]
    return merge_blocked_many(parts, cache=False)
