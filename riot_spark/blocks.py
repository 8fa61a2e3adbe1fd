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
and `norm_max` — the exact per-block maximum of the BM25 tf/length
normalization term, so the query-time upper bound is idf * norm_max
(block-max WAND metadata; the adaptive threshold pass is future work —
the AND-existence prune dominates for conjunctive queries).

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
    unpack_ints_as_floats,
    varint_decode,
    varint_encode,
)
from riot_spark.config import BM25Params

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("first_doc_id", T.LongType(), False),
        T.StructField("last_doc_id", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("token_lens", T.BinaryType(), False),
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
    boundaries."""
    if getattr(index.config, "build_salts", 1) > 1:
        assert doc_block_bits <= index.config.salt_block_bits, (
            "block granularity must be at least as coarse-grained as the "
            "build salt ranges or a block would straddle partitions"
        )
    k1, b = index.config.bm25.k1, index.config.bm25.b
    avgdl = index.avgdl

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []
        cur_key: tuple | None = None

        def emit(rows: list[dict], g: pd.DataFrame, key):
            doc_ids = g["doc_id"].to_numpy(dtype=np.int64)
            tfs = g["tf"].to_numpy(dtype=np.float32)
            dls = g["token_len"].to_numpy(dtype=np.float32)
            norm = _norm_term(tfs, dls, k1, b, avgdl) if avgdl else np.zeros(1)
            rows.append(
                {
                    "term": key[0],
                    "block_id": int(key[1]),
                    "n": len(doc_ids),
                    "first_doc_id": int(doc_ids[0]),
                    "last_doc_id": int(doc_ids[-1]),
                    "doc_ids": delta_encode(doc_ids),
                    "tfs": pack_floats_as_ints(tfs),
                    "token_lens": pack_floats_as_ints(dls),
                    "norm_max": np.float32(norm.max() if len(norm) else 0.0),
                }
            )

        def flush(pdf: pd.DataFrame, final: bool) -> pd.DataFrame | None:
            nonlocal buf, cur_key
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
                # hold back the stream-tail group — it may continue in
                # the next Arrow batch (rows arrive (term, doc_id)-sorted)
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
            rows: list[dict] = []
            for key, g in all_df.groupby(["term", "block_id"], sort=False):
                emit(rows, g, key)
            return pd.DataFrame(rows) if rows else None

        for pdf in batches:
            out = flush(pdf[["doc_id", "term", "tf", "token_len"]], final=False)
            if out is not None:
                yield out
        out = flush(None, final=True)
        if out is not None:
            yield out

    flat = index.postings.where(~F.col("is_label"))
    return flat.mapInPandas(pack, schema=BLOCKS_SCHEMA)


@dataclass
class BlockedIndex:
    blocks: DataFrame
    term_stats: DataFrame
    n_docs: int
    avgdl: float
    params: BM25Params
    _term_df_cache: dict | None = None

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        if self._term_df_cache is not None:
            return {t: self._term_df_cache[t] for t in terms if t in self._term_df_cache}
        rows = self.term_stats.where(F.col("term").isin(terms)).collect()
        return {r["term"]: r["df"] for r in rows}


def blocked_from_index(index: Index, doc_block_bits: int = 13, cache: bool = True) -> BlockedIndex:
    blocks = build_blocks(index, doc_block_bits)
    if cache:
        blocks = blocks.cache()
    bi = BlockedIndex(
        blocks=blocks,
        term_stats=index.term_stats,
        n_docs=index.n_docs,
        avgdl=index.avgdl,
        params=index.config.bm25,
        _term_df_cache=index._term_df_cache,
    )
    return bi


class BlockSearchEngine:
    """AND + BM25 over packed blocks.

    Plan: scan blocks (term filter -> parquet row-group pruning on the
    sorted term column) -> shuffle packed bytes by block_id -> Arrow
    kernel per doc-range group (decode, k-way intersect via sorted
    merge, float32 BM25) -> global top-k.  Rank-identical to the flat
    float32 engine (differential-tested)."""

    def __init__(self, bindex: BlockedIndex):
        self.bi = bindex

    def search_and(self, tokens: list[str], k: int = 0) -> DataFrame:
        bi = self.bi
        dfs = bi.lookup_terms(list(set(tokens)))
        if not tokens or any(t not in dfs for t in tokens):
            spark = bi.blocks.sparkSession
            return spark.createDataFrame(
                [], "doc_id LONG, score FLOAT"
            )
        n_terms = len(set(tokens))
        tok_list = list(tokens)
        df_list = [dfs[t] for t in tokens]
        n_docs, avgdl = bi.n_docs, bi.avgdl
        params = bi.params

        from riot_spark.oracle import bm25_score_f32_vec

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            if pdf["term"].nunique() != n_terms:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float32"}
                )
            rows = {r["term"]: r for _, r in pdf.iterrows()}
            # k-way sorted intersection, smallest list first
            ordered = sorted(tok_list, key=lambda t: rows[t]["n"])
            cur = delta_decode(bytes(rows[ordered[0]]["doc_ids"]))
            for t in ordered[1:]:
                ids = delta_decode(bytes(rows[t]["doc_ids"]))
                cur = cur[np.isin(cur, ids, assume_unique=True)]
                if cur.size == 0:
                    return pd.DataFrame({"doc_id": [], "score": []}).astype(
                        {"doc_id": "int64", "score": "float32"}
                    )
            # gather tf / token_len aligned to cur, in query-token order
            tf_cols = []
            dl = None
            for t in tok_list:
                ids = delta_decode(bytes(rows[t]["doc_ids"]))
                tfs = unpack_ints_as_floats(bytes(rows[t]["tfs"]))
                pos = np.searchsorted(ids, cur)
                tf_cols.append(tfs[pos])
                if dl is None:
                    dls = unpack_ints_as_floats(bytes(rows[t]["token_lens"]))
                    dl = dls[pos]
            scores = bm25_score_f32_vec(
                tf_cols, df_list, dl, n_docs, avgdl, params
            )
            return pd.DataFrame({"doc_id": cur.astype("int64"), "score": scores})

        matched = bi.blocks.where(F.col("term").isin(tok_list))
        if k:
            wand = self._wand_topk(matched, kernel, tok_list, df_list, k)
            if wand is not None:
                return wand
        scored = matched.groupBy("block_id").applyInPandas(
            kernel, "doc_id LONG, score FLOAT"
        )
        out = scored.orderBy(F.desc("score"), F.asc("doc_id"))
        return out.limit(k) if k else out

    def _wand_topk(
        self,
        matched: DataFrame,
        kernel,
        tok_list: list[str],
        df_list: list[int],
        k: int,
    ) -> DataFrame | None:
        """Block-max WAND, batch-shaped.

        Phase 1 reads ONLY block metadata (no posting bytes decoded):
        each doc-range group's score upper bound is
        Σ_t idf_t * norm_max_t, and groups missing a query term are
        dropped outright (AND prune).  Phase 2 runs the decode kernel
        over bound-descending chunks of groups, keeping a running
        top-k; it stops as soon as the kth best actual score strictly
        exceeds the best unprocessed group's bound — no later group
        can contribute (scores inside a group never exceed its bound).
        Exact, differential-tested against the unpruned kernel.

        At web scale the bounds table is a DataFrame and the chunking
        a bound-ordered iterator; here the per-query group list
        (|groups| <= n_docs / 2^doc_block_bits) fits on the driver.
        Returns None to fall back to the unpruned path (k >= corpus
        or metadata inconclusive).
        """
        import math as _m

        bi = self.bi
        spark = bi.blocks.sparkSession
        n_terms = len(set(tok_list))
        idf = {
            t: _m.log2(bi.n_docs / df + 1.0)
            for t, df in zip(tok_list, df_list)
        }
        idf_col = F.lit(0.0)
        for t, v in idf.items():
            idf_col = F.when(F.col("term") == t, F.lit(v)).otherwise(idf_col)
        meta = (
            matched.groupBy("block_id")
            .agg(
                F.count("*").alias("nt"),
                F.sum(idf_col * F.col("norm_max")).alias("bound"),
                F.min("n").alias("cap"),
            )
            .where(F.col("nt") == n_terms)
            .select("block_id", "bound", "cap")
            .collect()
        )
        out_schema = "doc_id LONG, score FLOAT"
        if not meta:
            return spark.createDataFrame([], out_schema)
        groups = sorted(meta, key=lambda r: -r["bound"])
        if len(groups) <= 2:
            return None  # nothing to prune — single-pass is cheaper
        best: list[tuple[float, int]] = []  # (-score, doc_id) sorted asc
        i = 0
        grow = 1
        while i < len(groups):
            # chunk: enough capacity to plausibly fill k; geometric
            # growth caps the number of refinement jobs at O(log)
            cap = 0
            j = i
            while j < len(groups) and (cap < k * grow or j == i):
                cap += int(groups[j]["cap"])
                j += 1
            grow *= 4
            chunk_ids = [g["block_id"] for g in groups[i:j]]
            rows = (
                matched.where(F.col("block_id").isin(chunk_ids))
                .groupBy("block_id")
                .applyInPandas(kernel, out_schema)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
            best.extend((-float(r["score"]), int(r["doc_id"])) for r in rows)
            best.sort()
            best = best[:k]
            i = j
            # kth result must beat every remaining bound by a float32
            # rounding margin: the kernel accumulates in float32, so an
            # actual score can exceed its group's (float64-assembled)
            # bound by a few ulps — without the epsilon a group holding
            # a true top-k doc could be pruned inside that sliver.
            if (
                len(best) >= k
                and i < len(groups)
                and -best[k - 1][0] > float(groups[i]["bound"]) * (1.0 + 1e-6) + 1e-6
            ):
                break
        return spark.createDataFrame(
            [(doc_id, -negs) for negs, doc_id in best], out_schema
        )


# ------------------------------------------------------- persistence


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
    bindex.blocks.write.mode("overwrite").parquet(f"{path}/blocks")
    bindex.term_stats.write.mode("overwrite").parquet(f"{path}/term_stats")
    spark = bindex.blocks.sparkSession
    spark.createDataFrame(
        [(bindex.n_docs, bindex.avgdl, bindex.params.k1, bindex.params.b)],
        "n_docs LONG, avgdl DOUBLE, k1 DOUBLE, b DOUBLE",
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


def read_blocked_index(spark: SparkSession, path: str) -> BlockedIndex:
    g = spark.read.parquet(f"{path}/global_stats").collect()[0]
    return BlockedIndex(
        blocks=spark.read.parquet(f"{path}/blocks"),
        term_stats=spark.read.parquet(f"{path}/term_stats"),
        n_docs=int(g["n_docs"]),
        avgdl=float(g["avgdl"]),
        params=BM25Params(k1=float(g["k1"]), b=float(g["b"])),
    )
