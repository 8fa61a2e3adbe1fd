"""Query engine — the read path (SURVEY.md §2.4, §3.1).

A search is one declarative DataFrame program:

    postings scan (term filter -> partition pruning + parquet
    predicate pushdown)
      -> per-doc hash aggregate (the multi-way AND intersection:
         count(distinct term) == |keywords|)
      -> BM25 expression over broadcast (idf, N, avgdl) stats
      -> orderBy(score desc, doc_id asc).limit(offset+k)
         (Spark plans this as per-partition partial top-k +
         TakeOrderedAndProject — riot's shard-topk + gather, Q11/Q12,
         for free)

Riot's goroutine scatter/gather across shards (engine.go:797-799)
becomes Spark stages; its binary-search posting intersection
(core/indexer.go:690-721) becomes a hash aggregate, which Spark
executes with map-side partial aggregation — the distributed analogue.

Two scorers:
* native  — JVM columnar expression (double math, float cast), the
  100 TB hot path; whole-stage-codegen end to end.
* float32 — Arrow-batched pandas kernel accumulating in numpy.float32
  in query-token order, bit-exact to riot (core/indexer.go:526-546).
  Also computes token-proximity + snippet locs (LocsIndex mode).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from riot_spark.build import Index
from riot_spark.config import LOCS_INDEX
from riot_spark.oracle import bm25_score_f32_vec, token_proximity
from riot_spark.tokenizer import tokenize_query


@dataclass
class SearchRequest:
    """types.SearchReq analogue (types/search_request.go:19-54)."""

    text: str = ""
    tokens: list[str] = field(default_factory=list)
    labels: list[str] = field(default_factory=list)
    # logic expression (types/search_request.go:72-99)
    must: list[str] = field(default_factory=list)
    should: list[str] = field(default_factory=list)
    not_in: list[str] = field(default_factory=list)
    doc_ids: list[int] | None = None  # whitelist (Q3)
    offset: int = 0
    max_outputs: int = 0  # 0 => unlimited
    reverse_order: bool = False
    count_docs_only: bool = False
    orderless: bool = False
    scorer: str = "native"  # 'native' | 'float32'
    # True => keep scores in double and round(4) — used by the DuckDB
    # oracle harness where float32 vs double would flake the value hash.
    double_scores: bool = False
    # ScoringCriteria hook (Q8, types/scoring_criteria.go:19-33):
    # 'bm25' (default RankByBM25), 'proximity' (RankByTokenProximity,
    # score = 1/(proximity+1), test_utils.go), or a callable
    # pd.DataFrame[doc_id, score, proximity] -> pd.Series new score
    # (None entries drop the doc, mirroring empty-slice semantics).
    criteria: object = "bm25"

    def all_tokens(self) -> list[str]:
        return tokenize_query(self.text) + list(self.tokens)


def _flat_jvm_available(spark) -> bool:
    """True when the compiled flat-path kernel (FlatQuery in
    riotspark.jar) is on this session's driver classpath.  Sessions
    created outside riot_spark.session.get_spark (e.g. the DuckDB
    correctness harness) lack the jar and transparently keep the
    pandas kernels."""
    try:
        spark._jvm.java.lang.Class.forName("riotspark.FlatQuery")
        return True
    except Exception:
        return False


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.FloatType(), True),
        T.StructField("proximity", T.IntegerType(), True),
        T.StructField("snippet_locs", T.ArrayType(T.IntegerType()), True),
    ]
)


def _f32_score_pdf(
    pdf: pd.DataFrame,
    tok_list: list[str],
    tok_order: dict[str, int],
    df_list: list[int],
    n_kw: int,
    locs_mode: bool,
    params,
    n_docs: int,
    avgdl: float,
) -> pd.DataFrame | None:
    """Vectorized float32 BM25 + proximity over one pandas frame of
    matched postings (any number of candidate docs).  Shared by the
    single-query scorer kernel and the batched (keyed) kernel; float32
    accumulation order matches riot bit-for-bit via
    :func:`bm25_score_f32_vec` (core/indexer.go:526-546)."""
    n_tok = len(tok_list)
    # complete AND matches: doc has all n_kw distinct keywords
    nuniq = pdf.groupby("doc_id", sort=False)["term"].nunique()
    full_ids = nuniq.index[nuniq.to_numpy() == n_kw]
    if len(full_ids) == 0:
        return None
    sub = pdf[pdf["doc_id"].isin(full_ids)]
    # query-token rows only (drop label-keyword terms)
    ti = sub["term"].map(tok_order)
    qmask = ti.notna().to_numpy()
    q = sub[qmask]
    ti = ti[qmask].astype(np.int64).to_numpy()
    doc_arr = q["doc_id"].to_numpy(np.int64)
    docs_u, doc_pos = np.unique(doc_arr, return_inverse=True)
    nd = len(docs_u)
    if locs_mode:
        plen = q["positions"].map(
            lambda p: 0 if p is None else len(p)
        ).to_numpy(np.float32)
        tf_arr = plen
        bad = q["is_label"].to_numpy(bool) | (plen == 0)
    else:
        tf_arr = np.where(
            q["is_label"].to_numpy(bool),
            np.float32(0.0),
            q["tf"].to_numpy(np.float32),
        )
        bad = np.zeros(len(q), dtype=bool)
    # pivot: (doc x token-position) tf matrix; later rows win,
    # matching the scalar kernel's overwrite order
    tf_mat = np.zeros((nd, n_tok), dtype=np.float32)
    tf_mat[doc_pos, ti] = tf_arr
    unscorable = np.zeros(nd, dtype=bool)
    if locs_mode:
        np.logical_or.at(unscorable, doc_pos[bad], True)
    dl = np.zeros(nd, dtype=np.float32)
    dl[doc_pos] = q["token_len"].to_numpy(np.float32)
    scores = bm25_score_f32_vec(
        [tf_mat[:, i] for i in range(n_tok)],
        df_list, dl, n_docs, avgdl, params,
    )
    prox = np.full(nd, -1, dtype=np.int64)
    snippets: list[list[int]] = [[] for _ in range(nd)]
    if locs_mode:
        scores = np.where(unscorable, np.float32(0.0), scores)
        # proximity DP per scorable candidate — O(total positions)
        # each, batched through one row scan
        pos_by_doc: dict[int, list] = {}
        for j, (d, p) in enumerate(zip(doc_pos, q["positions"])):
            if not unscorable[d]:
                pos_by_doc.setdefault(int(d), [None] * n_tok)[
                    ti[j]
                ] = list(p) if p is not None else []
        for d, poss in pos_by_doc.items():
            poss = [p if p is not None else [] for p in poss]
            prox[d], snippets[d] = token_proximity(poss, tok_list)
    return pd.DataFrame(
        {
            "doc_id": docs_u,
            "score": scores,
            "proximity": prox.astype(np.int32),
            "snippet_locs": snippets,
        },
        columns=["doc_id", "score", "proximity", "snippet_locs"],
    )


class SearchEngine:
    """Batch search over a built :class:`riot_spark.build.Index`."""

    def __init__(self, index: Index, cache_term_stats: bool = True):
        self.index = index
        self._blocks = None  # packed twin; see attach_blocks
        self._block_engine_inst = None
        if cache_term_stats:
            index.ensure_term_cache()

    def attach_blocks(self, blocked) -> "SearchEngine":
        """Attach a packed :class:`riot_spark.blocks.BlockedIndex`
        twin.  Once attached, :meth:`search_batch` rides the block
        executor by default — the same mixed 20-query set costs ~2x
        less there (r03: 1.82 s block vs 3.81 s flat at sf0.1) because
        each packed range decodes once per batch instead of one
        postings aggregation per shape family — and the flat path
        becomes the FALLBACK for the few shapes blocks can't batch
        (callable criteria, logic+count/orderless/reverse combos).
        Score contract: the block executor scores in riot-bit-exact
        float32 (the reference's own precision, types/search_response
        float32 scores) — bit-identical to this engine's
        scorer='float32' kernel and equal to the 'native' double twin
        to ~1e-7 relative; counts stay exact doubles either way."""
        self._blocks = blocked
        self._block_engine_inst = None
        return self

    @staticmethod
    def _block_batchable(req, has_positions: bool) -> bool:
        """True iff the request batches on the packed layout —
        delegates to the single shared predicate exported by
        blocks.py so dispatch and the block path's loud gate can
        never drift."""
        from riot_spark.blocks import block_batchable

        return block_batchable(req, has_positions)

    # ---------------------------------------------------------- internals

    def _matched(self, keywords: list[str], doc_ids: list[int] | None) -> DataFrame:
        """Postings rows for the query keywords.

        The `.isin` filter on the range-partition key prunes index
        partitions and pushes into the parquet scan; the optional
        whitelist is a broadcast-isin semi-filter (Q3,
        core/indexer.go:449-453)."""
        m = self.index.postings.where(F.col("term").isin(keywords))
        if doc_ids is not None:
            m = m.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
        return m

    def _spark(self):
        return self.index.postings.sparkSession

    def _n_match(self):
        """Intersection cardinality aggregate.  Label-free indexes
        guarantee one posting row per (term, doc): count(*) suffices
        and avoids countDistinct's Expand-node row blowup."""
        return (
            F.countDistinct("term")
            if getattr(self.index, "has_labels", True)
            else F.count("*")
        )

    def _qpart(self, df: DataFrame, *cols: str) -> DataFrame:
        """Right-size the query-time aggregation shuffle (see
        EngineConfig.query_agg_partitions)."""
        n = getattr(self.index.config, "query_agg_partitions", 0)
        return df.repartition(n, *cols) if n else df

    def _empty(self) -> DataFrame:
        return self._spark().createDataFrame([], RESULT_SCHEMA)

    def _candidates_and(
        self, keywords: list[str], doc_ids: list[int] | None
    ) -> DataFrame | None:
        """AND intersection via hash aggregate; None => provably empty."""
        dfs = self.index.lookup_terms(list(set(keywords)))
        if any(kw not in dfs for kw in keywords):
            return None  # missing keyword short-circuit (indexer.go:423-427)
        return self._matched(keywords, doc_ids)

    # ------------------------------------------------------------- scoring

    def _score_native(
        self,
        matched: DataFrame,
        tokens: list[str],
        n_kw: int,
        double_scores: bool = False,
    ) -> DataFrame:
        """Columnar BM25. One aggregate does intersection + scoring."""
        idx = self.index
        p = idx.config.bm25
        dfs = idx.lookup_terms(list(set(tokens)))
        # idf per token as a literal map — queries have few terms
        idf_map = {
            t: math.log2(idx.n_docs / dfs[t] + 1.0) for t in set(tokens) if t in dfs
        }
        idf_col = F.lit(0.0)
        for t, v in idf_map.items():
            idf_col = F.when(F.col("term") == t, F.lit(v)).otherwise(idf_col)

        is_tok = F.col("term").isin(list(set(tokens))) & ~F.col("is_label")
        tf = F.col("tf").cast("double")
        dl = F.col("token_len").cast("double")
        contrib = (
            idf_col
            * tf
            * (p.k1 + 1.0)
            / (tf + p.k1 * (1.0 - p.b + p.b * dl / idx.avgdl))
        )
        contrib = F.when(is_tok & (tf > 0) & F.lit(idx.avgdl != 0.0), contrib).otherwise(
            F.lit(0.0)
        )
        locs_mode = idx.config.index_type == LOCS_INDEX
        unscorable = (
            F.max(
                F.when(
                    F.col("term").isin(list(set(tokens)))
                    & (F.col("is_label") | (F.coalesce(F.size("positions"), F.lit(0)) == 0)),
                    1,
                ).otherwise(0)
            )
            if locs_mode
            else F.max(F.lit(0))
        )
        out = (
            self._qpart(matched, "doc_id")
            .groupBy("doc_id")
            .agg(
                self._n_match().alias("n_match"),
                F.sum(contrib).alias("score_d"),
                unscorable.alias("unscorable"),
            )
            .where(F.col("n_match") == n_kw)
            .select(
                "doc_id",
                # partial-locations guard (indexer.go:489-507): zero score
                F.round(
                    F.when(F.col("unscorable") == 1, F.lit(0.0)).otherwise(
                        F.col("score_d")
                    ),
                    4,
                ).alias("score")
                if double_scores
                else F.when(F.col("unscorable") == 1, F.lit(0.0))
                .otherwise(F.col("score_d"))
                .cast("float")
                .alias("score"),
                F.lit(None).cast("int").alias("proximity"),
                F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("snippet_locs"),
            )
        )
        return out

    def _score_float32(self, matched: DataFrame, tokens: list[str], n_kw: int) -> DataFrame:
        """riot-bit-exact scorer + proximity, vectorized.

        One hash repartition on doc_id + a partition-local sort, then a
        partition-level ``mapInPandas`` kernel: BM25 runs over whole
        candidate ARRAYS via `bm25_score_f32_vec` (bit-identical to the
        scalar loop — differential-tested), and the proximity DP runs
        per candidate without spinning up a pandas group per doc.  The
        previous shape (groupBy(doc_id).applyInPandas) built one
        single-digit-row DataFrame per candidate — millions of docs
        meant millions of pandas allocations; this kernel touches each
        Arrow batch once.  Doc groups straddling Arrow batch boundaries
        are held back and re-joined with the next batch (rows arrive
        doc_id-sorted within the partition)."""
        idx = self.index
        params = idx.config.bm25
        n_docs, avgdl = idx.n_docs, idx.avgdl
        locs_mode = idx.config.index_type == LOCS_INDEX
        dfs = idx.lookup_terms(list(set(tokens)))
        tok_order = {t: i for i, t in enumerate(tokens)}
        tok_list = list(tokens)
        df_list = [dfs.get(t, 0) for t in tokens]

        def flush(pdf: pd.DataFrame) -> pd.DataFrame | None:
            return _f32_score_pdf(
                pdf, tok_list, tok_order, df_list, n_kw,
                locs_mode, params, n_docs, avgdl,
            )

        need = ["doc_id", "term", "tf", "positions", "token_len", "is_label"]

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            held: pd.DataFrame | None = None
            for pdf in batches:
                pdf = pdf[need]
                if held is not None:
                    pdf = pd.concat([held, pdf], ignore_index=True)
                # hold back the stream-tail doc — it may continue in
                # the next Arrow batch
                tail_doc = pdf["doc_id"].iloc[-1]
                tail_mask = (pdf["doc_id"] == tail_doc).to_numpy()
                held = pdf[tail_mask]
                body = pdf[~tail_mask]
                if len(body):
                    out = flush(body)
                    if out is not None:
                        yield out
            if held is not None and len(held):
                out = flush(held)
                if out is not None:
                    yield out

        # the kernel needs every row of a doc in ONE partition — always
        # repartition on doc_id (unlike _qpart, which may be a no-op)
        nparts = getattr(idx.config, "query_agg_partitions", 0)
        part = (
            matched.repartition(nparts, "doc_id")
            if nparts
            else matched.repartition("doc_id")
        ).sortWithinPartitions("doc_id")
        jvm = self._jvm_f32_batch(
            part.select(F.lit("q").alias("query_id"), "*"),
            {"q": (tok_list, tok_order, df_list, n_kw)},
        )
        if jvm is not None:
            return jvm.select("doc_id", "score", "proximity", "snippet_locs")
        return part.mapInPandas(kernel, RESULT_SCHEMA)

    def _jvm_f32_batch(
        self, part: DataFrame, qinfo: dict[str, tuple]
    ) -> DataFrame | None:
        """JVM twin of the batched f32 scorer kernel
        (riot_spark/jvm/FlatQuery.scala::searchF32Batch): the matched
        postings stay executor-side — each (query_id, doc_id)-sorted
        partition is walked group-by-group inside the JVM, scoring
        BM25 (bit-exact float32, idf fixed driver-side exactly as the
        block kernels do) plus the proximity DP with snippet path.
        Returns None when riotspark.jar is absent, and the pandas
        kernel takes over.  Differential-tested in
        tests/test_jvm_flat.py."""
        idx = self.index
        spark = self._spark()
        if not _flat_jvm_available(spark):
            return None
        p = idx.config.bm25
        n_docs = idx.n_docs
        qids_l, toks_l, idf_l, dfs_l, nkw_l = [], [], [], [], []
        for qid, (tok_list, _tok_order, df_list, n_kw) in qinfo.items():
            qids_l.append(qid)
            toks_l.append(list(tok_list))
            idf_l.append(
                [
                    float(np.float32(np.log2(n_docs / df + 1.0)))
                    if df > 0
                    else 0.0
                    for df in df_list
                ]
            )
            dfs_l.append([int(d) for d in df_list])
            nkw_l.append(int(n_kw))
        cols = [
            F.col("query_id").cast("string"),
            F.col("doc_id").cast("long"),
            F.col("term").cast("string"),
            F.col("tf").cast("float"),
            F.col("positions").cast("array<int>"),
            F.col("token_len").cast("float"),
            F.col("is_label").cast("boolean"),
        ]
        jdf = spark._jvm.riotspark.FlatQuery.searchF32Batch(
            part.select(cols)._jdf,
            qids_l, toks_l, idf_l, dfs_l, nkw_l,
            float(p.k1), float(p.b), float(idx.avgdl),
            idx.config.index_type == LOCS_INDEX,
        )
        return DataFrame(jdf, spark)

    # ------------------------------------------------------------ logic ops

    def _doc_set(self, terms: list[str], doc_ids: list[int] | None = None) -> DataFrame:
        """(doc_id) matching ANY of terms — union of posting lists."""
        return self._matched(terms, doc_ids).select("doc_id").distinct()

    def _logic_lookup(self, req: SearchRequest) -> DataFrame | None:
        """LogicLookup (core/indexer.go:561-685): unscored set algebra.

        must  = AND intersection (inner joins / grouped count)
        should= >=1 hit (union, distinct)
        notIn = anti-join
        notIn-only quirk: riot returns the notIn docs themselves
        (indexer.go:660-682) — reproduced (deduplicated).
        """
        idx = self.index
        present = idx.lookup_terms(
            list(set(req.must) | set(req.should) | set(req.not_in))
        )
        if req.must:
            if any(t not in present for t in req.must):
                return None
            cand = (
                self._qpart(self._matched(req.must, req.doc_ids), "doc_id")
                .groupBy("doc_id")
                .agg(self._n_match().alias("nm"))
                .where(F.col("nm") == len(set(req.must)))
                .select("doc_id")
            )
            if req.should:
                should_present = [t for t in req.should if t in present]
                if not should_present:
                    return self._empty().select("doc_id")
                cand = cand.join(
                    self._doc_set(should_present), "doc_id", "left_semi"
                )
        elif req.should:
            should_present = [t for t in req.should if t in present]
            if not should_present:
                return None
            cand = self._doc_set(should_present, req.doc_ids)
        elif req.not_in:
            ni = [t for t in req.not_in if t in present]
            if not ni:
                return self._empty().select("doc_id")
            return self._doc_set(ni, req.doc_ids)
        else:
            return None
        if req.not_in:
            ni = [t for t in req.not_in if t in present]
            if ni:
                cand = cand.join(self._doc_set(ni), "doc_id", "left_anti")
        return cand

    # --------------------------------------------------------------- search

    def search(self, req: SearchRequest) -> DataFrame:
        """Returns (doc_id, score, proximity, snippet_locs) ranked
        `score desc, doc_id asc` (deterministic tie policy, SURVEY §2.9.5),
        sliced [offset, offset+max_outputs).

        count_docs_only => single-row (num_docs LONG).
        orderless       => unranked candidate rows (Q15).
        """
        is_logic = bool(req.must or req.should or req.not_in)
        if is_logic:
            cand = self._logic_lookup(req)
            if cand is None:
                result = self._empty()
            else:
                result = cand.select(
                    "doc_id",
                    F.lit(0.0).cast("float").alias("score"),
                    F.lit(None).cast("int").alias("proximity"),
                    F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("snippet_locs"),
                )
        else:
            tokens = req.all_tokens()
            keywords = tokens + list(req.labels)
            n_kw = len(set(keywords))
            matched = self._candidates_and(keywords, req.doc_ids)
            if matched is None or not keywords:
                result = self._empty()
            elif req.orderless:
                return (
                    self._qpart(matched, "doc_id")
                    .groupBy("doc_id")
                    .agg(self._n_match().alias("nm"))
                    .where(F.col("nm") == n_kw)
                    .select("doc_id")
                )
            elif req.scorer == "float32":
                result = self._score_float32(matched, tokens, n_kw)
            else:
                result = self._score_native(
                    matched, tokens, n_kw, double_scores=req.double_scores
                )

        if req.count_docs_only:
            return result.agg(F.count("*").alias("num_docs"))

        if req.criteria == "proximity":
            result = result.withColumn(
                "score",
                F.when(
                    F.col("proximity") >= 0,
                    (F.lit(1.0) / (F.col("proximity") + 1.0)).cast("float"),
                ).otherwise(F.lit(0.0).cast("float")),
            )
        elif callable(req.criteria):
            fn = req.criteria

            def apply_criteria(batches):
                for pdf in batches:
                    scores = fn(pdf)
                    pdf = pdf.assign(score=scores.astype("float32"))
                    yield pdf[scores.notna().to_numpy()]

            result = result.mapInPandas(apply_criteria, RESULT_SCHEMA)

        order = (
            [F.asc("score"), F.desc("doc_id")]
            if req.reverse_order
            else [F.desc("score"), F.asc("doc_id")]
        )
        result = result.orderBy(*order)
        if req.max_outputs:
            # Spark compiles orderBy().limit() to per-partition partial
            # top-k + TakeOrderedAndProject — riot's Q11/Q12 for free.
            result = result.limit(req.offset + req.max_outputs)
        if req.offset:
            result = result.offset(req.offset)
        return result

    # ---------------------------------------------------------- hydration

    #: hydrate() collects the ranked side when it is at most this many
    #: rows; top-k searches are always far below it.
    HYDRATE_COLLECT_CAP = 65536

    @staticmethod
    def hydrate(
        results: DataFrame,
        documents: DataFrame,
        *doc_cols: str,
        collect_cap: int | None = None,
    ) -> DataFrame:
        """Join ranked results back to the documents table — riot's
        ranker side-store fills SearchResp.Docs with content/attri
        (core/ranker.go:28-41, types/search_response.go:42); here the
        documents DataFrame IS the store.  `doc_cols` picks the
        payload columns (default: all).

        Scale: the ranked side is ~k rows but `documents` is the
        full corpus, so a plain join would shuffle the entire table to
        hydrate k rows.  Instead the ranked rows are collected (≤k —
        the same O(small) driver hop the block engine's
        rank-then-hydrate makes for proximity winners), `doc_id IN
        (...)` is pushed into the documents scan for row-group /
        partition pruning, and the collected rows broadcast-join back.
        Every indexed doc exists in `documents` by construction (the
        side-store is populated at index time, core/ranker.go:28-41),
        so the inner join is exact.  An unbounded ranked side (more
        than `collect_cap` rows) falls back to a plain inner join and
        lets AQE pick the strategy."""
        if collect_cap is None:
            collect_cap = SearchEngine.HYDRATE_COLLECT_CAP
        payload = (
            documents.select("doc_id", *doc_cols) if doc_cols else documents
        )
        rows = results.limit(collect_cap + 1).collect()
        if len(rows) > collect_cap:
            return results.join(payload, "doc_id", "inner")
        spark = documents.sparkSession
        ranked = spark.createDataFrame(rows, results.schema)
        ids = [r["doc_id"] for r in rows]
        payload = payload.where(F.col("doc_id").isin(ids))
        return F.broadcast(ranked).join(payload, "doc_id", "inner")

    # --------------------------------------------------------------- batch

    def search_batch(
        self, requests: dict[str, SearchRequest], double_scores: bool = False
    ) -> DataFrame:
        """Dedup identical request shapes, execute unique ones via
        :meth:`_search_batch_exec`, fan results back out with a
        broadcast mapping join.  Real query logs repeat heavily
        (popular queries), and a duplicated hot query would otherwise
        re-pay its full postings aggregation."""
        def key(req: SearchRequest):
            return (
                tuple(sorted(set(req.all_tokens()))),
                tuple(sorted(req.labels)),
                tuple(sorted(set(req.must))),
                tuple(sorted(set(req.should))),
                tuple(sorted(set(req.not_in))),
                None if req.doc_ids is None else tuple(sorted(req.doc_ids)),
                req.offset,
                req.max_outputs,
                req.reverse_order,
                req.count_docs_only,
                req.orderless,
                req.scorer,
                req.criteria if isinstance(req.criteria, str) else id(req.criteria),
            )

        groups: dict[tuple, list[str]] = {}
        for qid, req in requests.items():
            groups.setdefault(key(req), []).append(qid)

        # default executor: the packed block path when a blocked twin
        # is attached (flat is the fallback, not the default —
        # attach_blocks).  A mixed batch splits: block-batchable
        # shapes ride the packed kernel, the rest (callable criteria,
        # rare logic combos) run through the flat executor in the
        # same call, and the two result sets union — nothing raises.
        def run(reps: dict[str, SearchRequest]) -> DataFrame:
            if self._blocks is None:
                return self._search_batch_exec(reps, double_scores)
            blk = {
                qid: r
                for qid, r in reps.items()
                if self._block_batchable(r, self._blocks.has_positions)
            }
            if not blk:
                return self._search_batch_exec(reps, double_scores)
            if self._block_engine_inst is None:
                from riot_spark.blocks import BlockSearchEngine

                self._block_engine_inst = BlockSearchEngine(self._blocks)
            bres = self._block_engine_inst.search_batch(
                blk, double_scores=double_scores
            )
            flat = {qid: r for qid, r in reps.items() if qid not in blk}
            if not flat:
                return bres
            score_t = "double" if double_scores else "float"
            fres = self._search_batch_exec(flat, double_scores).withColumn(
                "score", F.col("score").cast(score_t)
            )
            return bres.unionByName(fres)

        if all(len(v) == 1 for v in groups.values()):
            return run(requests)
        reps = {v[0]: requests[v[0]] for v in groups.values()}
        res = run(reps)
        mapping = [(v[0], qid) for v in groups.values() for qid in v]
        mdf = self._spark().createDataFrame(
            mapping, "rep_id STRING, query_id STRING"
        )
        return (
            res.withColumnRenamed("query_id", "rep_id")
            .join(F.broadcast(mdf), "rep_id")
            .select("query_id", "doc_id", "score", "rank")
        )

    # A per-query ranking funnel only matters when one reducer could
    # see a huge candidate set; below this bound the final window's
    # per-query sort is trivially small and the partial pass is pure
    # overhead (~0.3 s of Arrow round-trip at any scale).  Candidate
    # counts are bounded driver-side from the term dfs, so cold
    # batches skip the pass entirely and a single hot query turns it
    # on for its shape family.
    PARTIAL_TOPK_MIN_DF = 200_000

    @staticmethod
    def _candidate_bound(req, dfs: dict[str, int]) -> int:
        """Upper bound on a request's candidate-set size from term
        document frequencies: AND intersects (min df); should-only
        unions (sum); notIn-only returns the notIn docs (sum); a
        DocIds whitelist caps everything at its length."""
        cap = (
            len(req.doc_ids)
            if getattr(req, "doc_ids", None) is not None
            else None
        )

        def capped(n: int) -> int:
            return n if cap is None else min(n, cap)

        must = sorted(set(req.must))
        if must:
            return capped(min(dfs.get(t, 0) for t in must))
        if req.should:
            return capped(sum(dfs.get(t, 0) for t in set(req.should)))
        if req.not_in:
            return capped(sum(dfs.get(t, 0) for t in set(req.not_in)))
        toks = req.all_tokens() + [t for t in req.labels]
        if toks:
            return capped(min(dfs.get(t, 0) for t in set(toks)))
        return 0

    @classmethod
    def _needs_partial(cls, requests: dict, dfs: dict[str, int]) -> bool:
        """Insert the skew-proof pre-reduction only when some k>0
        request could flood its reducer (candidate bound >= the df
        threshold)."""
        return any(
            req.max_outputs
            and cls._candidate_bound(req, dfs) >= cls.PARTIAL_TOPK_MIN_DF
            for req in requests.values()
        )

    @classmethod
    def _partial_topk(cls, df: DataFrame, by_score: bool = True) -> DataFrame:
        """Skew-proof partial reduction before a per-query window.

        riot's per-shard rankers each slice [0, offset+max) BEFORE the
        merge (ranker_worker.go:60-73, core/ranker.go:111-122); this is
        the batch analogue: a mapInPandas pass caps each query's
        candidates at top-(offset+k) per Arrow batch, filtering them
        WHERE THEY ALREADY ARE — no extra exchange, the rows simply
        never enter the ranking shuffle.  A hot-term query (df ~ N)
        then never funnels its full candidate set through one reducer
        task: the window sees at most n_batches*(offset+k) rows per
        query instead of the full match set.  Exact: the ordering is
        total (doc_id unique per query), so every global top-(offset+k)
        row survives its batch's cut.  Rows with k == 0 (unlimited)
        pass through uncapped.

        When riotspark.jar is present the cap runs as the JVM twin
        (FlatQuery.scala::partialTopK — per-partition bounded heaps),
        so hot candidate sets never cross into Python at all; the
        pandas pass below is the jarless fallback."""
        schema = df.schema
        cols = df.columns
        has_dir = "dir" in cols
        spark = df.sparkSession
        if _flat_jvm_available(spark):
            ix = {c: i for i, c in enumerate(cols)}
            jdf = spark._jvm.riotspark.FlatQuery.partialTopK(
                df._jdf,
                ix["query_id"], ix["doc_id"], ix.get("score", -1),
                ix["k"], ix["qoffset"], ix.get("dir", -1),
                bool(by_score),
            )
            return DataFrame(jdf, spark)

        def cap(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf
                    continue
                d = pdf["dir"] if has_dir else 1.0
                if by_score:
                    keyed = pdf.assign(
                        _k1=-(pdf["score"].astype("float64") * d),
                        _k2=pdf["doc_id"] * d,
                    )
                else:
                    keyed = pdf.assign(_k1=0.0, _k2=pdf["doc_id"])
                keyed = keyed.sort_values(
                    ["query_id", "_k1", "_k2"], kind="mergesort"
                )
                rn = keyed.groupby("query_id", sort=False).cumcount()
                keep = (keyed["k"] == 0) | (rn < keyed["qoffset"] + keyed["k"])
                yield keyed.loc[keep, cols]

        return df.mapInPandas(cap, schema)

    @classmethod
    def _rank_slice(cls, df: DataFrame, partial: bool = True) -> DataFrame:
        """Per-query window rank + [offset, offset+k) slice over rows
        (query_id, doc_id, score, k, qoffset, dir).  One window serves
        both sort directions: multiplying (score, doc_id) by dir = -1
        inverts the ordering for ReverseOrder queries without a second
        sort.  `partial` inserts the :meth:`_partial_topk` shuffle-free
        pre-reduction (skip it only when every request has k == 0,
        where no cap is possible and the pass buys nothing).
        """
        from pyspark.sql.window import Window

        order = [
            F.desc(F.col("score") * F.col("dir")),
            F.asc(F.col("doc_id") * F.col("dir")),
        ]
        if partial:
            df = cls._partial_topk(df, by_score=True)
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            df.withColumn("rank", F.row_number().over(w))
            .where(
                (F.col("rank") > F.col("qoffset"))
                & (
                    (F.col("k") == 0)
                    | (F.col("rank") <= F.col("qoffset") + F.col("k"))
                )
            )
            .select("query_id", "doc_id", "score", "rank")
        )

    def _search_batch_exec(
        self, requests: dict[str, SearchRequest], double_scores: bool = False
    ) -> DataFrame:
        """Execute MANY AND/BM25 searches as ONE DataFrame program.

        Riot answers queries one at a time, fanning each to every shard
        (engine.go:797-799) — throughput *drops* as shards grow.  The
        Spark-native shape is the inverse: amortize the scan.  All
        query terms become one tiny broadcast table; a single pass over
        the (term-pruned) postings joins, aggregates per
        (query_id, doc_id), and a window takes each query's top-k.
        Per-query cost approaches the marginal cost of its postings —
        this is the engine's QPS story at scale, and the batch path the
        bench reports.

        Nearly every request shape batches now:
        * AND + native BM25 (labels, ReverseOrder, DocIds whitelist)
          — one broadcast-join + hash-agg + window pass
        * logic must/should/notIn — one role-tagged pass
        * orderless AND — rides the logic pass as a must-query
          (rows rank by doc_id with score 0)
        * float32 / proximity / criteria='proximity' — ONE keyed Arrow
          kernel pass over all such queries
        * CountDocsOnly — one aggregate pass; emitted as a single row
          per query with doc_id = NULL, score = match count, rank = 0
        Only callable criteria and a few rare combinations (e.g.
        whitelist+orderless) fall back to per-query :meth:`search`
        subtrees (still one action).

        Returns (query_id, doc_id, score, rank) with rank 1-based per
        query in `score desc, doc_id asc` order (inverted under
        ReverseOrder), sliced per-request [offset, offset+max_outputs).
        """
        from pyspark.sql.window import Window

        idx = self.index
        p = idx.config.bm25
        spark = self._spark()

        batchable: dict[str, SearchRequest] = {}
        logic_batch: dict[str, SearchRequest] = {}
        f32_batch: dict[str, SearchRequest] = {}
        count_batch: dict[str, SearchRequest] = {}
        fallback: dict[str, SearchRequest] = {}
        for qid, req in requests.items():
            is_logic = bool(req.must or req.should or req.not_in)
            plain = not req.count_docs_only and not req.orderless
            if not is_logic:
                if req.count_docs_only and req.doc_ids is None:
                    count_batch[qid] = req
                elif (
                    req.orderless
                    and req.doc_ids is None
                    and not req.count_docs_only
                ):
                    # orderless AND == logic must-query over keywords;
                    # offset/limit intentionally NOT applied — search()
                    # returns the unranked candidate set unsliced (Q15)
                    logic_batch[qid] = SearchRequest(
                        must=req.all_tokens() + list(req.labels),
                    )
                elif plain and req.scorer == "native" and req.criteria == "bm25":
                    batchable[qid] = req
                elif (
                    plain
                    and req.scorer == "float32"
                    and req.criteria in ("bm25", "proximity")
                    and req.doc_ids is None
                ):
                    f32_batch[qid] = req
                else:
                    fallback[qid] = req
            elif (
                plain
                and not req.reverse_order
                and req.doc_ids is None
                and req.criteria == "bm25"
            ):
                logic_batch[qid] = req
            else:
                fallback[qid] = req

        out_cols = ["query_id", "doc_id", "score", "rank"]
        parts_df: list[DataFrame] = []

        if batchable:
            all_terms = set()
            for req in batchable.values():
                all_terms |= set(req.all_tokens()) | set(req.labels)
            dfs = idx.lookup_terms(list(all_terms))
            rows = []
            wl_rows = []  # (query_id, doc_id) whitelist entries (Q3)
            for qid, req in batchable.items():
                tokens = req.all_tokens()
                keywords = set(tokens) | set(req.labels)
                if any(t not in dfs for t in keywords):
                    continue  # missing keyword => empty (indexer.go:423-427)
                n_kw = len(keywords)
                if req.doc_ids is not None:
                    wl_rows.extend((qid, int(d)) for d in set(req.doc_ids))
                for t in keywords:
                    idf = (
                        math.log2(idx.n_docs / dfs[t] + 1.0)
                        if t in set(tokens)
                        else 0.0
                    )
                    rows.append(
                        (
                            qid,
                            t,
                            float(idf),
                            t in set(tokens),
                            n_kw,
                            int(req.max_outputs),
                            int(req.offset),
                            bool(req.reverse_order),
                            req.doc_ids is not None,
                        )
                    )
            if rows:
                qterms = spark.createDataFrame(
                    rows,
                    "query_id STRING, term STRING, idf DOUBLE, "
                    "is_scoring BOOLEAN, n_kw INT, k INT, qoffset INT, "
                    "rev BOOLEAN, has_wl BOOLEAN",
                )
                tf = F.col("tf").cast("double")
                dl = F.col("token_len").cast("double")
                contrib = (
                    F.col("idf")
                    * tf
                    * (p.k1 + 1.0)
                    / (tf + p.k1 * (1.0 - p.b + p.b * dl / idx.avgdl))
                )
                contrib = F.when(
                    F.col("is_scoring")
                    & ~F.col("is_label")
                    & (tf > 0)
                    & F.lit(idx.avgdl != 0.0),
                    contrib,
                ).otherwise(F.lit(0.0))
                matched = idx.postings.where(
                    F.col("term").isin(list(all_terms))
                ).join(F.broadcast(qterms), "term")
                if wl_rows:
                    # DocIds whitelist (Q3): broadcast (query, doc)
                    # membership — only whitelisted rows survive for
                    # queries that carry one
                    wl = spark.createDataFrame(
                        wl_rows, "query_id STRING, doc_id LONG"
                    ).withColumn("in_wl", F.lit(True))
                    matched = matched.join(
                        F.broadcast(wl), ["query_id", "doc_id"], "left"
                    ).where(~F.col("has_wl") | F.coalesce("in_wl", F.lit(False)))
                # partial-locations guard (indexer.go:489-507), same as
                # _score_native: under LocsIndex a scoring query token
                # whose posting is a label (or has no positions) zeroes
                # the whole doc score — batch and single-query results
                # must agree on label/token term collisions.
                locs_mode = idx.config.index_type == LOCS_INDEX
                unscorable = (
                    F.max(
                        F.when(
                            F.col("is_scoring")
                            & (
                                F.col("is_label")
                                | (F.coalesce(F.size("positions"), F.lit(0)) == 0)
                            ),
                            1,
                        ).otherwise(0)
                    )
                    if locs_mode
                    else F.max(F.lit(0))
                )
                scored = (
                    self._qpart(matched, "query_id", "doc_id")
                    .groupBy("query_id", "doc_id")
                    .agg(
                        self._n_match().alias("n_match"),
                        F.first("n_kw").alias("n_kw"),
                        F.first("k").alias("k"),
                        F.first("qoffset").alias("qoffset"),
                        F.first("rev").alias("rev"),
                        F.sum(contrib).alias("score_d"),
                        unscorable.alias("unscorable"),
                    )
                    .where(F.col("n_match") == F.col("n_kw"))
                    .withColumn(
                        "score_d",
                        F.when(F.col("unscorable") == 1, F.lit(0.0)).otherwise(
                            F.col("score_d")
                        ),
                    )
                )
                score_col = (
                    F.round(F.col("score_d"), 4)
                    if double_scores
                    else F.col("score_d").cast("float")
                )
                dir_col = F.when(F.col("rev"), F.lit(-1.0)).otherwise(F.lit(1.0))
                ranked = self._rank_slice(
                    scored.select(
                        "query_id",
                        "doc_id",
                        score_col.alias("score"),
                        "k",
                        "qoffset",
                        dir_col.alias("dir"),
                    ),
                    partial=self._needs_partial(batchable, dfs),
                )
                parts_df.append(ranked)

        if f32_batch:
            ranked = self._f32_batch_exec(f32_batch, double_scores)
            if ranked is not None:
                parts_df.append(ranked)

        if count_batch:
            counted = self._count_batch_exec(count_batch, double_scores)
            if counted is not None:
                parts_df.append(counted)

        if logic_batch:
            ranked = self._logic_batch(logic_batch)
            if ranked is not None:
                parts_df.append(ranked)

        from pyspark.sql.window import Window

        score_t = "double" if double_scores else "float"
        for qid, req in fallback.items():
            # rare combos (count+whitelist, orderless+whitelist) route
            # through per-query search() and union a count/candidate
            # row — a caller can always distinguish 'no matches' (count
            # 0 row / absent candidates after a real run) from a shape
            # error (ValueError at submit, block path)
            if req.count_docs_only:
                r = self.search(req)
                parts_df.append(
                    r.select(
                        F.lit(qid).alias("query_id"),
                        F.lit(None).cast("long").alias("doc_id"),
                        F.col("num_docs").cast("double").alias("score"),
                        F.lit(0).alias("rank"),
                    )
                )
                continue
            if req.orderless:
                r = self.search(req)
                parts_df.append(
                    r.select(
                        F.lit(qid).alias("query_id"),
                        "doc_id",
                        F.lit(0.0).cast(score_t).alias("score"),
                        F.row_number()
                        .over(
                            Window.partitionBy(F.lit(1)).orderBy(
                                F.asc("doc_id")
                            )
                        )
                        .alias("rank"),
                    )
                )
                continue
            r = self.search(req)
            if set(r.columns) == {"doc_id"}:
                # logic-shaped fallback (e.g. logic + whitelist): emit
                # candidate rows exactly like the batched logic family
                # (score 0, ranked by doc_id, rank continuing past the
                # offset) — never silently dropped
                parts_df.append(
                    r.select(
                        F.lit(qid).alias("query_id"),
                        "doc_id",
                        F.lit(0.0).cast(score_t).alias("score"),
                        (
                            F.row_number().over(
                                Window.partitionBy(F.lit(1)).orderBy(
                                    F.asc("doc_id")
                                )
                            )
                            + F.lit(int(req.offset))
                        ).alias("rank"),
                    )
                )
                continue
            parts_df.append(
                r.select(
                    F.lit(qid).alias("query_id"),
                    "doc_id",
                    (
                        F.round(F.col("score").cast("double"), 4)
                        if double_scores
                        else F.col("score")
                    ).alias("score"),
                    (
                        F.row_number().over(
                            Window.partitionBy(F.lit(1)).orderBy(
                                F.desc("score"), F.asc("doc_id")
                            )
                        )
                        + F.lit(int(req.offset))
                    ).alias("rank"),
                )
            )

        if not parts_df:
            return spark.createDataFrame(
                [],
                "query_id STRING, doc_id LONG, score FLOAT, rank INT",
            )
        has_counts = bool(count_batch) or any(
            r.count_docs_only for r in fallback.values()
        )
        if has_counts and not double_scores:
            # count rows are exact DOUBLEs; widen the float32 score
            # rows to match (float->double widening is value-exact, so
            # the riot-bit-exact scores are unchanged)
            parts_df = [
                p.withColumn("score", F.col("score").cast("double"))
                for p in parts_df
            ]
        out = parts_df[0]
        for d in parts_df[1:]:
            out = out.unionByName(d)
        return out

    def _f32_batch_exec(
        self, requests: dict[str, SearchRequest], double_scores: bool = False
    ) -> DataFrame | None:
        """All float32 / proximity / criteria='proximity' queries as
        ONE keyed Arrow kernel pass.

        Postings join a broadcast (query_id, term) table, repartition
        on (query_id, doc_id) with a local sort, and a single
        mapInPandas kernel scores each query's candidates via the
        shared `_f32_score_pdf` (bit-exact float32 + proximity DP).
        Proximity criteria then rewrites scores columnar, and one
        window ranks + slices every query.
        """

        idx = self.index
        spark = self._spark()
        params = idx.config.bm25
        n_docs, avgdl = idx.n_docs, idx.avgdl
        locs_mode = idx.config.index_type == LOCS_INDEX

        all_kw: set[str] = set()
        for req in requests.values():
            all_kw |= set(req.all_tokens()) | set(req.labels)
        dfs = idx.lookup_terms(list(all_kw))
        qinfo: dict[str, tuple] = {}
        rows = []
        meta_rows = []  # (query_id, k, qoffset, rev, prox_crit)
        for qid, req in requests.items():
            tokens = req.all_tokens()
            keywords = set(tokens) | set(req.labels)
            if not keywords or any(t not in dfs for t in keywords):
                continue  # missing keyword => empty
            tok_order = {t: i for i, t in enumerate(tokens)}
            df_list = [dfs.get(t, 0) for t in tokens]
            qinfo[qid] = (list(tokens), tok_order, df_list, len(keywords))
            rows.extend((qid, t) for t in keywords)
            meta_rows.append(
                (
                    qid,
                    int(req.max_outputs),
                    int(req.offset),
                    bool(req.reverse_order),
                    req.criteria == "proximity",
                )
            )
        if not rows:
            return None
        qterms = spark.createDataFrame(rows, "query_id STRING, term STRING")
        matched = idx.postings.where(
            F.col("term").isin(sorted({t for _, t in rows}))
        ).join(F.broadcast(qterms), "term")
        need = [
            "query_id", "doc_id", "term", "tf", "positions",
            "token_len", "is_label",
        ]
        out_schema = (
            "query_id STRING, doc_id LONG, score FLOAT, proximity INT, "
            "snippet_locs ARRAY<INT>"
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def run(body: pd.DataFrame) -> Iterator[pd.DataFrame]:
                for qid, sub in body.groupby("query_id", sort=False):
                    info = qinfo.get(qid)
                    if info is None:
                        continue
                    tok_list, tok_order, df_list, n_kw = info
                    out = _f32_score_pdf(
                        sub, tok_list, tok_order, df_list, n_kw,
                        locs_mode, params, n_docs, avgdl,
                    )
                    if out is not None:
                        out.insert(0, "query_id", qid)
                        yield out

            held: pd.DataFrame | None = None
            for pdf in batches:
                pdf = pdf[need]
                if held is not None:
                    pdf = pd.concat([held, pdf], ignore_index=True)
                tail_q = pdf["query_id"].iloc[-1]
                tail_d = pdf["doc_id"].iloc[-1]
                tail_mask = (
                    (pdf["query_id"] == tail_q) & (pdf["doc_id"] == tail_d)
                ).to_numpy()
                held = pdf[tail_mask]
                body = pdf[~tail_mask]
                if len(body):
                    yield from run(body)
            if held is not None and len(held):
                yield from run(held)

        nparts = getattr(idx.config, "query_agg_partitions", 0)
        part = (
            matched.repartition(nparts, "query_id", "doc_id")
            if nparts
            else matched.repartition("query_id", "doc_id")
        ).sortWithinPartitions("query_id", "doc_id")
        res = self._jvm_f32_batch(part, qinfo)
        if res is None:
            res = part.mapInPandas(kernel, out_schema)

        meta = spark.createDataFrame(
            meta_rows,
            "query_id STRING, k INT, qoffset INT, rev BOOLEAN, prox BOOLEAN",
        )
        res = res.join(F.broadcast(meta), "query_id")
        # RankByTokenProximity criteria: score = 1/(proximity+1)
        score = F.when(
            F.col("prox"),
            F.when(
                F.col("proximity") >= 0,
                (F.lit(1.0) / (F.col("proximity") + 1.0)).cast("float"),
            ).otherwise(F.lit(0.0).cast("float")),
        ).otherwise(F.col("score"))
        score = (
            F.round(score.cast("double"), 4) if double_scores else score
        )
        dir_col = F.when(F.col("rev"), F.lit(-1.0)).otherwise(F.lit(1.0))
        return self._rank_slice(
            res.select(
                "query_id", "doc_id", score.alias("score"),
                "k", "qoffset", dir_col.alias("dir"),
            ),
            partial=self._needs_partial(requests, dfs),
        )

    def _count_batch_exec(
        self, requests: dict[str, SearchRequest], double_scores: bool = False
    ) -> DataFrame | None:
        """All CountDocsOnly AND-queries as one aggregate pass.

        Emitted into the ranked shape as one row per query:
        (query_id, doc_id = NULL, score = match count, rank = 0) —
        riot's SearchResp.NumDocs (core/indexer.go:550-553).  Counts
        ride the score column as exact DOUBLEs even in a float32
        batch: float32 rounds counts above 2^24 (~16.7M docs, routine
        at target scale), double is exact to 2^53; the caller widens
        the float rows at the union (value-exact)."""
        idx = self.index
        spark = self._spark()
        all_kw: set[str] = set()
        for req in requests.values():
            all_kw |= set(req.all_tokens()) | set(req.labels)
        dfs = idx.lookup_terms(list(all_kw))
        rows = []
        zero_qids = []
        for qid, req in requests.items():
            keywords = set(req.all_tokens()) | set(req.labels)
            if not keywords or any(t not in dfs for t in keywords):
                zero_qids.append(qid)  # missing keyword => count 0
                continue
            rows.extend((qid, t, len(keywords)) for t in keywords)
        score_t = "DOUBLE"  # counts never round-trip through float32
        out = None
        if rows:
            qterms = spark.createDataFrame(
                rows, "query_id STRING, term STRING, n_kw INT"
            )
            matched = idx.postings.where(
                F.col("term").isin(sorted({r[1] for r in rows}))
            ).join(F.broadcast(qterms), "term")
            counts = (
                self._qpart(matched, "query_id", "doc_id")
                .groupBy("query_id", "doc_id")
                .agg(self._n_match().alias("nm"), F.first("n_kw").alias("n_kw"))
                .where(F.col("nm") == F.col("n_kw"))
                .groupBy("query_id")
                .agg(F.count("*").alias("cnt"))
            )
            # queries whose intersection is empty still get a 0 row
            all_qids = spark.createDataFrame(
                [(q,) for q in requests if q not in zero_qids],
                "query_id STRING",
            )
            out = (
                all_qids.join(counts, "query_id", "left")
                .select(
                    "query_id",
                    F.lit(None).cast("long").alias("doc_id"),
                    F.coalesce("cnt", F.lit(0)).cast(score_t).alias("score"),
                    F.lit(0).alias("rank"),
                )
            )
        if zero_qids:
            zeros = spark.createDataFrame(
                [(q,) for q in zero_qids], "query_id STRING"
            ).select(
                "query_id",
                F.lit(None).cast("long").alias("doc_id"),
                F.lit(0).cast(score_t).alias("score"),
                F.lit(0).alias("rank"),
            )
            out = zeros if out is None else out.unionByName(zeros)
        return out

    def _logic_batch(self, requests: dict[str, SearchRequest]) -> DataFrame | None:
        """All must/should/notIn queries as one job (LogicLookup Q7,
        core/indexer.go:561-685, batched).

        Role-tagged broadcast query-terms table; one pass counts per
        (query, doc) how many must/should/not terms hit, then the
        riot predicate applies columnar:
          must complete AND (no should requested OR >=1 should hit)
          AND no notIn hit — except the notIn-only quirk, where the
        notIn docs themselves are returned (indexer.go:660-682).
        Logic results carry no BM25 (score 0, ranked by doc_id)."""
        from pyspark.sql.window import Window

        idx = self.index
        spark = self._spark()
        all_terms = set()
        for req in requests.values():
            all_terms |= set(req.must) | set(req.should) | set(req.not_in)
        dfs = idx.lookup_terms(list(all_terms))
        rows = []  # (qid, term, role, n_must, has_should, notin_only, k, off)
        for qid, req in requests.items():
            must = sorted(set(req.must))
            should = sorted(set(t for t in req.should if t in dfs))
            notin = sorted(set(t for t in req.not_in if t in dfs))
            if any(t not in dfs for t in must):
                continue  # missing must term => empty
            if req.should and not should:
                continue  # all should terms absent => empty
            notin_only = not must and not req.should
            if notin_only and not notin:
                continue
            for role, terms in (("m", must), ("s", should), ("n", notin)):
                for t in terms:
                    rows.append(
                        (
                            qid,
                            t,
                            role,
                            len(must),
                            bool(should),
                            notin_only,
                            int(req.max_outputs),
                            int(req.offset),
                        )
                    )
        if not rows:
            return None
        qterms = spark.createDataFrame(
            rows,
            "query_id STRING, term STRING, role STRING, n_must INT, "
            "has_should BOOLEAN, notin_only BOOLEAN, k INT, qoffset INT",
        )
        matched = idx.postings.where(
            F.col("term").isin(sorted({r[1] for r in rows}))
        ).join(F.broadcast(qterms), "term")
        role_hit = (
            (lambda r: F.when(F.col("role") == r, F.col("term")))
            if getattr(idx, "has_labels", True)
            else (lambda r: F.when(F.col("role") == r, F.lit(1)))
        )
        count_role = (
            F.count_distinct if getattr(idx, "has_labels", True) else F.count
        )
        grouped = self._qpart(matched, "query_id", "doc_id").groupBy(
            "query_id", "doc_id"
        ).agg(
            count_role(role_hit("m")).alias("nm"),
            count_role(role_hit("s")).alias("ns"),
            count_role(role_hit("n")).alias("nn"),
            F.first("n_must").alias("n_must"),
            F.first("has_should").alias("has_should"),
            F.first("notin_only").alias("notin_only"),
            F.first("k").alias("k"),
            F.first("qoffset").alias("qoffset"),
        )
        keep = F.when(
            F.col("notin_only"), F.col("nn") > 0
        ).otherwise(
            (F.col("nm") == F.col("n_must"))
            & (~F.col("has_should") | (F.col("ns") > 0))
            & (F.col("nn") == 0)
        )
        kept = grouped.where(keep).select(
            "query_id",
            "doc_id",
            F.lit(0.0).cast("float").alias("score"),
            "k",
            "qoffset",
        )
        if self._needs_partial(requests, dfs):
            # skew-proof phase 1 (same shape as _rank_slice): a hot
            # must-term never ranks its full doc set in one task
            kept = self._partial_topk(kept, by_score=False)
        w = Window.partitionBy("query_id").orderBy(F.asc("doc_id"))
        return (
            kept
            .withColumn("rank", F.row_number().over(w))
            .where(
                (F.col("rank") > F.col("qoffset"))
                & (
                    (F.col("k") == 0)
                    | (F.col("rank") <= F.col("qoffset") + F.col("k"))
                )
            )
            .select("query_id", "doc_id", "score", "rank")
        )
