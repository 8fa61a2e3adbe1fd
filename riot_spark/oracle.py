"""Pure-Python riot oracle — float32-exact reimplementation of the
reference's read path (core/indexer.go:417-558 internalLookup + BM25,
core/indexer.go:723-813 computeTokenProximity), with NumShards=1
statistics (SURVEY.md §2.9.4).

Used two ways:
* pytest ground truth: Spark results must be rank-identical with
  matching float32 scores on the fixture corpora.
* the scoring/proximity kernels are imported by the engine's
  float32-parity pandas UDF so engine and oracle share one float32
  accumulation path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from riot_spark.config import BM25Params, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.tokenizer import tokenize_text


def bm25_score_f32(
    tfs: list[float],
    dfs: list[int],
    doc_len: float,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
    index_type: int = LOCS_INDEX,
) -> np.float32:
    """Per-doc BM25, float32 step-for-step like core/indexer.go:523-547.

    tfs/dfs are aligned to query-token order (accumulation order
    matters in float32). idf is computed in float64 then truncated to
    float32, exactly like Go's float32(math.Log2(float64(N)/float64(df)+1)).
    A zero tf contributes nothing (label-origin match, guard
    indexer.go:537-538).
    """
    k1 = np.float32(params.k1)
    b = np.float32(params.b)
    d = np.float32(doc_len)
    avg = np.float32(avgdl)
    score = np.float32(0.0)
    if avg == np.float32(0.0):
        return score
    one = np.float32(1.0)
    for tf, df in zip(tfs, dfs):
        f = np.float32(tf)
        if df > 0 and f > 0:
            idf = np.float32(np.log2(float(n_docs) / float(df) + 1.0))
            score = np.float32(
                score + idf * f * (k1 + one) / (f + k1 * (one - b + b * d / avg))
            )
    return score


def bm25_score_f32_vec(
    tf_cols: list[np.ndarray],
    dfs: list[int],
    doc_lens: np.ndarray,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
) -> np.ndarray:
    """Vectorized twin of :func:`bm25_score_f32`: scores a whole
    candidate array at once.  Elementwise float32 ops in query-token
    order are bit-identical to the scalar loop (verified by test)."""
    k1 = np.float32(params.k1)
    b = np.float32(params.b)
    one = np.float32(1.0)
    d = doc_lens.astype(np.float32)
    avg = np.float32(avgdl)
    scores = np.zeros(d.shape, dtype=np.float32)
    if avg == np.float32(0.0):
        return scores
    for tf, df in zip(tf_cols, dfs):
        if df <= 0:
            continue
        f = tf.astype(np.float32)
        idf = np.float32(np.log2(float(n_docs) / float(df) + 1.0))
        contrib = idf * f * (k1 + one) / (f + k1 * (one - b + b * d / avg))
        scores = np.where(f > 0, (scores + contrib).astype(np.float32), scores)
    return scores


def bm25_score_f64_vec(
    tf_cols: list[np.ndarray],
    dfs: list[int],
    doc_lens: np.ndarray,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
) -> np.ndarray:
    """Float64 twin of :func:`bm25_score_f32_vec` — matches the SQL
    oracle's double-precision sum (round(4) on both sides makes
    accumulation-order ulps irrelevant).  Used by the block batch
    executor when double_scores is requested for oracle parity."""
    d = doc_lens.astype(np.float64)
    scores = np.zeros(d.shape, dtype=np.float64)
    if avgdl == 0.0:
        return scores
    k1, b = float(params.k1), float(params.b)
    for tf, df in zip(tf_cols, dfs):
        if df <= 0:
            continue
        f = tf.astype(np.float64)
        idf = np.log2(float(n_docs) / float(df) + 1.0)
        contrib = idf * f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * d / avgdl))
        scores = np.where(f > 0, scores + contrib, scores)
    return scores


def token_proximity(
    positions_per_token: list[list[int]], tokens: list[str]
) -> tuple[int, list[int]]:
    """min over position choices of sum |P_{i+1} - P_i - len(token_i)|,
    len in BYTES (computeTokenProximity, core/indexer.go:723-813;
    docs/en/token_proximity.md). Returns (proximity, chosen positions).
    """
    n = len(tokens)
    if n == 0 or any(not p for p in positions_per_token):
        return -1, []
    if n == 1:
        return 0, [positions_per_token[0][0]]

    tok_bytes = [len(t.encode("utf-8")) for t in tokens]
    cur_locs = positions_per_token[0]
    cur_min = [0] * len(cur_locs)
    path: list[list[int]] = [[] for _ in range(n)]
    for i in range(1, n):
        nxt = positions_per_token[i]
        nxt_min = [-1] * len(nxt)
        path[i] = [0] * len(nxt)
        i_next = 0
        for i_cur, cur_loc in enumerate(cur_locs):
            if cur_min[i_cur] == -1:
                continue
            while i_next + 1 < len(nxt) and nxt[i_next + 1] < cur_loc:
                i_next += 1
            for to in (i_next, i_next + 1):
                if to >= len(nxt):
                    continue
                value = cur_min[i_cur] + abs(nxt[to] - cur_locs[i_cur] - tok_bytes[i - 1])
                if nxt_min[to] == -1 or value < nxt_min[to]:
                    nxt_min[to] = value
                    path[i][to] = i_cur
        cur_locs, cur_min = nxt, nxt_min

    best = -1
    cursor = 0
    for i, v in enumerate(cur_min):
        if v == -1:
            continue
        if best == -1 or v < best:
            best, cursor = v, i
    locs = [0] * n
    for i in range(n - 1, -1, -1):
        if i != n - 1:
            cursor = path[i + 1][cursor]
        locs[i] = positions_per_token[i][cursor]
    return best, locs


@dataclass
class OracleIndex:
    """In-memory inverted index over a tiny corpus (test fixtures)."""

    # term -> {doc_id -> positions}; label terms have positions == []
    table: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    # term -> {doc_id -> stored tf} (FrequenciesIndex path)
    freqs: dict[str, dict[int, float]] = field(default_factory=dict)
    doc_lens: dict[int, float] = field(default_factory=dict)
    params: BM25Params = field(default_factory=BM25Params)
    index_type: int = LOCS_INDEX
    doc_len_mode: str = "distinct"

    def add_doc(
        self,
        doc_id: int,
        text: str | None = None,
        tokens: list[tuple[str, list[int]]] | None = None,
        labels: list[str] | None = None,
        token_len: float | None = None,
    ) -> None:
        if tokens is None:
            tokens = tokenize_text(text or "")
        for term, locs in tokens:
            self.table.setdefault(term, {})[doc_id] = list(locs)
            self.freqs.setdefault(term, {})[doc_id] = float(len(locs))
        for lab in labels or []:
            self.table.setdefault(lab, {}).setdefault(doc_id, [])
            self.freqs.setdefault(lab, {}).setdefault(doc_id, 0.0)
        if token_len is None:
            token_len = (
                float(len(tokens))
                if self.doc_len_mode == "distinct"
                else float(sum(len(p) for _, p in tokens))
            )
        self.doc_lens[doc_id] = token_len

    @property
    def n_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def avgdl(self) -> float:
        if not self.doc_lens:
            return 0.0
        # riot: totalTokenLen float32 / float32(numDocs)
        total = np.float32(0.0)
        for v in self.doc_lens.values():
            total = np.float32(total + np.float32(v))
        return float(np.float32(total / np.float32(self.n_docs)))

    def lookup(
        self,
        tokens: list[str],
        labels: list[str] | None = None,
        doc_ids: set[int] | None = None,
    ) -> list[dict]:
        """AND intersection + BM25 (+ proximity in LocsIndex mode).

        Returns [{doc_id, score (np.float32), proximity, snippet_locs}]
        unsorted (ranking is the caller's concern — tie policy
        `score desc, doc_id asc`).
        """
        keywords = list(tokens) + list(labels or [])
        if not keywords:
            return []
        for kw in keywords:
            if kw not in self.table:
                return []  # missing keyword => empty (indexer.go:423-427)
        base = set(self.table[keywords[0]])
        for kw in keywords[1:]:
            base &= set(self.table[kw])
        if doc_ids is not None:
            base &= doc_ids

        out = []
        for doc in sorted(base):
            locs_per_tok = [self.table[t][doc] for t in tokens]
            rec: dict = {"doc_id": doc, "score": np.float32(0.0),
                         "proximity": -1, "snippet_locs": []}
            if self.index_type == LOCS_INDEX:
                if any(len(p) == 0 for p in locs_per_tok):
                    # partial-locations guard: doc returned, zero score
                    # (indexer.go:489-507)
                    out.append(rec)
                    continue
                prox, chosen = token_proximity(locs_per_tok, tokens)
                rec["proximity"] = prox
                rec["snippet_locs"] = chosen
                tfs = [float(len(p)) for p in locs_per_tok]
            else:
                tfs = [self.freqs[t].get(doc, 0.0) for t in tokens]
            if self.index_type in (LOCS_INDEX, FREQUENCIES_INDEX):
                dfs = [len(self.table[t]) for t in tokens]
                rec["score"] = bm25_score_f32(
                    tfs, dfs, self.doc_lens[doc], self.n_docs, self.avgdl,
                    self.params, self.index_type,
                )
            out.append(rec)
        return out

    def rank(
        self,
        tokens: list[str],
        labels: list[str] | None = None,
        doc_ids: set[int] | None = None,
        offset: int = 0,
        limit: int = 0,
        reverse: bool = False,
    ) -> list[dict]:
        docs = self.lookup(tokens, labels, doc_ids)
        key = (lambda r: (float(r["score"]), -r["doc_id"]))
        docs.sort(key=key, reverse=not reverse)
        if limit:
            return docs[offset : offset + limit]
        return docs[offset:] if offset else docs
