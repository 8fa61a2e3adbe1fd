"""Index build — the write path (SURVEY.md §2.3, §3.2).

The inverted index is a *derived columnar table*:

    documents --tokenize--> tokens(doc_id, term, tf, positions)
      --repartitionByRange(term)--> postings (term-partitioned,
        docId-sorted within term, token_len denormalized)
    + doc_stats(doc_id, token_len)
    + term_stats(term, df)
    + global stats (N, avgdl) — broadcast to scorers

Riot shards by *doc* hash and fans every query to every shard
(engine.go:862-865, 797-799); we partition by *term* so a query touches
only its terms' partitions — the design pivot that makes QPS scale with
cluster size instead of inversely (BASELINE.md shard-tradeoff note).

``token_len`` is denormalized into postings rows so BM25 scoring needs
no join against doc_stats at query time — at 10^12 docs that join is a
full shuffle; one extra float column in the index buys its elimination.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from riot_spark.config import (
    DEFAULT_CONFIG,
    DOC_IDS_INDEX,
    EngineConfig,
    FREQUENCIES_INDEX,
)
from riot_spark.tokenizer import (
    doc_length_col,
    doc_lengths,
    label_tokens,
    tokenize_freq,
    tokenize_locs,
)


class Index:
    """A built index: DataFrames + broadcast-able global stats.

    Global statistics are computed once over the whole corpus —
    NumShards=1 semantics (SURVEY.md §2.9.4); riot computes them per
    shard (core/indexer.go:445), which makes scores depend on shard
    count. Ours never do.

    (N, avgdl) are LAZY: the build itself is a single one-shuffle job
    and the stats piggyback on it via ``df.observe`` — zero extra
    passes when the postings are materialized first (the normal flow).
    If a caller asks for stats before any action ran, a one-scan
    doc_stats aggregate computes them on demand.
    """

    def __init__(
        self,
        postings: DataFrame,  # (term, doc_id, tf, positions, token_len, is_label)
        doc_stats: DataFrame,  # (doc_id, token_len)
        term_stats: DataFrame,  # (term, df)
        config: EngineConfig,
        n_docs: int | None = None,
        avgdl: float | None = None,
        observation: Observation | None = None,
        has_labels: bool = False,
    ):
        self.postings = postings
        self.doc_stats = doc_stats
        self.term_stats = term_stats
        self.config = config
        # When False, postings are guaranteed one-row-per-(term, doc)
        # and intersection can count rows instead of distinct terms —
        # count(*) stays on the fast hash-agg path, countDistinct
        # expands every input row per aggregate (Expand node).
        self.has_labels = has_labels
        self._n_docs = n_docs
        self._avgdl = avgdl
        self._obs = observation
        self._term_df_cache: dict | None = None

    @property
    def n_docs(self) -> int:
        if self._n_docs is None:
            self._compute_stats()
        return self._n_docs

    @property
    def avgdl(self) -> float:
        if self._avgdl is None:
            self._compute_stats()
        return self._avgdl

    def _compute_stats(self) -> None:
        if self._obs is not None:
            try:  # non-blocking probe: filled iff an action already ran
                if not self._obs._jo.getOrEmpty().isEmpty():
                    row = self._obs.get
                    self._n_docs = int(row["n"] or 0)
                    total = float(row["total_len"] or 0.0)
                    self._avgdl = total / self._n_docs if self._n_docs else 0.0
                    return
            except Exception:
                pass  # internal API moved — fall through to the agg
        g = self.doc_stats.agg(
            F.count("*").alias("n"), F.avg("token_len").alias("avgdl")
        ).collect()[0]
        self._n_docs = int(g["n"] or 0)
        self._avgdl = float(g["avgdl"] or 0.0)

    def ensure_term_cache(self, max_terms: int = 200_000) -> None:
        """Pull the (term -> df) dictionary onto the driver when the
        vocabulary is small enough; saves one Spark job per query.
        At web scale (billions of terms) this stays None and
        lookup_terms degrades to a partition-pruned point lookup."""
        if self._term_df_cache is None:
            if self.term_stats.limit(max_terms + 1).count() <= max_terms:
                self._term_df_cache = {
                    r["term"]: r["df"] for r in self.term_stats.collect()
                }

    def lookup_terms(self, terms: list[str]) -> dict[str, int]:
        """df per query term — driver dict hit, else a partition-pruned
        point lookup on the term-partitioned term_stats table
        (missing-term short-circuit, core/indexer.go:423-427).
        O(|query|), never O(vocabulary)."""
        if not terms:
            return {}
        if self._term_df_cache is not None:
            c = self._term_df_cache
            return {t: c[t] for t in terms if t in c}
        rows = self.term_stats.where(F.col("term").isin(terms)).collect()
        return {r["term"]: r["df"] for r in rows}


def build_index(
    documents: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    labels_col: str | None = None,
    cache: bool = True,
) -> Index:
    """Build the index tables from a documents DataFrame.

    One declarative DAG; Catalyst fuses tokenize+filter into the scan
    stage and the groupBys run with partial (map-side) aggregation.
    Replaces riot's segmenter/indexer/ranker worker fan-out
    (engine.go:326-353) with stages of a single plan.
    """
    if config.index_type >= FREQUENCIES_INDEX + 1:  # LOCS_INDEX
        tokens = tokenize_locs(
            documents, stopwords=config.stopwords, doc_len_mode=config.doc_len_mode
        )
    elif labels_col is None:
        # Freq build hot path — ONE shuffle total.  repartition on term
        # runs BEFORE the tf aggregation: hash partitioning on {term} is
        # a subset of the grouping keys {term, doc_id}, so it satisfies
        # the aggregate's required ClusteredDistribution and Catalyst
        # inserts NO second exchange — the plan is
        #   scan -> split/explode (codegen) -> Exchange(term)
        #        -> HashAggregate(tf)       -> Sort(term, doc_id)
        # vs. the naive groupBy-then-repartition which shuffles every
        # posting twice (measured 1.6x slower at 200k docs / 8 cores).
        # token_len rides as an INT through the agg: float grouping
        # keys/aggregates fall off Spark's fast hash-map path (8x).
        # Global (N, avgdl) piggyback on the same job via observe() on
        # the pre-explode projection — zero extra passes.
        from riot_spark.tokenizer import _words_col

        obs = Observation("riot_spark_build_stats")
        docs = documents.select(
            "doc_id",
            doc_length_col("text", config.stopwords, config.doc_len_mode)
            .cast("int")
            .alias("token_len"),
            _words_col("text", config.stopwords).alias("words"),
        ).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum("token_len").alias("total_len"),
        )
        # Salted shuffle key (north rule: hot-term skew): salt is a
        # deterministic function of the doc RANGE, so (a) rows of one
        # (term, doc) share a salt — including `salt` in both the
        # repartition AND the grouping keys keeps the plan one-shuffle
        # (HashPartitioning{term, salt} ⊆ grouping keys) — and (b) a
        # packed doc-range block never straddles partitions.  A df≈N
        # stopword spreads over `build_salts` reducers instead of one.
        raw = docs.select(
            "doc_id",
            "token_len",
            F.explode("words").alias("term"),
            F.pmod(
                F.shiftright("doc_id", config.salt_block_bits),
                F.lit(max(1, config.build_salts)),
            ).alias("salt"),
        )
        # DocIdsIndex (types/indexer_init_options.go:19-22): term
        # frequencies are NOT stored; with tf=0 every BM25 contribution
        # hits the tf>0 guard and scores stay 0, exactly riot's mode-0
        # behavior (intersection works, ranking degenerates to doc_id)
        tf_col = (
            (F.count("*") * 0.0).cast("float")
            if config.index_type == DOC_IDS_INDEX
            else F.count("*").cast("float")
        )
        postings = (
            raw.repartition(config.num_index_partitions, "term", "salt")
            .groupBy("term", "doc_id", "salt")
            .agg(
                tf_col.alias("tf"),
                F.max("token_len").cast("float").alias("token_len"),
            )
            .select(
                "doc_id",
                "term",
                "tf",
                F.lit(None).cast("array<int>").alias("positions"),
                "token_len",
                F.lit(False).alias("is_label"),
            )
            .sortWithinPartitions("term", "doc_id")
        )
        doc_stats = documents.select(
            "doc_id",
            doc_length_col(
                "text", config.stopwords, config.doc_len_mode
            ).alias("token_len"),
        )
        # df per term: postings are hash-partitioned on (term, salt), so
        # a term spans up to build_salts partitions and this groupBy
        # pays one small exchange over the partial (map-side) counts —
        # O(vocabulary) rows, not O(postings)
        term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
        if cache:
            postings = postings.cache()
            doc_stats = doc_stats.cache()
            term_stats = term_stats.cache()
        return Index(
            postings=postings,
            doc_stats=doc_stats,
            term_stats=term_stats,
            config=config,
            observation=obs,
        )
    else:
        tokens = tokenize_freq(
            documents,
            stopwords=config.stopwords,
            doc_len_mode=config.doc_len_mode,
        )
    # doc_stats straight off the documents scan — no explode, no join
    doc_stats = documents.select(
        "doc_id",
        doc_length_col("text", config.stopwords, config.doc_len_mode).alias(
            "token_len"
        ),
    )
    # content-wins label dedup (segment.go:264-279): a label that is
    # already a content token of the doc is dropped columnar-side
    labels = (
        label_tokens(
            documents, labels_col, text_col="text", stopwords=config.stopwords
        )
        if labels_col
        else None
    )
    return build_index_from_tokens(
        tokens,
        config,
        labels=labels,
        doc_stats=doc_stats,
        cache=cache,
        # internal tokenizers emit riot tokensMaps: one row per
        # (distinct term, doc) by construction; labels pre-deduped
        # columnar-side against content tokens
        unique_postings=True,
        labels_deduped=True,
    )


def build_index_from_tokens(
    tokens: DataFrame,
    config: EngineConfig = DEFAULT_CONFIG,
    labels: DataFrame | None = None,
    doc_stats: DataFrame | None = None,
    cache: bool = True,
    already_partitioned: bool = False,
    unique_postings: bool = False,
    labels_deduped: bool = False,
) -> Index:
    """Build from a (doc_id, term, tf, positions[, token_len])
    DataFrame — the external-tokens mode (riot Using=2,
    segment.go:117-124), also used by test fixtures with
    hand-specified token streams.

    When token_len is already a tokens column (the tokenizers emit it)
    the doc_id join is skipped entirely — the one shuffle the write
    path cannot afford at 10^12 docs.  `doc_stats` may be supplied to
    pin TokenLen explicitly (riot allows a caller-provided TokenLen,
    types/index.go:28).

    ``unique_postings``: set True ONLY when the caller guarantees at
    most one row per (term, doc_id) — the internal tokenizers do (they
    emit riot tokensMap entries, one per distinct term).  It unlocks
    the count(*) intersection fast path; external token streams with
    possible duplicates must leave it False so intersection counts
    distinct terms and duplicate rows cannot fake an AND match."""
    if "token_len" in tokens.columns:
        if doc_stats is None:
            doc_stats = tokens.groupBy("doc_id").agg(
                F.first("token_len").alias("token_len")
            )
        postings = tokens.withColumn("is_label", F.lit(False))
    else:
        if doc_stats is None:
            doc_stats = doc_lengths(tokens, config.doc_len_mode)
        postings = tokens.join(doc_stats, "doc_id").withColumn(
            "is_label", F.lit(False)
        )
    if labels is not None:
        if not labels_deduped:
            # content wins on (doc, term) collisions (segment.go:264-279):
            # riot only injects a label absent from the tokensMap
            labels = labels.join(
                postings.select("doc_id", "term"), ["doc_id", "term"],
                "left_anti",
            )
        lab = labels.join(doc_stats, "doc_id")
        postings = postings.unionByName(lab.select(*postings.columns))

    # (term, salt)-hash partitioning + (term, docId) sort within
    # partitions: a term's postings land in at most `build_salts`
    # partitions (hot-term skew defense; salt is doc-range-derived so
    # packed blocks stay whole), docId-sorted for merge/intersection.
    # Hash, not range: range partitioning costs an extra full pass to
    # sample bounds — measured 2x on the build — with no pruning
    # benefit over hash + sort here.
    if not already_partitioned:
        salt = F.pmod(
            F.shiftright("doc_id", config.salt_block_bits),
            F.lit(max(1, config.build_salts)),
        )
        postings = postings.repartition(
            config.num_index_partitions, F.col("term"), salt
        )
    postings = postings.sortWithinPartitions("term", "doc_id")

    # df = full posting-list length, label entries included — riot's
    # df is len(t.docIds) (core/indexer.go:540), and label postings sit
    # in the same lists; labels are excluded from scoring via tf=0, not
    # via df.
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))

    if cache:
        postings = postings.cache()
        doc_stats = doc_stats.cache()
        term_stats = term_stats.cache()

    return Index(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        config=config,
        # has_labels doubles as "count(*) intersection is unsafe": label
        # rows can collide with a token row for the same (term, doc),
        # and untrusted external streams may carry duplicates.
        has_labels=(labels is not None) or not unique_postings,
    )


class IndexBuilder:
    """Persistent build: write index tables + lineage manifest to a path,
    resumable (skip partitions already 'done' on rerun).

    Riot persists raw docs to a KV store and re-indexes everything at
    startup (store_worker.go:73-91, docs/en/persistent_storage.md:20);
    we checkpoint the *built* index with a manifest and rebuild nothing
    that is unchanged — strictly better at scale.
    """

    def __init__(self, spark: SparkSession, config: EngineConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.config = config

    def write(self, documents: DataFrame, path: str) -> dict:
        t0 = time.time()
        idx = build_index(documents, self.config, cache=False)
        idx.postings.write.mode("overwrite").parquet(f"{path}/postings")
        idx.doc_stats.write.mode("overwrite").parquet(f"{path}/doc_stats")
        from riot_spark.blocks import _write_term_stats

        _write_term_stats(idx.term_stats, f"{path}/term_stats")
        stats = {
            "n_docs": idx.n_docs,
            "avgdl": idx.avgdl,
            "wall_s": time.time() - t0,
        }
        # has_labels rides in global_stats so read() restores the
        # correct intersection mode (count(*) vs countDistinct)
        self.spark.createDataFrame(
            [(idx.n_docs, idx.avgdl, bool(idx.has_labels))],
            "n_docs LONG, avgdl DOUBLE, has_labels BOOLEAN",
        ).write.mode("overwrite").parquet(f"{path}/global_stats")
        return stats

    def read(self, path: str) -> Index:
        g = self.spark.read.parquet(f"{path}/global_stats").collect()[0]
        row = g.asDict()
        return Index(
            postings=self.spark.read.parquet(f"{path}/postings"),
            doc_stats=self.spark.read.parquet(f"{path}/doc_stats"),
            term_stats=self.spark.read.parquet(f"{path}/term_stats"),
            n_docs=int(g["n_docs"]),
            avgdl=float(g["avgdl"]),
            config=self.config,
            # legacy indexes without the flag get the safe default
            has_labels=bool(row.get("has_labels", True)),
        )
