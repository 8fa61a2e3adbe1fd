"""riot-like Engine facade: the API surface a reference user expects
(engine.go: Init/Index/RemoveDoc/Flush/Search; riot.go: GetAllDocIds),
re-expressed batch-first.

Adds and removes buffer on the driver (riot's add/remove caches,
core/indexer.go:116-366) and `flush()` materializes a fresh immutable
index snapshot — the MVCC-by-snapshot stance of SURVEY.md B5: every
index is a pure function of the current doc set, so upsert = replace
doc + rebuild affected state, and readers never see partial writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from riot_spark.build import Index, build_index
from riot_spark.config import DEFAULT_CONFIG, EngineConfig
from riot_spark.query import SearchEngine, SearchRequest


def remove_docs(index: Index, doc_ids: list[int]) -> Index:
    """Functional doc delete (S2/B4): anti-join postings + stats against
    the tombstone set; global stats recomputed exactly."""
    spark = index.postings.sparkSession
    tomb = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id LONG")
    postings = index.postings.join(F.broadcast(tomb), "doc_id", "left_anti")
    doc_stats = index.doc_stats.join(F.broadcast(tomb), "doc_id", "left_anti")
    # df = full posting-list length, label entries included — same as
    # the build (riot: df = len(t.docIds), core/indexer.go:540)
    term_stats = postings.groupBy("term").agg(F.count("*").alias("df"))
    g = doc_stats.agg(
        F.count("*").alias("n"), F.avg("token_len").alias("avgdl")
    ).collect()[0]
    return Index(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        n_docs=int(g["n"] or 0),
        avgdl=float(g["avgdl"] or 0.0),
        config=index.config,
        has_labels=index.has_labels,
    )


class Engine:
    """Batch analogue of riot's Engine."""

    def __init__(self, spark: SparkSession, config: EngineConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.config = config
        self._docs: DataFrame | None = None  # committed snapshot source
        self._adds: list[tuple] = []  # (doc_id, text, labels)
        self._removes: set[int] = set()
        self._index: Index | None = None
        self._searcher: SearchEngine | None = None
        self.num_docs_indexed = 0
        self.num_docs_removed = 0

    # ------------------------------------------------------- write API

    def index_doc(
        self, doc_id: int, text: str, labels: list[str] | None = None
    ) -> None:
        """Engine.Index(docId, DocData) — buffered until flush
        (engine.go:376-416).  Re-adding a doc_id replaces it
        (delete-then-insert, core/indexer.go:195-199)."""
        self._adds.append((int(doc_id), text, list(labels or [])))
        self.num_docs_indexed += 1

    def index_documents(self, docs: DataFrame) -> None:
        """Bulk ingest of a (doc_id, text[, labels]) DataFrame."""
        if "labels" not in docs.columns:
            docs = docs.withColumn("labels", F.array().cast("array<string>"))
        docs = docs.select("doc_id", "text", "labels")
        self._docs = docs if self._docs is None else self._docs.unionByName(docs)

    def remove_doc(self, doc_id: int) -> None:
        """Engine.RemoveDoc (engine.go:429-463)."""
        self._removes.add(int(doc_id))
        self.num_docs_removed += 1

    def flush(self) -> None:
        """Engine.Flush (engine.go:812-842): commit buffered adds and
        removes into a fresh snapshot and rebuild the index.  The
        Spark action boundary IS the barrier riot busy-waits for."""
        if self._adds:
            add_df = self.spark.createDataFrame(
                self._adds, "doc_id LONG, text STRING, labels ARRAY<STRING>"
            )
            if self._docs is None:
                self._docs = add_df
            else:
                # newest version of a doc_id wins
                self._docs = self._docs.join(
                    add_df.select("doc_id"), "doc_id", "left_anti"
                ).unionByName(add_df)
            self._adds = []
        if self._docs is not None and self._removes:
            tomb = self.spark.createDataFrame(
                [(d,) for d in sorted(self._removes)], "doc_id LONG"
            )
            self._docs = self._docs.join(F.broadcast(tomb), "doc_id", "left_anti")
            self._removes = set()
        if self._docs is None:
            return
        self._docs = self._docs.cache()
        self._index = build_index(self._docs, self.config, labels_col="labels")
        self._searcher = SearchEngine(self._index)

    # -------------------------------------------------------- read API

    @property
    def index(self) -> Index:
        if self._index is None:
            raise RuntimeError("flush() before querying")
        return self._index

    def search(self, req: SearchRequest) -> DataFrame:
        if self._searcher is None:
            raise RuntimeError("flush() before querying")
        return self._searcher.search(req)

    def all_doc_ids(self) -> DataFrame:
        """riot.GetDBAllIds (riot.go:136-148)."""
        if self._docs is None:
            raise RuntimeError("no documents")
        return self._docs.select("doc_id")

    def all_docs(self) -> DataFrame:
        """riot.GetDBAllDocs (riot.go:151-173)."""
        if self._docs is None:
            raise RuntimeError("no documents")
        return self._docs

    def num_docs(self) -> int:
        return self.index.n_docs
