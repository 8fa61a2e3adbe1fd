"""riot_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch rewrite of the capabilities of go-ego/riot (reference at
/root/reference, v0.10.0) as a batch Spark engine:

* documents -> tokenize (vectorized) -> term-partitioned posting lists
  (flat for correctness; delta+varint packed blocks with block-max scores
  for scale) -- SURVEY.md section 2.3.
* queries = DataFrame programs: AND intersection, must/should/notIn logic,
  BM25 (k1=2.0, b=0.75, idf=log2(N/df+1)) rank-identical to riot
  (core/indexer.go:417-558 semantics, NumShards=1 statistics).
* plus large-scale training-data ops: dedup (exact/minhash/simhash/
  jaccard/embedding), ANN similarity, text quality/langid/fingerprint.

Architecture is Spark-first (DataFrame + Catalyst + Arrow pandas UDFs),
not a port of riot's goroutine/channel design.
"""

from riot_spark.config import BM25Params, EngineConfig
from riot_spark.build import IndexBuilder, build_index, build_index_from_tokens
from riot_spark.engine import Engine, remove_docs
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.blocks import (
    BlockSearchEngine,
    append_blocked_index,
    blocked_from_index,
    compact_segments,
    delete_from_blocked,
    delete_from_store,
    merge_blocked_indexes,
    merge_blocked_many,
    read_blocked_index,
    write_blocked_index,
)

__all__ = [
    "BM25Params",
    "BlockSearchEngine",
    "append_blocked_index",
    "compact_segments",
    "delete_from_blocked",
    "delete_from_store",
    "merge_blocked_indexes",
    "merge_blocked_many",
    "Engine",
    "EngineConfig",
    "IndexBuilder",
    "blocked_from_index",
    "build_index",
    "build_index_from_tokens",
    "read_blocked_index",
    "remove_docs",
    "SearchEngine",
    "SearchRequest",
    "write_blocked_index",
]

__version__ = "0.3.0"
