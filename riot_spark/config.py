"""Engine configuration.

Mirrors the semantics knobs of the reference engine
(types/engine_init_options.go, types/indexer_init_options.go) without
porting its structure.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """Okapi BM25 parameters.

    Reference defaults: k1=2.0, b=0.75
    (types/engine_init_options.go:39-42); idf = log2(N/df + 1)
    (core/indexer.go:540, docs/en/bm25.md:9-13).
    """

    k1: float = 2.0
    b: float = 0.75


# Index fidelity modes — types/indexer_init_options.go:19-32.
DOC_IDS_INDEX = 0  # docIds only (no scores)
FREQUENCIES_INDEX = 1  # + term frequency -> BM25 (reference default)
LOCS_INDEX = 2  # + byte positions -> BM25 + proximity + snippet locs


@dataclass(frozen=True)
class EngineConfig:
    """Build/query configuration.

    doc_len_mode:
      'distinct'  — TokenLen = number of distinct terms per doc. This is
                    riot's canonical external-tokens (Using=2) semantics:
                    TokenLen = len(data.Tokens) (segment.go:182,284) and
                    the parity contract of SURVEY.md §2.9.2.
      'occurrences' — total token occurrences (classic BM25 |d|).
    """

    bm25: BM25Params = field(default_factory=BM25Params)
    index_type: int = LOCS_INDEX
    doc_len_mode: str = "distinct"
    # Number of output partitions for the postings table (term-range
    # partitioned).  At 100 TB this would be thousands; tests use small.
    num_index_partitions: int = 32
    # Max docs per packed posting block (controls block-max WAND
    # granularity and memory per decode).
    block_size: int = 4096
    # Hot-term skew defense: the build shuffle key is (term, salt)
    # where salt = pmod(doc_id >> salt_block_bits, build_salts), so a
    # stopword-frequency term spreads over `build_salts` reducers
    # instead of melting one.  Salting by doc RANGE (not doc hash)
    # keeps every packed doc-range block whole inside one partition
    # (requires salt_block_bits >= the packer's doc_block_bits).
    # build_salts=1 disables salting (exact legacy layout).
    build_salts: int = 8
    salt_block_bits: int = 13
    # Reduce-task count for query-time aggregations.  An explicit
    # repartition beats inheriting the session's (build-sized) shuffle
    # count by a wide margin — the inherited path pays an AQE re-plan
    # plus coalescing on every query (measured p50 at sf0.1/local[32]:
    # inherit 367 ms; 1->302, 2->244, 4->227, 8->214, 16->182 ms).
    # Default 16 suits tens of cores; scale with candidate volume on a
    # cluster; 0 = inherit the session setting.
    query_agg_partitions: int = 16
    stopwords: frozenset[str] = frozenset()


DEFAULT_CONFIG = EngineConfig()
