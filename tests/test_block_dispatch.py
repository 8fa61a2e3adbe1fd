"""attach_blocks makes the packed block executor the DEFAULT for
search_batch (flat is the fallback): results must be identical either
way, block-incompatible shapes must fall back to flat, and the
dispatch must actually ride the block engine when it can."""

import numpy as np
from pyspark.sql import functions as F

from riot_spark.blocks import blocked_from_index
from riot_spark.config import LOCS_INDEX, EngineConfig
from riot_spark.engine import build_index
from riot_spark.entrypoints import load_documents
from riot_spark.query import SearchEngine, SearchRequest

SF_SMOKE = "/root/testdata/sf0.001"

# scored requests use scorer='float32': the block executor's score
# contract IS the riot-bit-exact float32 kernel, so flat-vs-attached
# parity on these is BIT-exact (the 'native' double twin agrees to
# ~1e-7 relative, 4-decimal-identical under the driver oracle)
MIXED = {
    "a": SearchRequest(tokens=["data", "query"], scorer="float32",
                       max_outputs=20),
    "p": SearchRequest(
        tokens=["data", "query"], scorer="float32", criteria="proximity",
        max_outputs=20,
    ),
    "c": SearchRequest(tokens=["data", "query"], count_docs_only=True),
    "o": SearchRequest(tokens=["group", "order"], orderless=True),
    "l": SearchRequest(must=["data"], should=["query", "spark"], not_in=["dup"]),
    "r": SearchRequest(tokens=["data", "query"], scorer="float32",
                       max_outputs=10, reverse_order=True),
    "w": SearchRequest(tokens=["data"], scorer="float32",
                       doc_ids=list(range(0, 100, 2)), max_outputs=10),
}


def _norm(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(
            (r["doc_id"], None if r["score"] is None else np.float32(r["score"]),
             r["rank"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_attached_engine_matches_flat_and_routes_to_blocks(spark):
    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(
        docs, EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    )
    flat_eng = SearchEngine(idx)
    want = _norm(flat_eng.search_batch(MIXED).collect())

    bi = blocked_from_index(idx, doc_block_bits=6)
    eng = SearchEngine(idx).attach_blocks(bi)
    got = _norm(eng.search_batch(MIXED).collect())
    assert got == want
    # the dispatch really instantiated the block executor
    assert eng._block_engine_inst is not None

    # a block-incompatible shape (logic + reverse_order) routes to the
    # flat executor while the REST of the batch still rides the block
    # kernel (round-5 split dispatch; round 4 dropped the whole batch
    # to flat, round 3's block path raised) — and the mixed result
    # matches the pure-flat run
    bad = dict(MIXED)
    bad["x"] = SearchRequest(must=["data"], should=["query"],
                             reverse_order=True)
    want_bad = _norm(SearchEngine(idx).search_batch(bad).collect())
    eng2 = SearchEngine(idx).attach_blocks(bi)
    res = eng2.search_batch(bad)
    assert res.where(F.col("query_id") == "x").count() > 0
    assert _norm(res.collect()) == want_bad
    assert eng2._block_engine_inst is not None  # blocks served the rest


def test_attached_engine_dedups_repeated_shapes(spark):
    docs = load_documents(spark, SF_SMOKE)
    idx = build_index(
        docs, EngineConfig(index_type=LOCS_INDEX, num_index_partitions=8)
    )
    bi = blocked_from_index(idx, doc_block_bits=6)
    eng = SearchEngine(idx).attach_blocks(bi)
    reqs = {
        "q1": SearchRequest(tokens=["data", "query"], max_outputs=5),
        "q2": SearchRequest(tokens=["query", "data"], max_outputs=5),  # dup
    }
    rows = _norm(eng.search_batch(reqs).collect())
    assert rows["q1"] == rows["q2"] and len(rows["q1"]) == 5
