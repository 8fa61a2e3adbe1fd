"""Edge-input regression tests for the dedup operators.

Found by the composed pipeline job on a synthetic web corpus: a doc
with fewer than n words made `_shingles` evaluate Spark's
sequence(1, 0) — the DESCENDING [1, 0] — whose 0 start crashed
slice().  Sub-n-word docs are routine in web text; they must flow
through (with no shingles) rather than kill the pass.
"""

from __future__ import annotations

from riot_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingle_docs,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "one"),
            (2, "just two"),
            (3, "exactly three words here now ok"),
            (4, "exactly three words here now ok"),
            (5, ""),
        ],
        "doc_id LONG, text STRING",
    )


def test_short_docs_yield_no_shingles_not_a_crash(spark):
    rows = {r["doc_id"]: r["shingles"] for r in shingle_docs(_docs(spark), n=3).collect()}
    # sub-3-word docs are filtered out (empty shingle arrays), not errors
    assert set(rows) == {3, 4}
    assert rows[3] == rows[4] and len(rows[3]) == 4


def test_minhash_and_jaccard_survive_short_docs(spark):
    docs = _docs(spark)
    mh = minhash_lsh_pairs(docs).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(3, 4)}
    jc = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in jc} == {(3, 4)}


def test_minhash_xxhash64_fast_path_finds_the_dup(spark):
    mh = minhash_lsh_pairs(_docs(spark), hash_fn="xxhash64").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(3, 4)}
    assert all(r["n_bands_shared"] == 4 for r in mh)  # identical docs
