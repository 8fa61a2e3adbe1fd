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


def test_text_profile_matches_standalone_operators(spark):
    """text_profile fuses quality_score + language_id into one token
    pass; every value must equal the standalone operators'."""
    from riot_spark.functions.text import language_id, quality_score, text_profile
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    docs = pages_to_documents(generate_pages(spark, 300)).select(
        "doc_id", "text"
    )
    fused = {r["doc_id"]: r.asDict() for r in text_profile(docs).collect()}
    q = {r["doc_id"]: r.asDict() for r in quality_score(docs).collect()}
    lg = {r["doc_id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert set(fused) == set(q) == set(lg)
    for d, row in fused.items():
        want = dict(q[d], pred_lang=lg[d])
        assert row == want, (d, row, want)


def test_minhash_xxhash64_fast_path_finds_the_dup(spark):
    mh = minhash_lsh_pairs(_docs(spark), hash_fn="xxhash64").collect()
    assert {(r["doc_a"], r["doc_b"]) for r in mh} == {(3, 4)}
    assert all(r["n_bands_shared"] == 4 for r in mh)  # identical docs
