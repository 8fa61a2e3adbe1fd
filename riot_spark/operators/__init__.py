from riot_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from riot_spark.operators.similarity import cosine_topk, neardup_pairs

__all__ = [
    "exact_duplicates",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "neardup_pairs",
]
