from riot_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_counts,
)

__all__ = ["doc_fingerprint", "language_id", "quality_score", "token_counts"]
