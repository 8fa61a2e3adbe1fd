"""Text-analysis functions for large-scale training-data pipelines.

All JVM-side (pyspark.sql.functions only — no Python in the hot path),
so they stay inside whole-stage codegen and scale to 100 TB. Each has
an ANSI-SQL twin in __spark_entry__.oracle_sql() so DuckDB verifies the
exact same semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic English stopword list shared with the SQL oracles.
STOPWORDS = (
    "the a an and or of to in is it that for on with as at by be this "
    "are was were from has have had not but what all we you he she they"
).split()

# BPE-ish token pattern: runs of word chars OR single non-space symbols —
# approximates subword pre-tokenization (GPT-2 style split) with a
# regex available identically in Spark and DuckDB.
BPE_ISH_PATTERN = "[a-z0-9]+|[^a-z0-9\\s]"


def _words(text_col: str = "text") -> Column:
    # array_remove, not a filter() lambda: higher-order functions run
    # interpreted (no whole-stage codegen) — measured ~10x slower on
    # the build path (tokenizer.py note)
    return F.array_remove(F.split(F.lower(F.col(text_col)), " "), "")


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_distinct_tokens)."""
    return documents.select(
        "doc_id",
        F.size(_words(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0)
        ).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(_words(text_col))).cast("long").alias(
            "n_distinct_tokens"
        ),
    )


def quality_score(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1].

    Features mirror the usual web-text filters (length, stopword ratio,
    lexical diversity, mean word length).  Shape: explode + one hash
    aggregate — every expression stays inside whole-stage codegen (the
    earlier filter()/aggregate() lambdas executed interpreted, ~10x
    slower on the hot 100 TB text-filter pass); the doc_id shuffle is
    the same one the index build sustains at millions of rows/s.
    """
    base = documents.select(
        "doc_id", F.explode_outer(_words(text_col)).alias("word")
    )
    feat = base.groupBy("doc_id").agg(
        F.count("word").cast("double").alias("n"),
        F.sum(
            F.when(F.col("word").isin(STOPWORDS), 1).otherwise(0)
        ).cast("double").alias("stop_hits"),
        F.countDistinct("word").cast("double").alias("n_distinct"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).cast("double").alias(
            "sum_len"
        ),
    )
    n = F.col("n")
    stop_ratio = F.col("stop_hits") / F.greatest(n, F.lit(1.0))
    distinct_ratio = F.col("n_distinct") / F.greatest(n, F.lit(1.0))
    mean_wlen = F.col("sum_len") / F.greatest(n, F.lit(1.0))
    length_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(stop_ratio >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    composite = (length_ok + wlen_ok + stop_ok + distinct_ratio) / F.lit(4.0)
    return feat.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(composite, 4).alias("quality"),
    )


# Tiny per-language marker lexicons (deterministic heuristic shared
# with the SQL oracle): language with the most marker hits wins;
# ties and zero-hit docs fall back to 'en'.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "es": ["el", "la", "los", "que", "es", "por"],
    "fr": ["le", "les", "des", "est", "une", "dans"],
}


def language_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — marker-word voting, deterministic
    tie-break by language code order (ascending), zero hits => 'en'.
    Explode + conditional-sum hash aggregate: whole-stage codegen
    end to end (no interpreted higher-order functions)."""
    base = documents.select(
        "doc_id", F.explode_outer(_words(text_col)).alias("word")
    )
    hit_aggs = [
        F.sum(F.when(F.col("word").isin(ms), 1).otherwise(0)).alias(
            f"hits_{lang}"
        )
        for lang, ms in sorted(LANG_MARKERS.items())
    ]
    scored = base.groupBy("doc_id").agg(*hit_aggs)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("en")
    # first language (ascending code) achieving the max wins
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return scored.select("doc_id", pred.alias("pred_lang"))


def text_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, distinct_ratio, mean_word_len,
    quality, pred_lang) — quality_score and language_id fused into ONE
    explode + hash-aggregate pass.  Run separately they each scan and
    explode the full text column; on a 100-TB filter pass that is the
    difference between one token pass and two.  Values are identical
    to the standalone operators (pytest-pinned)."""
    base = documents.select(
        "doc_id", F.explode_outer(_words(text_col)).alias("word")
    )
    hit_aggs = [
        F.sum(F.when(F.col("word").isin(ms), 1).otherwise(0)).alias(
            f"hits_{lang}"
        )
        for lang, ms in sorted(LANG_MARKERS.items())
    ]
    feat = base.groupBy("doc_id").agg(
        F.count("word").cast("double").alias("n"),
        F.sum(
            F.when(F.col("word").isin(STOPWORDS), 1).otherwise(0)
        ).cast("double").alias("stop_hits"),
        F.countDistinct("word").cast("double").alias("n_distinct"),
        F.coalesce(F.sum(F.length("word")), F.lit(0)).cast("double").alias(
            "sum_len"
        ),
        *hit_aggs,
    )
    n = F.col("n")
    stop_ratio = F.col("stop_hits") / F.greatest(n, F.lit(1.0))
    distinct_ratio = F.col("n_distinct") / F.greatest(n, F.lit(1.0))
    mean_wlen = F.col("sum_len") / F.greatest(n, F.lit(1.0))
    length_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(stop_ratio >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    composite = (length_ok + wlen_ok + stop_ok + distinct_ratio) / F.lit(4.0)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("en")
    for lg in reversed(langs):
        pred = F.when(
            (F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(pred)
    return feat.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(composite, 4).alias("quality"),
        pred.alias("pred_lang"),
    )


def doc_fingerprint(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — md5 over whitespace-normalized lowercase
    text: the exact-dedup key (cheap, collision-safe at corpus scale)."""
    norm = F.concat_ws(" ", _words(text_col))
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))


def winnow_fingerprints(
    documents: DataFrame,
    k: int = 5,
    keep: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp) — winnowing-style rolling k-gram fingerprints:
    hash every sliding window of k words and keep the `keep` smallest
    hashes per doc.  Near-identical docs share most selected
    fingerprints even under edits (the MOSS/winnowing idea); fully
    columnar, and hash = md5 so the SQL oracle reproduces it verbatim.
    """
    w = _words(text_col)
    # guard: sequence(1, n) with n < 1 would run DESCENDING in Spark
    grams = F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(w, i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    selected = F.slice(F.array_sort(grams), 1, keep)
    return documents.select(
        "doc_id", F.explode(selected).alias("fp")
    )
