"""Tokenization — the projection layer (SURVEY.md §2.2).

Canonical mode mirrors riot's external-tokens configuration (Using=2,
segment.go:117-124) fed by the query tokenizer semantics of
engine.go:504-506: ``lower(text)`` split on a single space.  Positions
are byte offsets of each occurrence's first byte in the UTF-8 encoding
of the lowercased text (types/doc_index_data.go:45-51).

Two build paths:

* ``tokenize_freq`` — frequencies only.  Pure JVM (split/explode/
  groupBy), whole-stage-codegen throughout; this is the hot path for
  FrequenciesIndex-mode builds at 100 TB.
* ``tokenize_locs`` — adds byte positions, for LocsIndex mode
  (proximity + snippet locations).  On sessions with riotspark.jar
  the tokenizer runs inside the executor JVM
  (riot_spark/jvm/Tokenize.scala — posting rows never exist
  Python-side); jarless sessions keep the vectorized Arrow-batched
  pandas kernel (no per-row Python UDF, ~1.4M entries/s at 16 cores).
  An attempted Catalyst-expression variant (offsets via
  aggregate(slice(words, 1, i))) ran 9x SLOWER than even the Arrow
  kernel because Spark higher-order functions execute interpreted
  (no codegen) and slice() copies the O(n^2) prefixes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.FloatType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), True),
        T.StructField("token_len", T.FloatType(), False),
    ]
)


def tokenize_text(text: str) -> list[tuple[str, list[int]]]:
    """Pure-Python canonical tokenizer: (term, byte positions) pairs.

    Matches riot's TokenData contract — one entry per *distinct* term,
    locations = byte offsets of every occurrence, in text order of first
    appearance (makeTokensMap, segment.go:210-246).  Shared by the
    Spark UDF and the pytest oracle so both sides tokenize identically.
    """
    out: dict[str, list[int]] = {}
    pos = 0
    for word in text.lower().split(" "):
        nbytes = len(word.encode("utf-8"))
        if word:
            out.setdefault(word, []).append(pos)
        pos += nbytes + 1  # the single-space separator is 1 byte
    return list(out.items())


def _words_col(text_col: str, stopwords: frozenset[str]):
    # array_remove, not a filter() lambda: higher-order functions run
    # interpreted and knock the expression out of whole-stage codegen —
    # a ~10x build-throughput hit measured at 50k docs.
    w = F.array_remove(F.split(F.lower(F.col(text_col)), " "), "")
    if stopwords:
        # stopword path only pays the HOF when actually configured
        stop = sorted(stopwords)
        w = F.filter(w, lambda x: ~x.isin(*stop))
    return w


def doc_length_col(text_col: str, stopwords: frozenset[str], mode: str):
    w = _words_col(text_col, stopwords)
    if mode == "distinct":
        return F.size(F.array_distinct(w)).cast("float")
    return F.size(w).cast("float")


def tokenize_freq(
    documents: DataFrame,
    text_col: str = "text",
    stopwords: frozenset[str] = frozenset(),
    doc_len_mode: str = "distinct",
) -> DataFrame:
    """documents -> (doc_id, term, tf, token_len) — JVM-only.

    token_len is computed from the word array BEFORE the explode and
    carried through the aggregate, so the index build needs no join
    back to a doc_stats table — at 10^12 docs that join is a full
    doc_id shuffle this plan never pays.  split/explode/hash-agg stay
    inside whole-stage codegen; Catalyst prunes every column but
    (doc_id, text) out of the parquet scan.
    """
    toks = documents.select(
        "doc_id",
        doc_length_col(text_col, stopwords, doc_len_mode).alias("token_len"),
        F.explode(_words_col(text_col, stopwords)).alias("term"),
    )
    return toks.groupBy("doc_id", "term", "token_len").agg(
        F.count("*").cast("float").alias("tf")
    ).select(
        "doc_id",
        "term",
        "tf",
        F.lit(None).cast(T.ArrayType(T.IntegerType())).alias("positions"),
        "token_len",
    )


def tokenize_locs(
    documents: DataFrame,
    text_col: str = "text",
    stopwords: frozenset[str] = frozenset(),
    doc_len_mode: str = "distinct",
) -> DataFrame:
    """documents -> (doc_id, term, tf, positions, token_len) with byte
    offsets.  One Arrow-batched mapInPandas; tf = len(positions)
    (segment.go:290-296); token_len computed per doc in the same pass.
    """
    stop = stopwords  # captured by value in the closure, broadcast via pickle
    distinct_len = doc_len_mode == "distinct"
    cols = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col(text_col).cast("string").alias("text"),
    )

    # JVM twin (riot_spark/jvm/Tokenize.scala): tokenize inside the
    # executor — posting rows never exist Python-side.  Differential-
    # tested against the pandas path; sessions without riotspark.jar
    # keep the Arrow kernel below.
    spark = documents.sparkSession
    try:
        spark._jvm.java.lang.Class.forName("riotspark.Tokenize")
        jdf = spark._jvm.riotspark.Tokenize.locs(
            cols._jdf, sorted(stop), bool(distinct_len)
        )
        from pyspark.sql import DataFrame as _DF

        return _DF(jdf, spark)
    except Exception:
        pass
    return _tokenize_locs_pandas(cols, stop, distinct_len)


def _tokenize_locs_pandas(
    cols: DataFrame, stop: frozenset[str], distinct_len: bool
) -> DataFrame:
    """The Arrow-batched fallback kernel (and the canonical
    tokenize_text contract holder) — kept for jarless sessions and as
    the differential-test twin of riot_spark/jvm/Tokenize.scala."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            terms: list[str] = []
            tfs: list[float] = []
            poss: list[list[int]] = []
            lens: list[float] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [
                    (t, p) for t, p in tokenize_text(text) if t not in stop
                ]
                dl = (
                    float(len(toks))
                    if distinct_len
                    else float(sum(len(p) for _, p in toks))
                )
                for term, positions in toks:
                    doc_ids.append(int(doc_id))
                    terms.append(term)
                    tfs.append(float(len(positions)))
                    poss.append(positions)
                    lens.append(dl)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "term": terms,
                    "tf": tfs,
                    # explicit object dtype: an all-empty batch would
                    # otherwise infer float64, which Arrow cannot cast
                    # to list<int32>
                    "positions": pd.Series(poss, dtype=object),
                    "token_len": lens,
                }
            )

    return cols.mapInPandas(run, schema=TOKENS_SCHEMA)


def label_tokens(
    documents: DataFrame,
    labels_col: str = "labels",
    text_col: str | None = None,
    stopwords: frozenset[str] = frozenset(),
) -> DataFrame:
    """Labels become searchable keywords with empty positions
    (segment.go:264-279): they participate in intersection but carry no
    tf contribution to proximity, and are excluded from BM25 scoring
    (core/indexer.go:528).

    When ``text_col`` is given, a label already present as a CONTENT
    token of the same doc is dropped — riot only adds a label when the
    tokensMap lacks the key (`if _, ok := tokensMap[label]; !ok`), so
    the content posting (with its positions) wins.  Columnar check, no
    join: the label is tested against the stopword-filtered word
    array."""
    exploded = documents.select(
        "doc_id",
        F.explode(F.col(labels_col)).alias("term"),
        *([_words_col(text_col, stopwords).alias("__words")] if text_col else []),
    )
    if text_col:
        exploded = exploded.where(
            ~F.array_contains(F.col("__words"), F.col("term"))
        )
    return exploded.select(
        "doc_id",
        "term",
        # riot stores Frequency = len(locations) = 0 for labels
        # (segment.go:290-296 over the empty label locations)
        F.lit(0.0).cast("float").alias("tf"),
        F.array().cast(T.ArrayType(T.IntegerType())).alias("positions"),
        F.lit(True).alias("is_label"),
    )


def doc_lengths(tokens: DataFrame, mode: str = "distinct") -> DataFrame:
    """(doc_id, token_len).

    'distinct' = riot external-tokens semantics: TokenLen =
    len(data.Tokens) = #distinct terms (segment.go:182,284; SURVEY §2.9.2).
    'occurrences' = sum of tfs.
    """
    if mode == "distinct":
        agg = F.count("*")
    elif mode == "occurrences":
        agg = F.sum("tf")
    else:
        raise ValueError(f"unknown doc_len_mode {mode!r}")
    return tokens.groupBy("doc_id").agg(agg.cast("float").alias("token_len"))


def tokenize_query(text: str) -> list[str]:
    """Query tokenizer — Engine.Tokens NotUseGse path (engine.go:504-506)."""
    return [w for w in text.lower().split(" ") if w]
