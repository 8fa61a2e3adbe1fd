"""Deduplication operators for training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket self-join), SimHash, and n-gram Jaccard.  Everything is
columnar DataFrame ops — deterministic hash functions are md5-derived
so the DuckDB oracle can reproduce them bit-for-bit.

Scale notes (100 TB):
* exact dedup = one shuffle on the fingerprint; AQE handles skew from
  boilerplate-heavy fingerprints.
* brute-force pair enumeration is quadratic — `ngram_jaccard_pairs`
  joins on shared shingles (candidate blocking), and the LSH variant
  reduces candidates to same-band buckets, the standard web-dedup
  recipe; band buckets shuffle once, hot buckets are bounded by the
  band width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingles(text_col: str, n: int):
    """Word n-gram shingle array from lower/space-split text.  Docs
    with fewer than n words yield an empty array (Spark's sequence(1,
    0) is the DESCENDING [1, 0], whose 0 then crashes slice — a doc
    of one or two words must not kill a 100-TB dedup pass)."""
    w = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
    if n == 1:
        return F.array_distinct(w)
    return F.when(
        F.size(w) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id) for every doc whose normalized text
    collides with an earlier (min doc_id) doc. One shuffle."""
    from riot_spark.functions.text import doc_fingerprint

    fp = doc_fingerprint(documents, text_col)
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    return (
        fp.join(canon, "fingerprint")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


def shingle_docs(documents: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    return documents.select(
        "doc_id", _shingles(text_col, n).alias("shingles")
    ).where(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) pairs with |A∩B|/|A∪B| >= threshold.

    Candidate blocking: only pairs sharing >=1 shingle are compared
    (explode + self-equi-join on shingle), so cost is driven by
    shingle document-frequency, not corpus².

    Pair cost is Σ_shingles df² — a stopword-like shingle appearing in
    k docs alone contributes k² candidate rows.  ``max_shingle_df``
    drops shingles above that document frequency before blocking; a
    dropped shingle leaves the shared count too, so this is the
    approximate tier (pairs whose overlap is only ultra-hot shingles
    are missed — the standard df-cap trade).  At 100 TB set it to a
    small multiple of the expected duplicate-cluster size; None keeps
    the exact semantics the driver-oracle row checks."""
    sh = shingle_docs(documents, n, text_col)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_shingle_df is not None:
        hot = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.alias("a")
    b = ex.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signature(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(doc_id, sig ARRAY<...>) — MinHash over the shingle set.

    hash_fn="md5" (default): hash_i(s) = md5(s || '#' || i), minimum
    taken in hex-string order.  String comparison of fixed-width
    lowercase hex == unsigned numeric order, and it is reproducible
    verbatim in ANSI SQL (oracle parity).

    hash_fn="xxhash64": hash_i(s) = xxhash64(s, seed=i), minimum in
    LONG order — the JVM-native hash is ~an order of magnitude cheaper
    than md5 per shingle, the production choice for 100-TB dedup
    passes (not SQL-oracle-reproducible; both are equally valid
    MinHash instantiations with the same collision statistics)."""
    sh = shingle_docs(documents, n, text_col)

    def hasher(i: int):
        if hash_fn == "xxhash64":
            # single-arg lambda: a two-arg lambda would make Spark pass
            # the array index as the second argument
            return lambda s: F.xxhash64(s, F.lit(i))
        salt = f"#{i}"
        return lambda s: F.md5(F.concat(s, F.lit(salt)))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), hasher(i)))
            for i in range(num_hashes)
        ]
    )
    return sh.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.

    num_hashes/bands rows per band; band key = concat of the band's
    signature slice. Returns (doc_a, doc_b, n_bands_shared).
    hash_fn="xxhash64" is the cheap production hash (see
    minhash_signature)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signature(documents, n, num_hashes, text_col, hash_fn)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("|", *[F.col("sig")[bi * rows + r] for r in range(rows)]).alias(
                "key"
            ),
        )
        for bi in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


def simhash(
    documents: DataFrame, bits: int = 60, text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash LONG) — 60-bit SimHash over distinct words.

    Word hash = first 15 hex chars of md5 (60 bits, fits a signed
    LONG); bit j of the doc hash = majority sign of word-bit j.
    Columnar: explode words -> per-bit ±1 sums -> reassemble. The
    per-bit aggregate is 60 sums in ONE hash-aggregate pass, not 60
    passes.
    """
    assert bits <= 60
    w = F.explode(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        )
    ).alias("word")
    h = F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("long")
    exploded = documents.select("doc_id", w).select(
        "doc_id", h.alias("h")
    )
    bit_sums = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bit_sums.select("doc_id", out.alias("simhash"))


def simhash_neardup_pairs(
    documents: DataFrame,
    max_hamming: int = 8,
    bits: int = 60,
    prefix_bits: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Near-dup candidates: block on the top `prefix_bits` of the
    simhash (docs differing only in low bits collide), then filter by
    exact Hamming distance via bit_count(xor). See
    `simhash_neardup_multiprobe` for the rotation generalization that
    also catches pairs differing inside the prefix."""
    sh = simhash(documents, bits, text_col)
    block = F.shiftright(F.col("simhash"), bits - prefix_bits).alias("block")
    blocked = sh.select("doc_id", "simhash", block)
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def simhash_neardup_multiprobe(
    documents: DataFrame,
    max_hamming: int = 8,
    bits: int = 60,
    prefix_bits: int = 16,
    n_tables: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Multi-probe SimHash blocking: `n_tables` bit-rotations of the
    hash each contribute a prefix block table; a pair is a candidate
    if ANY rotation collides, so near-dups whose differing bits fall
    inside one table's prefix are still caught by another table.
    Candidates dedupe on (doc_a, doc_b) before the exact Hamming
    filter.  Recall rises with n_tables at linear candidate cost —
    same banding idea as MinHash-LSH, here over rotations."""
    sh = simhash(documents, bits, text_col)
    mask = (1 << bits) - 1
    tables = []
    for t in range(n_tables):
        r = (t * bits) // n_tables
        rot = (
            F.shiftleft(F.col("simhash"), r).bitwiseAND(F.lit(mask))
            + F.shiftright(F.col("simhash"), bits - r)
            if r
            else F.col("simhash")
        )
        tables.append(
            F.struct(
                F.lit(t).alias("t"),
                F.shiftright(rot, bits - prefix_bits).alias("key"),
            )
        )
    blocked = sh.select(
        "doc_id", "simhash", F.explode(F.array(*tables)).alias("bk")
    ).select(
        "doc_id", "simhash",
        F.col("bk.t").alias("t"), F.col("bk.key").alias("key"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
