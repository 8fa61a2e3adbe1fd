"""Corpus sources.

Two inputs feed the engine:

1. ``pages`` — Common-Crawl-style web pages with schema
   (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)
   per the input contract.  :func:`generate_pages` synthesizes a
   deterministic corpus (seeded, no external data) distributed across
   executors via ``spark.range`` — generation happens inside a
   vectorized ``mapInPandas``, so it scales with the cluster instead of
   materializing on the driver.  :func:`extract_text` recovers ``text``
   from ``html`` byte-identically per url (tested invariant).

2. ``documents`` — the driver-provided parquet
   (doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars)
   used for DuckDB-oracle correctness checks.

The reference ingests docs one-by-one over channels (engine.go:376-416)
and crawls Weibo for test data (testdata/crawl_weibo_data.go:24-59);
here the durable table *is* the source (SURVEY.md S1/S3/S6).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# Deterministic ~5k-word vocabulary: a few hundred hot "stopword-like"
# heads plus a long rare tail (Zipfian draw over ranks).
_HOT = (
    "the of and a to in is it you that he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if will up "
    "other about out many then them these so some her would make like him "
    "into time has look two more write go see number no way could people my "
    "than first water been call who oil its now find long down day did get "
    "come made may part"
).split()


def _vocab_word(rank: int) -> str:
    if rank < len(_HOT):
        return _HOT[rank]
    # rare tail: deterministic pseudo-words
    h = hashlib.md5(f"w{rank}".encode()).hexdigest()
    return "t" + h[:7]


VOCAB_SIZE = 5000


def _doc_words(i: int, zipf_s: float = 1.07) -> list[str]:
    """Deterministic Zipfian bag-of-words for doc i (seed folded into md5)."""
    h = hashlib.md5(f"doc{i}:42".encode()).digest()
    n_words = 5 + int.from_bytes(h[:4], "big") % 296  # 5..300
    words = []
    state = int.from_bytes(h[4:12], "big")
    for j in range(n_words):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        u = (state >> 11) / float(1 << 53)  # uniform [0,1)
        # inverse-CDF approximation of a Zipf draw over VOCAB_SIZE ranks
        rank = int(VOCAB_SIZE ** u) - 1
        words.append(_vocab_word(min(rank, VOCAB_SIZE - 1)))
    return words


def _render_html(title: str, text: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")


_ZH_SNIPPETS = ["有七十亿人口", "世界 你好", "人口 众多"]


def generate_pages(
    spark: SparkSession, n_docs: int, n_parts: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

    Distributed generation: ``spark.range`` provides ids; a vectorized
    mapInPandas renders rows — no driver-side materialization, so the
    same code generates 10^12 rows on a cluster.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = pd.Timestamp("2024-01-01", tz="UTC")
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in ids:
                i = int(i)
                if i % 37 == 13:  # small multi-byte UTF-8 slice
                    text = _ZH_SNIPPETS[i % len(_ZH_SNIPPETS)]
                    lang = "zh"
                else:
                    text = " ".join(_doc_words(i))
                    lang = "en"
                urls.append(f"https://example{i % 97}.com/p/{i}")
                tss.append(base + pd.Timedelta(seconds=i * 37))
                htmls.append(_render_html(f"page {i}", text))
                texts.append(text)
                langs.append(lang)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    if n_parts is None:
        n_parts = max(1, min(256, n_docs // 2000 + 1))
    # `start` shifts the GLOBAL page ids (content is a pure function
    # of the id), so [start, start+n) really is the next crawl slice
    return spark.range(start, start + n_docs, numPartitions=n_parts).mapInPandas(
        gen, schema=PAGES_SCHEMA
    )


def extract_text(html: bytes) -> str:
    """Extract body text from page html — deterministic pure Python.

    Must be byte-identical per url to the ``text`` column (input
    contract / north star).  The synthetic renderer wraps text in a
    single <p>; real-world extraction would slot in here, kept pure so
    both the engine and the oracle run the same bytes.
    """
    s = html.decode("utf-8")
    start = s.find("<p>")
    end = s.rfind("</p>")
    if start == -1 or end == -1:
        return ""
    return s[start + 3 : end]


def with_extracted_text(pages: DataFrame) -> DataFrame:
    """pages(html) -> pages + text_extracted, Catalyst-only.

    ``(?s)<p>(.*)</p>`` with a greedy body reproduces
    :func:`extract_text`'s find('<p>') / rfind('</p>') slice exactly —
    first opening tag to LAST closing tag, '' when either is missing
    or out of order — so extraction runs inside whole-stage codegen
    instead of a pandas UDF.  extract_text stays the pure-Python spec
    that tests and oracles call directly (byte-identity pinned in
    tests/test_corpus.py)."""
    return pages.withColumn(
        "text_extracted",
        F.regexp_extract(
            F.col("html").cast("string"), r"(?s)<p>(.*)</p>", 1
        ),
    )


def pages_to_documents(pages: DataFrame, n_parts: int | None = None) -> DataFrame:
    """Assign dense LONG doc_ids ordered by url (FIXTURES.md §1).

    Scale-safe AND fully JVM-side: range-partition by url +
    per-partition local sort, then
    doc_id = (cumulative count of earlier ranges) + local row index.
    The local row index comes from ``monotonically_increasing_id()``,
    which by contract is ``partition_id * 2^33 + row index within the
    partition`` — masking the low 33 bits recovers the sorted
    position with no Python stage at all (the previous mapInPandas
    assign shipped every corpus byte JVM->Arrow->Python->JVM once; at
    1M docs that hop alone cost ~35 s).  The per-partition offsets are
    a broadcast O(parts) join.  The only driver-side data is one count
    per partition; no global window funnels 10^12 rows through one
    task.  The partitioned frame is eagerly localCheckpoint-ed so the
    count pass and the assignment pass see the SAME materialized
    partitions — range boundaries cannot drift on recompute, and the
    blocks are reference-tracked (cleaned when the frame is released)
    instead of pinned in the cache manager like persist() would be.
    At cluster scale this is the staged parquet of the sorted corpus
    (checkpoint to durable storage instead: localCheckpoint data dies
    with a lost executor).
    """
    spark = pages.sparkSession
    n_parts = n_parts or max(spark.sparkContext.defaultParallelism, 4)
    part = (
        pages.select("url", "warc_ts", "text", "lang")
        .repartitionByRange(n_parts, "url")
        .sortWithinPartitions("url")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in part.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    # monotonically_increasing_id gives 33 bits of per-partition row
    # counter; a range partition at/above 2^33 rows would bleed into
    # the partition-id bits and silently collide doc_ids (reachable at
    # 10^12 docs with a small n_parts) — fail loudly instead
    over = {p: c for p, c in counts.items() if c >= 1 << 33}
    if over:
        raise ValueError(
            f"range partitions exceed 2^33 rows ({over}); raise n_parts "
            f"(currently {n_parts}) so doc_id assignment stays collision-free"
        )
    offsets: list[tuple[int, int]] = []
    acc = 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    omap = spark.createDataFrame(offsets or [(0, 0)], "pid INT, _off LONG")
    # the stored pid column (stamped before the checkpoint) equals the
    # scan's partition index, so the mid's low bits are the row's
    # position in ITS OWN sorted range — one narrow stage, no shuffle
    local = F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
    return (
        part.withColumn("_local", local)
        .join(F.broadcast(omap), "pid")
        .select(
            (F.col("_off") + F.col("_local")).cast("long").alias("doc_id"),
            "url", "warc_ts", "text", "lang",
        )
    )


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver testdata documents table (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
