"""Pages corpus contract (BASELINE.json input_hint / FIXTURES.md §1).

The north-star per-row invariant: extract_text(html) must be
byte-identical to the `text` column for every url, on both the
distributed (pandas-UDF) path and the pure-Python function.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from riot_spark.sources.corpus import (
    extract_text,
    generate_pages,
    pages_to_documents,
    with_extracted_text,
)


def test_extract_text_byte_identical(spark):
    pages = generate_pages(spark, 400)
    ext = with_extracted_text(pages)
    bad = ext.where(F.col("text_extracted") != F.col("text")).count()
    assert bad == 0
    # spot-check the pure function against raw bytes, including the
    # multi-byte zh slice (byte-level, not char-level, semantics)
    rows = pages.where(F.col("lang") == "zh").limit(3).collect() + (
        pages.limit(3).collect()
    )
    assert rows
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"]


def test_pages_schema_and_determinism(spark):
    pages = generate_pages(spark, 100)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    a = sorted((r["url"], r["text"]) for r in pages.collect())
    b = sorted((r["url"], r["text"]) for r in generate_pages(spark, 100).collect())
    assert a == b  # same seed => identical corpus


def test_pages_to_documents_dense_ids(spark):
    docs = pages_to_documents(generate_pages(spark, 50))
    ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    assert ids == list(range(len(ids)))


def test_pages_to_documents_follows_url_order(spark):
    """Range-partitioned assignment must equal a global url sort, and
    re-running must yield identical ids (determinism)."""
    rows = pages_to_documents(generate_pages(spark, 120), n_parts=7).collect()
    by_id = sorted((r["doc_id"], r["url"]) for r in rows)
    urls_sorted = sorted(r["url"] for r in rows)
    assert [u for _, u in by_id] == urls_sorted
    rows2 = pages_to_documents(generate_pages(spark, 120), n_parts=7).collect()
    assert sorted((r["doc_id"], r["url"]) for r in rows2) == by_id


def test_extract_text_catalyst_edge_parity(spark):
    """The Catalyst regexp extraction must equal the pure-Python spec
    on every tag arrangement: missing/unclosed/reversed tags, multiple
    paragraphs (first open -> LAST close), empty body, multibyte
    UTF-8, embedded newlines (DOTALL)."""
    from riot_spark.sources.corpus import extract_text, with_extracted_text

    cases = [
        b"<html><p>hello world</p></html>",
        b"no tags at all",
        b"<p>unclosed",
        b"closed</p> only",
        b"</p>reversed<p>",
        b"<p>a</p> mid <p>b</p>",
        b"<p></p>",
        "<p>uni é文字</p>".encode(),
        b"<p>multi\nline\n</p>",
        b"",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i LONG, html BINARY"
    )
    got = {
        r["i"]: r["text_extracted"]
        for r in with_extracted_text(df).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == extract_text(c), (i, c)


def test_generate_pages_start_offset(spark):
    """generate_pages(start=k) yields EXACTLY the rows [k, k+n) of the
    global deterministic corpus — the next-crawl-slice contract the
    append job's --synthetic-offset relies on."""
    whole = {
        r["url"]: (bytes(r["html"]), r["text"], r["lang"])
        for r in generate_pages(spark, 8).collect()
    }
    part = {
        r["url"]: (bytes(r["html"]), r["text"], r["lang"])
        for r in generate_pages(spark, 5, start=3).collect()
    }
    assert len(part) == 5
    for url, v in part.items():
        assert whole[url] == v


def test_pages_to_documents_is_jvm_only_and_window_exact(spark):
    """Doc-id assignment must (a) contain NO Python stage in its plan
    (the mapInPandas hop shipped the whole corpus through Arrow once)
    and (b) agree byte-for-byte with the global window-function oracle
    row_number() OVER (ORDER BY url) - 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pages = generate_pages(spark, 300)
    docs = pages_to_documents(pages, n_parts=7)
    plan = docs._jdf.queryExecution().executedPlan().toString()
    for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan, node

    got = {r["url"]: r["doc_id"] for r in docs.collect()}
    oracle = (
        pages.select("url")
        .withColumn(
            "doc_id",
            F.row_number().over(Window.orderBy("url")) - 1,
        )
        .collect()
    )
    want = {r["url"]: r["doc_id"] for r in oracle}
    assert got == want
