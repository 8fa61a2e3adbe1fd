"""Benchmark harness — prints ONE JSON line for the driver.

Measures index-build throughput (docs/s, posting entries/s) and query
latencies over the documents corpus at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Reference numbers to beat (BASELINE.md): riot builds 1.3-2.0M posting
entries/s on a 32-core Xeon; search p50 well under 10ms at 1M docs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
from riot_spark.query import SearchEngine, SearchRequest
from riot_spark.session import get_spark
from riot_spark.sources.corpus import load_documents


def timed(fn, repeats: int = 3) -> float:
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    return statistics.median(vals)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # the bench caches freq + locs + block indexes in one JVM; the 8g
    # default heap turns late measurements GC-bound
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    spark = get_spark("riot_spark_bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_documents(spark, sf_dir)
    n_docs = docs.count()

    # JIT/codegen warm-up: first execution of the build pipeline pays
    # ~30-40s of JVM compilation; a tiny build compiles the same
    # operators so the measured runs reflect steady-state throughput
    # (what a long-running cluster job sees).
    warm_cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=4)
    build_index(docs.limit(200), warm_cfg, cache=False).postings.count()

    queries: dict[str, float] = {}

    # -------- web-scale-shape build: synthetic Common-Crawl-style pages.
    # Measured FIRST, on a warmed but otherwise empty JVM: round-2's
    # artifact ran this last, after three cached indexes shared the
    # heap, and GC pressure under-reported the engine 4x (1.33M e/s
    # recorded vs 5.34M standalone — VERDICT r2 'de-contaminate').
    # The sf corpus is tiny (fixed overhead dominates); this measures
    # sustained posting-entries/s on a corpus big enough to matter.
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "50000"))
    pages_entries_per_sec = None
    if n_pages > 0:
        from riot_spark.sources.corpus import generate_pages

        pages = (
            generate_pages(spark, n_pages)
            .selectExpr(
                "cast(conv(substr(md5(url),1,15),16,10) as long) AS doc_id", "text"
            )
            .cache()
        )
        pages.count()
        # one discarded warm-up build: the first build on a fresh JVM
        # pays codegen/JIT (measured 6.5 s vs 1.3 s steady-state) and,
        # right after heavy prior work on the host, can drag all three
        # timed runs 2x — this row is the headline vs-riot number, so
        # it must measure steady state
        build_index(
            pages,
            EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=cpus),
            cache=False,
        ).postings.count()
        vals = []
        for _ in range(3):  # median-of-3: GC/JIT noise at 32 threads
            t0 = time.perf_counter()
            pidx = build_index(
                pages,
                EngineConfig(
                    index_type=FREQUENCIES_INDEX, num_index_partitions=cpus
                ),
                cache=False,
            )
            pn = pidx.postings.count()
            vals.append(time.perf_counter() - t0)
        t_pages = statistics.median(vals)
        queries["build_pages_50k"] = t_pages
        pages_entries_per_sec = round(pn / t_pages, 1)
        pages.unpersist(blocking=True)
        # drop the pages build's heap garbage before the query-latency
        # sections — measurement isolation, the same reason the pages
        # build itself runs first
        spark.sparkContext._jvm.System.gc()

    # -------- index build (FrequenciesIndex = riot's default mode) ----
    n_parts = min(cpus, max(4, n_docs // 1000))
    cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=n_parts)
    vals = []
    for _ in range(3):  # median-of-3 uncached builds
        t0 = time.perf_counter()
        n_entries = build_index(docs, cfg, cache=False).postings.count()
        vals.append(time.perf_counter() - t0)
    t_build = statistics.median(vals)
    idx = build_index(docs, cfg, cache=True)
    idx.postings.count()  # materialize the cache for the query rows

    eng = SearchEngine(idx)

    def q(req):
        return lambda: eng.search(req).collect()

    queries["build_index"] = t_build
    queries.update({
        "q_and2": timed(q(SearchRequest(text="data query", max_outputs=100))),
        "q_and3": timed(q(SearchRequest(text="join filter sort", max_outputs=100))),
        "q_hot1": timed(q(SearchRequest(text="batch", max_outputs=100))),
        "q_logic": timed(
            q(SearchRequest(must=["data"], should=["query", "spark"], not_in=["dup"]))
        ),
        "q_count": timed(
            q(SearchRequest(text="data query", count_docs_only=True))
        ),
    })
    # latency distribution over distinct 2-term AND queries
    terms = ["data", "query", "join", "filter", "sort", "batch", "group",
             "order", "spark", "hash", "merge", "scan"]
    lat = []
    for i in range(len(terms) - 1):
        vals = []
        for _ in range(3):  # median-of-3: GC/warmth noise swings ~1.3x
            t0 = time.perf_counter()
            eng.search(
                SearchRequest(tokens=[terms[i], terms[i + 1]], max_outputs=100)
            ).collect()
            vals.append(time.perf_counter() - t0)
        lat.append(statistics.median(vals))
    lat.sort()
    p50 = lat[len(lat) // 2]
    p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]

    # batched execution: the whole query set as ONE DataFrame program —
    # the engine's QPS story (riot fans each query to every shard;
    # we amortize one postings pass across all queries)
    batch_reqs = {
        f"b{i}": SearchRequest(tokens=[terms[i], terms[i + 1]], max_outputs=100)
        for i in range(len(terms) - 1)
    }

    def run_batch():
        eng.search_batch(batch_reqs).collect()

    t_batch = timed(run_batch)
    queries["batch_11q"] = t_batch
    batch_qps = len(batch_reqs) / t_batch

    # -------- LocsIndex surfaces: proximity (vectorized float32
    # kernel), the packed-block WAND path, and a fully mixed batch
    lidx = build_index(
        docs, EngineConfig(index_type=LOCS_INDEX, num_index_partitions=n_parts)
    )
    lidx.postings.count()
    leng = SearchEngine(lidx)
    queries["q_proximity2"] = timed(
        lambda: leng.search(
            SearchRequest(tokens=["data", "query"], scorer="float32")
        ).collect()
    )
    mixed = dict(batch_reqs)
    for i in range(4):
        mixed[f"p{i}"] = SearchRequest(
            tokens=[terms[i], terms[i + 2]], scorer="float32",
            criteria="proximity", max_outputs=100,
        )
    mixed["c1"] = SearchRequest(tokens=["data", "query"], count_docs_only=True)
    mixed["o1"] = SearchRequest(tokens=["group", "order"], orderless=True)
    mixed["l1"] = SearchRequest(must=["data"], should=["query", "spark"],
                                not_in=["dup"])
    mixed["r1"] = SearchRequest(tokens=["data", "query"], max_outputs=50,
                                reverse_order=True)
    mixed["w1"] = SearchRequest(tokens=["data"],
                                doc_ids=list(range(0, 200, 2)), max_outputs=50)

    # flat-path A/B witness for the canonical mixed row below (the
    # block path is the default executor once blocks are attached;
    # this row is the same set on the flat fallback, measured in the
    # SAME session so host variance can't fake a regression)
    def run_flat_mixed():
        leng.search_batch(mixed).collect()

    queries[f"batch_flat_mixed{len(mixed)}q"] = timed(run_flat_mixed)

    from riot_spark.blocks import BlockSearchEngine, blocked_from_index

    # pack wall (packer='auto' -> the JVM kernel when riotspark.jar is
    # on the classpath, else Arrow); measured like the builds:
    # median-of-3 on uncached output, then cached for the query sections
    n_block_postings = lidx.postings.count()
    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        blocked_from_index(lidx, doc_block_bits=8, cache=False).blocks.count()
        vals.append(time.perf_counter() - t0)
    t_pack = statistics.median(vals)
    queries["pack_blocks"] = t_pack
    pack_postings_per_sec = round(n_block_postings / t_pack, 1)
    bi = blocked_from_index(lidx, doc_block_bits=8)
    bi.blocks.count()
    beng = BlockSearchEngine(bi)
    queries["q_block_topk"] = timed(
        lambda: beng.search_and(["data", "query"], k=100).collect()
    )
    queries["q_block_proximity"] = timed(
        lambda: beng.search_and(["data", "query"], proximity=True).collect()
    )
    # round-4 routes: metadata-only single-term count (doc_ids bytes
    # never scanned) and the doc-ordered early-exit logic top-k
    queries["q_block_count1"] = timed(
        lambda: beng.search_batch(
            {"c": SearchRequest(tokens=["data"], count_docs_only=True)}
        ).collect()
    )
    queries["q_block_logic_topk"] = timed(
        lambda: beng.search_batch(
            {"l": SearchRequest(must=["data"], not_in=["dup"],
                                max_outputs=100)}
        ).collect()
    )

    # CANONICAL mixed batch: the full shape surface (AND/rev/
    # whitelist, proximity-criteria, logic, count, orderless) through
    # the default dispatch — attach_blocks makes the packed block
    # executor the default and flat the fallback, so this row rides
    # the engine that exists at 100 TB (r03 A/B: 1.82 s block vs
    # 3.81 s flat for the same set).
    leng.attach_blocks(bi)

    def run_mixed():
        leng.search_batch(mixed).collect()

    t_mixed = timed(run_mixed)
    queries[f"batch_mixed{len(mixed)}q"] = t_mixed

    # -------- sf1.0 tier (~500k docs): the gap between the sf0.1
    # artifact and the 10M soak, where a cluster user actually lives.
    # Build throughput here is the honest BASELINE.md comparison (riot
    # published 1.3-2.0M entries/s at ~1M docs).  The generated corpus
    # is cached in /tmp across invocations (content is a pure function
    # of the page id) so repeat runs skip the one-time Python page
    # generation; SPARK_GRAFT_BENCH_SF1=0 disables the tier.
    n_sf1 = int(os.environ.get("SPARK_GRAFT_BENCH_SF1", "500000"))
    sf1 = {}
    if n_sf1 > 0:
        from riot_spark.blocks import BlockSearchEngine, blocked_from_index
        from riot_spark.sources.corpus import generate_pages, pages_to_documents

        pq = f"/tmp/riot_bench_cache/sf1_pages_{n_sf1}.parquet"
        if not os.path.isdir(pq):
            os.makedirs(os.path.dirname(pq), exist_ok=True)
            pages_to_documents(generate_pages(spark, n_sf1)).write.mode(
                "overwrite"
            ).parquet(pq)
        sdocs = spark.read.parquet(pq).select("doc_id", "text").cache()
        sdocs.count()
        spark.sparkContext._jvm.System.gc()
        lcfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=cpus)
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            sf1_entries = build_index(sdocs, lcfg, cache=False).postings.count()
            vals.append(time.perf_counter() - t0)
        queries["sf1_build_locs"] = statistics.median(vals)
        sf1["sf1_build_entries_per_sec"] = round(
            sf1_entries / queries["sf1_build_locs"], 1
        )
        sidx = build_index(sdocs, lcfg, cache=True)
        sidx.postings.count()
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            blocked_from_index(sidx, doc_block_bits=13, cache=False).blocks.count()
            vals.append(time.perf_counter() - t0)
        queries["sf1_pack_blocks"] = statistics.median(vals)
        sf1["sf1_pack_postings_per_sec"] = round(
            sf1_entries / queries["sf1_pack_blocks"], 1
        )
        sbi = blocked_from_index(sidx, doc_block_bits=13)
        sbi.blocks.count()
        seng = SearchEngine(sidx).attach_blocks(sbi)
        # canonical mixed set over the synthetic vocabulary (hot
        # stopword heads — the regime where the one-pass WAND gate
        # engages at this scale)
        sterms = ["the", "of", "and", "a", "to", "in", "is", "it",
                  "you", "that", "he", "was"]
        smixed = {
            f"b{i}": SearchRequest(tokens=[sterms[i], sterms[i + 1]],
                                   max_outputs=100)
            for i in range(len(sterms) - 1)
        }
        for i in range(4):
            smixed[f"p{i}"] = SearchRequest(
                tokens=[sterms[i], sterms[i + 2]], scorer="float32",
                criteria="proximity", max_outputs=100,
            )
        smixed["c1"] = SearchRequest(tokens=["the"], count_docs_only=True)
        smixed["o1"] = SearchRequest(tokens=["people", "water"],
                                     orderless=True)
        smixed["l1"] = SearchRequest(must=["the"], should=["of", "and"],
                                     not_in=["oil"])
        smixed["r1"] = SearchRequest(tokens=["the", "of"], max_outputs=50,
                                     reverse_order=True)
        smixed["w1"] = SearchRequest(tokens=["the"],
                                     doc_ids=list(range(0, 2000, 2)),
                                     max_outputs=50)
        t_smixed = timed(lambda: seng.search_batch(smixed).collect())
        queries[f"sf1_batch_mixed{len(smixed)}q"] = t_smixed
        sf1["sf1_mixed_batch_queries_per_sec"] = round(
            len(smixed) / t_smixed, 2
        )
        sf1["sf1_docs"] = n_sf1
        sf1["sf1_entries"] = sf1_entries

    total = sum(queries.values())
    out = {
        "metric": "index-build + BM25 query wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in queries.items()},
        "sf": sf,
        "n_docs": n_docs,
        "n_index_entries": n_entries,
        "build_docs_per_sec": round(n_docs / t_build, 1),
        "build_entries_per_sec": round(n_entries / t_build, 1),
        "query_p50_s": round(p50, 4),
        "query_p95_s": round(p95, 4),
        "batch_queries_per_sec": round(batch_qps, 2),
        # the canonical mixed row IS the block path (attach_blocks
        # default dispatch); the r4 block_batch_queries_per_sec alias
        # of the same measurement is dropped (ADVICE r4)
        "mixed_batch_queries_per_sec": round(len(mixed) / t_mixed, 2),
        "pages_build_entries_per_sec": pages_entries_per_sec,
        "pack_postings_per_sec": pack_postings_per_sec,
        **sf1,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
