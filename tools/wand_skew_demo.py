"""Block-max WAND pruning-ratio demo on a region-skewed corpus.

The round-3 A/B (BENCH.md) showed that on the uniform synthetic corpus
block-max bounds concentrate near the global max, no scheme can prune,
and the skew probe correctly keeps WAND off.  This demo builds the
corpus shape where WAND *is* the right plan — a hot term whose tf is
concentrated in one doc region (real web corpora have exactly this:
templated boilerplate, spam farms, topic-clustered crawls) — and
reports the PRUNING RATIO: how many doc ranges the two-phase walk
actually scores versus the decode-everything pass.

Wall-clock parity is expected here and not the point: with the blocks
cached in one JVM the whole term decodes in ~30 ms, so Spark job
overhead dominates either plan.  The ratio is what transfers to the
10^12-doc disk-resident index, where every skipped range is postings
that are never read or decoded.

Usage: python tools/wand_skew_demo.py [n_docs] [k] [doc_block_bits]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    from riot_spark.blocks import BlockSearchEngine, blocked_from_index
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, LOCS_INDEX
    from riot_spark.session import get_spark
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    spark = get_spark("wand-skew-demo")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    docs = pages_to_documents(generate_pages(spark, n_docs))
    # region-skewed hot term: tf=16 inside one 2%-of-corpus doc region,
    # tf=1 for every 20th doc elsewhere (df stays ~7% of the corpus,
    # but the per-range block-max is 16x higher inside the region)
    region = n_docs // 50
    reps = (
        F.when(F.col("doc_id") < region, F.lit(16))
        .when(F.col("doc_id") % 20 == 0, F.lit(1))
        .otherwise(F.lit(0))
    )
    docs = docs.withColumn("reps", reps).withColumn(
        "text", F.expr("concat(text, repeat(' trafficpeak', reps))")
    ).drop("reps")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=64)
    idx = build_index(docs, cfg)
    bi = blocked_from_index(idx, doc_block_bits=bits)
    n_blocks = bi.blocks.count()
    print(f"built+packed {n_blocks} block rows in {time.monotonic() - t0:.1f}s")

    if "--store" in sys.argv:
        # the DISK-RESIDENT shape: persist, drop every cache, reopen
        # raw — now a pruned range is parquet bytes never read (the
        # In(block_id) pushdown prunes row groups on the sorted store)
        from riot_spark.blocks import read_blocked_index, write_blocked_index

        store = "/tmp/wand_skew_store"
        write_blocked_index(bi, store, input_paths=[], config_repr="demo")
        bi.blocks.unpersist()
        idx.postings.unpersist()
        spark.catalog.clearCache()
        bi = read_blocked_index(spark, store)
        print(f"store persisted to {store}; caches dropped (cold reads)")

    term = "trafficpeak"
    total = bi.blocks.where(F.col("term") == term).count()

    def timed(fn, label):
        best, rows = 1e9, None
        for _ in range(2):
            t = time.monotonic()
            rows = fn().collect()
            best = min(best, time.monotonic() - t)
        print(f"  {label}: {best:.3f}s, {len(rows)} rows")
        return rows

    plain = BlockSearchEngine(bi)
    plain.WAND_MIN_POSTINGS = 10**18
    full = timed(lambda: plain.search_and([term], k=k), "unpruned decode-all")

    wand = BlockSearchEngine(bi)
    wand.WAND_MIN_POSTINGS = 0
    pruned = timed(lambda: wand.search_and([term], k=k), "WAND auto (probe on)")
    assert [(r["doc_id"], r["score"]) for r in pruned] == [
        (r["doc_id"], r["score"]) for r in full
    ], "WAND result must be rank- and score-identical"

    # pruning ratio: ranges whose bound could beat the kth score
    tau = float(full[k - 1]["score"])
    idf = math.log2(bi.n_docs / wand.bi.lookup_terms([term])[term] + 1.0)
    eps = 2.0**-20
    cutoff = (tau - eps) / (1.0 + eps)
    survivors = (
        bi.blocks.where((F.col("term") == term) & ~F.col("is_label"))
        .where(F.col("norm_max") * F.lit(idf) >= F.lit(cutoff))
        .count()
    )
    chunk = max(8, min(64, k))
    scored = min(total, max(chunk, survivors))
    print(
        f"ranges holding '{term}': {total}; ranges the walk scores "
        f"(first chunk + bound >= tau): <= {scored} "
        f"({100.0 * scored / max(total, 1):.1f}%) — pruning ratio "
        f"{100.0 * (1 - scored / max(total, 1)):.1f}%"
    )
    print(
        "identical top-k both ways; the skipped ranges are postings a "
        "disk-resident index never reads"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
