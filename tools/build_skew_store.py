"""Build a region-skewed disk store for the WAND crossover measurement.

The uniform synthetic corpus cannot be pruned by any block-max scheme
(bounds concentrate — BENCH.md round 3), so this builds the corpus
shape WAND exists for: a hot term in EVERY doc whose tf is 16x inside
one 2%-of-corpus doc region (templated boilerplate / spam-farm shape)
— df = N, but the per-range block-max is 16x higher inside the
region, so tau from the region dominates every other range's bound.

Usage: python tools/build_skew_store.py [n_docs] [out] [block_bits]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/storeskew"
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    from riot_spark.blocks import (
        blocked_from_index,
        write_blocked_index,
    )
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, LOCS_INDEX
    from riot_spark.session import get_spark
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    spark = get_spark("skew-store-build")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    docs = pages_to_documents(generate_pages(spark, n_docs))
    region = n_docs // 50
    reps = F.when(F.col("doc_id") < region, F.lit(16)).otherwise(F.lit(1))
    docs = docs.withColumn(
        "text", F.expr(
            "concat(text, repeat(' trafficpeak', "
            f"IF(doc_id < {region}, 16, 1)))"
        )
    )
    _ = reps
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=128)
    idx = build_index(docs, cfg, cache=False)
    bi = blocked_from_index(idx, doc_block_bits=bits, cache=False)
    m = write_blocked_index(bi, out, input_paths=[], config_repr=f"skew:{n_docs}:{bits}")
    print(f"built {out}: n_docs={m.get('n_docs')} wall={time.monotonic()-t0:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
