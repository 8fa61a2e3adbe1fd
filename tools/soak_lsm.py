"""LSM read-amplification curve: query cost vs segment count.

Builds a 1M-doc base store, appends 125k-doc segments one at a time
(manual compaction so segments accumulate), and at each fold depth
measures (a) the open+fold wall (read_blocked_index folds root +
segments) and (b) a hot 2-term top-100 on the folded index — then the
compaction wall and the post-compaction query, then delete_from_store.
This is the curve the auto-compaction threshold (max_fold_depth)
trades against: appends stay O(increment) while reads pay one
boundary repack per adjacent pair until compaction folds them.

Usage: python tools/soak_lsm.py [base_docs] [seg_docs] [n_segs] [out]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    base_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    seg_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 125_000
    n_segs = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    out = sys.argv[4] if len(sys.argv) > 4 else "/root/storelsm"
    from riot_spark.blocks import (
        BlockSearchEngine,
        append_blocked_index,
        blocked_from_index,
        compact_segments,
        delete_from_store,
        read_blocked_index,
        write_blocked_index,
    )
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, LOCS_INDEX
    from riot_spark.session import get_spark
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    spark = get_spark("lsm-soak")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig(index_type=LOCS_INDEX, num_index_partitions=64)

    def mk_docs(start, n):
        # `start` shifts global page ids; assign ids on top so segment
        # doc-id ranges strictly increase (the append-only contract)
        docs = pages_to_documents(generate_pages(spark, n, start=start))
        from pyspark.sql import functions as F

        return docs.withColumn("doc_id", F.col("doc_id") + start)

    def measure_query(label, depth):
        t0 = time.monotonic()
        bi = read_blocked_index(spark, out)
        t_open = time.monotonic() - t0
        eng = BlockSearchEngine(bi)
        best = None
        rows = None
        for _ in range(2):
            t0 = time.monotonic()
            rows = eng.search_and(["the", "of"], k=100).collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        bi.release()
        rec = {
            "step": label, "segments": depth,
            "t_open_fold_s": round(t_open, 2),
            "t_query_s": round(best, 2),
            "top1": [int(rows[0]["doc_id"]), round(float(rows[0]["score"]), 4)],
            "n_docs": bi.n_docs,
        }
        print(json.dumps(rec), flush=True)
        return rec

    t0 = time.monotonic()
    base = blocked_from_index(
        build_index(mk_docs(0, base_docs), cfg, cache=False),
        doc_block_bits=13, cache=False,
    )
    write_blocked_index(base, out, input_paths=[], config_repr="lsm-base")
    print(json.dumps({"step": "base_build",
                      "wall_s": round(time.monotonic() - t0, 1)}), flush=True)
    measure_query("query", 0)

    for s in range(n_segs):
        start = base_docs + s * seg_docs
        t0 = time.monotonic()
        delta = blocked_from_index(
            build_index(mk_docs(start, seg_docs), cfg, cache=False),
            doc_block_bits=13, cache=False,
        )
        append_blocked_index(delta, out, input_paths=[],
                             config_repr=f"seg{s}")
        print(json.dumps({"step": "append", "segment": s,
                          "wall_s": round(time.monotonic() - t0, 1)}),
              flush=True)
        if s + 1 in (1, 2, 4, 8):
            measure_query("query", s + 1)

    t0 = time.monotonic()
    m = compact_segments(spark, out)
    print(json.dumps({"step": "compact", "segments_folded": m["segments"],
                      "wall_s": round(time.monotonic() - t0, 1)}), flush=True)
    measure_query("query_postcompact", 0)

    dead = list(range(0, 100_000, 10))
    t0 = time.monotonic()
    dm = delete_from_store(spark, out, dead)
    print(json.dumps({"step": "delete_from_store", "n_deleted": len(dead),
                      "wall_s": round(time.monotonic() - t0, 1),
                      "n_docs_after": dm["n_docs"]}), flush=True)
    measure_query("query_postdelete", 0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
