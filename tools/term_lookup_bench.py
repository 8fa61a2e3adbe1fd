"""Term-stats lookup at huge-vocabulary scale (round-5 #8).

Above the ~200k-term driver df-cache gate, every query pays a
distributed filter+collect over term_stats.  This tool builds a
1M-distinct-term store, persists it through the production writer
(term-sorted, small row groups), and measures the per-query df lookup
against an unsorted-layout twin of the same table:

- candidate row groups per probe (parquet min/max stats, counted with
  pyarrow — the groups a stats-aware scan must actually read);
- wall latency of `lookup_terms` (median of N).

Usage: python tools/term_lookup_bench.py [--terms 1000000]
"""

from __future__ import annotations

import argparse
import glob
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def candidate_groups(ts_dir: str, probes: list[str]) -> tuple[int, int]:
    """(groups that could contain a probe, total groups)."""
    import pyarrow.parquet as papq

    cand = total = 0
    for fp in glob.glob(f"{ts_dir}/*.parquet"):
        md = papq.ParquetFile(fp).metadata
        ti = md.schema.names.index("term")
        for g in range(md.num_row_groups):
            total += 1
            st = md.row_group(g).column(ti).statistics
            if st is None or not st.has_min_max:
                cand += 1  # no stats => must read
                continue
            if any(st.min <= p <= st.max for p in probes):
                cand += 1
    return cand, total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--terms", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--out", default="/tmp/term_lookup_store")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from riot_spark.blocks import (
        _write_term_stats,
        read_blocked_index,
        blocked_from_index,
        write_blocked_index,
    )
    from riot_spark.build import build_index_from_tokens
    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX
    from riot_spark.session import get_spark

    spark = get_spark("term_lookup_bench", cores=16)
    spark.sparkContext.setLogLevel("ERROR")

    path = args.out
    if not os.path.isdir(f"{path}/term_stats"):
        # 1M distinct terms over 100k docs: term z<md5(id)> appears in
        # 3 docs each (df=3) -> 3M postings, vocabulary 1M
        tokens = (
            spark.range(args.terms)
            .select(
                F.concat(F.lit("z"), F.md5(F.col("id").cast("string"))).alias("term"),
                F.explode(
                    F.array(*[(F.col("id") * 3 + F.lit(i)) % 100_000 for i in range(3)])
                ).alias("doc_id"),
            )
            .select("doc_id", "term", F.lit(1.0).cast("float").alias("tf"),
                    F.lit(None).cast("array<int>").alias("positions"))
        )
        idx = build_index_from_tokens(
            tokens,
            EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=32),
            cache=False,
        )
        bi = blocked_from_index(idx, doc_block_bits=10, cache=False)
        write_blocked_index(bi, path, input_paths=[], config_repr="1m-terms")
        # unsorted twin: same rows, default layout
        spark.read.parquet(f"{path}/term_stats").repartition(32).write.mode(
            "overwrite"
        ).parquet(f"{path}/term_stats_unsorted")

    bi = read_blocked_index(spark, path)
    assert bi._term_df_cache is None or len(bi._term_df_cache) > 200_000
    bi._term_df_cache = None  # the >200k-vocab regime under test
    unsorted = spark.read.parquet(f"{path}/term_stats_unsorted")

    import hashlib

    probes = [
        "z" + hashlib.md5(str(i * 137_003).encode()).hexdigest()
        for i in range(6)
    ]

    def run_sorted():
        return bi.lookup_terms(probes)

    def run_unsorted():
        rows = unsorted.where(F.col("term").isin(probes)).collect()
        return {r["term"]: r["df"] for r in rows}

    assert run_sorted() == run_unsorted() != {}

    def med(fn):
        vals = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals)

    t_sorted, t_unsorted = med(run_sorted), med(run_unsorted)
    cs, ts_total = candidate_groups(f"{path}/term_stats", probes)
    cu, tu_total = candidate_groups(f"{path}/term_stats_unsorted", probes)
    import json

    print(json.dumps({
        "vocab": args.terms,
        "probe_terms": len(probes),
        "sorted_lookup_s": round(t_sorted, 4),
        "unsorted_lookup_s": round(t_unsorted, 4),
        "sorted_candidate_row_groups": f"{cs}/{ts_total}",
        "unsorted_candidate_row_groups": f"{cu}/{tu_total}",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
