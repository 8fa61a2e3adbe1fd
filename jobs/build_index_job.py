"""spark-submit entry: build the inverted index from a pages table.

Usage (cluster or local):

    zip -r riot_spark.zip riot_spark
    spark-submit --py-files riot_spark.zip jobs/build_index_job.py \
        --input  <parquet/iceberg path of pages(url, warc_ts, html, text, lang)> \
        --output <index path> \
        [--mode freq|locs] [--partitions 256] [--salts 8] \
        [--synthetic N]   # generate N synthetic pages instead of --input

Writes: blocks/ term_stats/ global_stats/ parquet + manifest.json with
per-partition lineage and build metrics. Re-running with unchanged
input is a no-op (resume via input fingerprint).

The SparkSession is built WITHOUT master/core settings — spark-submit
supplies them, so the same script runs on local[*], local-cluster, or
a real cluster unchanged.
"""

from __future__ import annotations

import os
import sys

# allow `python jobs/<job>.py` from a checkout; on a cluster the
# package arrives via spark-submit --py-files instead
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo_root)
# python workers are separate processes: they see PYTHONPATH, not the
# driver's sys.path
os.environ["PYTHONPATH"] = (
    _repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", default="freq", choices=["freq", "locs"])
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=13)
    ap.add_argument("--synthetic", type=int, default=0)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("riot_spark_build").getOrCreate()
    from riot_spark.blocks import blocked_from_index, write_blocked_index
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    t0 = time.time()
    if args.synthetic:
        pages = generate_pages(spark, args.synthetic)
        docs = pages_to_documents(pages)
        input_paths: list[str] = []
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        pages = spark.read.parquet(args.input)
        docs = pages_to_documents(pages)
        input_paths = [args.input]

    cfg = EngineConfig(
        index_type=LOCS_INDEX if args.mode == "locs" else FREQUENCIES_INDEX,
        num_index_partitions=args.partitions,
        build_salts=args.salts,
        salt_block_bits=max(args.block_bits, 13),
    )
    idx = build_index(docs, cfg, cache=False)
    bindex = blocked_from_index(idx, doc_block_bits=args.block_bits, cache=False)
    manifest = write_blocked_index(
        bindex,
        args.output,
        input_paths=input_paths,
        config_repr=repr(
            (args.mode, args.partitions, args.salts, args.block_bits,
             args.synthetic)
        ),
    )
    n_entries = sum(p["postings"] for p in manifest.get("partitions", []))
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "n_docs": manifest.get("n_docs"),
                "avgdl": manifest.get("avgdl"),
                "n_entries": n_entries,
                "wall_s": round(wall, 2),
                "entries_per_sec": round(n_entries / wall, 1) if wall else None,
                "skipped": manifest.get("skipped", False),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
