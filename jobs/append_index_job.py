"""spark-submit entry: append a crawl increment to a block store.

    spark-submit --py-files riot_spark.zip jobs/append_index_job.py \
        --store  <existing store written by build_index_job> \
        --input  <parquet path of NEW pages(url, warc_ts, html, text, lang)> \
        [--mode freq|locs] [--partitions 64] [--block-bits 13] \
        [--first-doc-id N]   # dense id offset; default = stored max + 1
        [--compact-above K]  # fold segments into one base when > K exist
        [--synthetic N --synthetic-offset M]  # generate N pages ids [M, M+N)

The daily-ingest shape: the delta is tokenized, packed and appended as
an LSM segment (riot_spark.blocks.append_blocked_index) — the store's
existing bytes are never rewritten, so the job costs O(new pages).
Re-running with unchanged input is a fingerprint skip.  The append-only
contract (new doc ids exceed the stored maximum) is checked by the
append itself.
"""

from __future__ import annotations

import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo_root)
os.environ["PYTHONPATH"] = (
    _repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

import argparse
import json
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--input")
    ap.add_argument("--mode", default="freq", choices=["freq", "locs"])
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=13)
    ap.add_argument("--first-doc-id", type=int, default=-1)
    ap.add_argument("--compact-above", type=int, default=0)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--synthetic-offset", type=int, default=0)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("riot_spark_append").getOrCreate()
    from riot_spark.blocks import (
        append_blocked_index,
        blocked_from_index,
        compact_segments,
        read_blocked_index,
    )
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    t0 = time.time()
    first_id = args.first_doc_id
    if first_id < 0:
        stored = read_blocked_index(spark, args.store)
        hi = stored.blocks.agg(F.max("last_doc_id")).first()[0]
        first_id = int(hi) + 1 if hi is not None else 0
    if args.synthetic:
        pages = generate_pages(
            spark, args.synthetic, start=args.synthetic_offset
        )
        input_paths: list[str] = []
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        pages = spark.read.parquet(args.input)
        input_paths = [args.input]
    # dense ids CONTINUING the stored range: url-ordered within the
    # delta, offset past the stored maximum (the append-only contract)
    docs = pages_to_documents(pages).withColumn(
        "doc_id", F.col("doc_id") + F.lit(first_id)
    )
    cfg = EngineConfig(
        index_type=LOCS_INDEX if args.mode == "locs" else FREQUENCIES_INDEX,
        num_index_partitions=args.partitions,
        build_salts=args.salts,
        salt_block_bits=max(args.block_bits, 13),
    )
    idx = build_index(docs, cfg, cache=False)
    delta = blocked_from_index(
        idx, doc_block_bits=args.block_bits, cache=False
    )
    # the fingerprint must identify the INPUT, not the store state:
    # the auto-derived first_id changes after every append, so baking
    # it in would defeat the skip on a re-run with unchanged input.
    # An EXPLICIT --first-doc-id is part of the request and stays.
    id_repr = args.first_doc_id if args.first_doc_id >= 0 else "auto"
    m = append_blocked_index(
        delta,
        args.store,
        input_paths=input_paths,
        config_repr=(
            f"append:{cfg!r}:{args.block_bits}:{id_repr}"
            f":synthetic={args.synthetic}:{args.synthetic_offset}"
        ),
    )
    compacted = False
    if args.compact_above:
        seg_dir = f"{args.store}/segments"
        n_segs = len(os.listdir(seg_dir)) if os.path.isdir(seg_dir) else 0
        if n_segs > args.compact_above:
            compact_segments(spark, args.store)
            compacted = True
    print(
        json.dumps(
            {
                "segment": m.get("segment"),
                "skipped": bool(m.get("skipped")),
                "n_docs": idx.n_docs,
                "first_doc_id": first_id,
                "compacted": compacted,
                "wall_s": round(time.time() - t0, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
