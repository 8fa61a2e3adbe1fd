"""spark-submit entry: the full training-data pipeline, composed.

pages -> extract -> language-ID + quality filter -> exact dedup ->
MinHash-LSH near-dedup -> inverted-index build + persisted block
store.  Every stage is one of the engine's first-class operators
(functions/text.py, operators/dedup.py, build.py, blocks.py) chained
as a single lazy DataFrame plan per phase — the counts printed per
stage each materialize one action.

Usage (cluster or local):

    spark-submit --py-files riot_spark.zip jobs/pipeline_job.py \
        --input <parquet/iceberg pages(url, warc_ts, html, text, lang)> \
        --output <index path> \
        [--lang en] [--min-quality 0.5] [--mode freq|locs] \
        [--partitions 256] [--synthetic N]

Scale notes: the filters are whole-stage-codegen column expressions
(no Python); both dedup stages are one-shuffle bucketed plans (never
all-pairs); the survivors feed the same salted one-shuffle index
build the standalone build job uses.  Near-dup clusters keep the
minimum doc_id (the canonical member), matching exact_duplicates'
convention.
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
    ap.add_argument("--input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--mode", default="freq", choices=["freq", "locs"])
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--salts", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=13)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument(
        "--no-cache", dest="cache", action="store_false",
        help="disable the MEMORY_AND_DISK stage persists (each stage "
        "then recomputes its full lineage — at cluster scale prefer "
        "checkpointing stages to parquet over either mode)",
    )
    args = ap.parse_args(argv)

    # Bare `python jobs/pipeline_job.py` launches the JVM itself, and
    # the 1 GB default heap OOMs on real inputs; under spark-submit the
    # JVM is already up, so this config is ignored and the submit-time
    # --driver-memory governs.
    spark = (
        SparkSession.builder.appName("riot_spark_pipeline")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    from riot_spark.blocks import blocked_from_index, write_blocked_index
    from riot_spark.build import build_index
    from riot_spark.config import EngineConfig, FREQUENCIES_INDEX, LOCS_INDEX
    from riot_spark.functions.text import text_profile
    from riot_spark.operators.dedup import exact_duplicates, minhash_lsh_pairs
    from riot_spark.sources.corpus import generate_pages, pages_to_documents

    t0 = time.time()
    metrics: dict[str, object] = {}
    if args.synthetic:
        pages = generate_pages(spark, args.synthetic)
        input_paths: list[str] = []
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        pages = spark.read.parquet(args.input)
        input_paths = [args.input]

    # No MEMORY_ONLY corpus caches in this job: at 100 TB the corpus
    # cannot live in executor memory, and in a bare-local smoke run
    # three memory-cached copies OOM the heap long before the
    # operators break a sweat.  The default persists each counted
    # stage at MEMORY_AND_DISK (spills, never OOMs) so the final
    # build doesn't recompute the whole dedup lineage; at cluster
    # scale the equivalent is checkpointing each stage to parquet
    # (--no-cache shows the fully-lazy plan).
    from pyspark import StorageLevel

    def stage(name, df):
        t = time.time()
        if args.cache:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        metrics[name] = df.count()
        metrics[f"{name}_s"] = round(time.time() - t, 2)
        return df

    docs = stage("n_input", pages_to_documents(pages).select("doc_id", "text"))

    # ---- text analysis gate: predicted language + composite quality,
    # fused into ONE explode+agg token pass (text_profile) — half the
    # scan cost of running quality_score and language_id separately.
    keep = (
        text_profile(docs)
        .where(
            (F.col("pred_lang") == args.lang)
            & (F.col("quality") >= args.min_quality)
        )
        .select("doc_id")
    )
    filtered = stage("n_after_filter", docs.join(keep, "doc_id"))

    # ---- exact dedup: normalized-text fingerprint collision, keep
    # the canonical (min doc_id) member.  One shuffle.
    exact_drop = exact_duplicates(filtered).select("doc_id")
    deduped = stage(
        "n_after_exact_dedup", filtered.join(exact_drop, "doc_id", "left_anti")
    )

    # ---- near dedup: MinHash-LSH candidate pairs (bucketed — Sum of
    # bucket sizes squared, never N^2), drop the larger id of each
    # pair so each near-cluster keeps its minimum doc_id.
    # xxhash64 MinHash: ~10x cheaper per shingle than the md5 variant
    # the DuckDB oracle mirrors; same collision statistics
    near_drop = (
        minhash_lsh_pairs(deduped, hash_fn="xxhash64")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = stage(
        "n_after_near_dedup", deduped.join(near_drop, "doc_id", "left_anti")
    )

    # ---- index build + persisted block store over the survivors.
    cfg = EngineConfig(
        index_type=LOCS_INDEX if args.mode == "locs" else FREQUENCIES_INDEX,
        num_index_partitions=args.partitions,
        build_salts=args.salts,
        salt_block_bits=max(args.block_bits, 13),
    )
    idx = build_index(survivors, cfg, cache=False)
    bindex = blocked_from_index(idx, doc_block_bits=args.block_bits, cache=False)
    manifest = write_blocked_index(
        bindex,
        args.output,
        input_paths=input_paths,
        config_repr=repr(
            (args.mode, args.lang, args.min_quality, args.partitions,
             args.salts, args.block_bits, args.synthetic)
        ),
    )
    metrics["n_entries"] = sum(
        p["postings"] for p in manifest.get("partitions", [])
    )
    metrics["wall_s"] = round(time.time() - t0, 2)
    metrics["output"] = args.output
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
