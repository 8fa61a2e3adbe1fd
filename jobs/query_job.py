"""spark-submit entry: run BM25 top-k queries against a built index.

    spark-submit --py-files riot_spark.zip jobs/query_job.py \
        --index <path written by build_index_job> \
        --query "terms of one query" [--query "..." ...] \
        [--k 10] [--output <parquet path>]

Queries run as ONE batched job over the block index; results print as
JSON lines (query_id, doc_id, score, rank) or write to --output.
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

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--output")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("riot_spark_query").getOrCreate()
    from riot_spark.blocks import BlockSearchEngine, read_blocked_index

    from riot_spark.query import SearchRequest

    bindex = read_blocked_index(spark, args.index)
    eng = BlockSearchEngine(bindex)
    reqs = {
        f"q{qi}": SearchRequest(
            tokens=[t for t in qtext.lower().split(" ") if t],
            max_outputs=args.k,
        )
        for qi, qtext in enumerate(args.query)
    }
    # ONE action for the whole query set.  Ranks stay riot's float32
    # semantics; the cast keeps the job's output contract (score
    # DOUBLE) for downstream readers of earlier outputs.
    res = eng.search_batch(reqs).withColumn(
        "score", F.col("score").cast("double")
    )
    if args.output:
        res.write.mode("overwrite").parquet(args.output)
    else:
        for r in res.orderBy("query_id", "rank").collect():
            print(
                json.dumps(
                    {
                        "query_id": r["query_id"],
                        "doc_id": int(r["doc_id"]),
                        "score": float(r["score"]),
                        "rank": int(r["rank"]),
                    }
                )
            )
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
