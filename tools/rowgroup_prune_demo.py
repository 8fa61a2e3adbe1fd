"""In(block_id) row-group pruning, measured in isolation (round-4 lead).

The term-major store layout (write_blocked_index: repartitionByRange
(term, block_id) + sortWithinPartitions + ~8MB row groups) was built
so a WAND phase's In(block_id) scan pushdown can prune row groups
WITHIN a hot term's run, not just skip other terms' bytes.  The r4
soak measured whole plans; this tool isolates the scan itself:

  term      WHERE term IN (hot terms)                    — the baseline
  contig    + block_id IN (a contiguous 5% id window)    — best case
  scatter   + block_id IN (the same COUNT, evenly spread)— WAND-like
  semijoin  + left-semi join on the same contiguous ids  — the no-
            pushdown control: selection correct, scan unpruned

Every cell runs in a fresh subprocess (new JVM), optionally cold
(drop_caches), and reports wall, /proc/diskstats bytes, selected
rows, and the sum of posting bytes actually decoded — identical for
contig/scatter/semijoin by construction when ids match.  The point is
read_mb: pushdown rows should approach their byte share of the term
run; the semijoin control should read the full run.

Usage:
  python tools/rowgroup_prune_demo.py grid --store /root/store10m
  python tools/rowgroup_prune_demo.py cell --store S --impl contig \
      --terms the,of --frac 0.05 [--cold]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one copy of the measurement helpers — soak_disk owns the diskstats
# device filter and the drop_caches protocol
from tools.soak_disk import _disk_sectors_read, drop_caches  # noqa: E402


def run_cell(args) -> int:
    from pyspark.sql import functions as F

    from riot_spark.session import get_spark

    spark = get_spark(
        "rg_cell", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    spark.sparkContext.setLogLevel("ERROR")
    terms = args.terms.split(",")
    blocks = spark.read.parquet(f"{args.store}/blocks")

    # the id selection is tiny metadata: take each term's block range
    # once (warm, not timed) and derive the contig/scatter id sets
    span = (
        blocks.where(F.col("term").isin(terms))
        .agg(
            F.min("block_id").alias("lo"),
            F.max("block_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    if span["lo"] is None:
        print(f"no rows for terms {terms!r} in {args.store}", file=sys.stderr)
        return 2
    lo, hi = int(span["lo"]), int(span["hi"])
    n_ids = max(1, int((hi - lo + 1) * args.frac))
    if args.impl == "scatter":
        step = max(1, (hi - lo + 1) // n_ids)
        ids = list(range(lo, hi + 1, step))[:n_ids]
    else:  # contig / semijoin share the same contiguous window
        mid = (lo + hi) // 2
        ids = list(range(mid, min(hi, mid + n_ids - 1) + 1))

    scan = blocks.where(F.col("term").isin(terms))
    if args.impl in ("contig", "scatter"):
        scan = scan.where(F.col("block_id").isin(ids))
    elif args.impl == "semijoin":
        sel = spark.createDataFrame([(i,) for i in ids], "block_id LONG")
        scan = scan.join(F.broadcast(sel), "block_id", "left_semi")
    # impl == "term": the full-run baseline

    plan = scan._jdf.queryExecution().executedPlan().toString()
    pushed = "In(block_id" in plan

    # record the temperature HONESTLY: a failed drop (non-root) must
    # not label a warm page cache as cold
    is_cold = bool(args.cold and drop_caches())
    if args.cold and not is_cold:
        print("WARN: cannot drop caches — recording cold=false",
              file=sys.stderr)
    sec0 = _disk_sectors_read()
    t0 = time.monotonic()
    # force a full read of the selected postings bytes (decode proxy)
    got = scan.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.octet_length("doc_ids")).alias("bytes"),
    ).collect()[0]
    wall = time.monotonic() - t0
    read_mb = (_disk_sectors_read() - sec0) * 512 / 1e6
    print(
        json.dumps(
            {
                "impl": args.impl,
                "terms": args.terms,
                "frac": args.frac,
                "n_ids": len(ids),
                "pushed_block_id": bool(pushed),
                "rows": int(got["rows"]),
                "posting_mb": round((got["bytes"] or 0) / 1e6, 1),
                "t_scan_s": round(wall, 3),
                "read_mb": round(read_mb, 1),
                "cold": is_cold,
            }
        )
    )
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    c = sub.add_parser("cell")
    c.add_argument("--store", required=True)
    c.add_argument("--impl", required=True,
                   choices=["term", "contig", "scatter", "semijoin"])
    c.add_argument("--terms", required=True)
    c.add_argument("--frac", type=float, default=0.05)
    c.add_argument("--cold", action="store_true")
    g = sub.add_parser("grid")
    g.add_argument("--store", required=True)
    g.add_argument("--terms", default="the,of,and")
    g.add_argument("--frac", type=float, default=0.05)
    g.add_argument("--impls", default="term,contig,scatter,semijoin")
    args = ap.parse_args()

    if args.cmd == "cell":
        return run_cell(args)

    for impl in args.impls.split(","):
        cmd = [
            sys.executable, os.path.abspath(__file__), "cell",
            "--store", args.store, "--impl", impl,
            "--terms", args.terms, "--frac", str(args.frac), "--cold",
        ]
        p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else f"FAIL {impl}: {p.stderr[-400:]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
