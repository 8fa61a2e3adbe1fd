"""Disk-resident WAND/LSM soak (round-4 #1): cold-cache A/B at 10M docs.

Everything the WAND machinery exists for is the regime where packed
bytes do NOT sit in memory: a pruned doc range is parquet bytes never
read.  This tool measures that regime honestly:

- each measurement runs in a FRESH subprocess (new JVM — no block
  cache, no JIT warmth carried over);
- cold rows drop the OS page cache (`/proc/sys/vm/drop_caches`) first,
  so parquet bytes really come off the disk;
- bytes read per measurement come from /proc/diskstats (sectors*512),
  not from guesses;
- every plan's top-k is hashed and compared — pruning that changes
  results is a bug, not a win.

Plans A/B'd per query tier (term pairs bucketed by document frequency):

  off      WAND gates closed: decode-everything batch (the baseline)
  probe    production defaults: the skew probe decides per query
  twophase forced two-phase walk (bounds agg -> phase-1 kernel ->
           tau collect -> phase-2 kernel, In(block_id) scan pushdown)
  onepass  forced one-pass JVM kernel (tau pruning inside
           BlockQuery.searchAndBatchPruned)

Usage:
  python tools/soak_disk.py --store /root/store10m            # full grid
  python tools/soak_disk.py query --store S --impl off \
      --pairs "the:of,and:to" --k 100                         # one cell
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_WHOLE_DISK = re.compile(r"^(?:[vs]d[a-z]+|nvme\d+n\d+)$")


def _disk_sectors_read() -> int:
    total = 0
    with open("/proc/diskstats") as f:
        for line in f:
            parts = line.split()
            # whole-disk devices only (vda, sda, nvme0n1) — NOT their
            # partitions (vda1, nvme0n1p1), whose sectors the kernel
            # already counts in the whole-disk row, and not loop/ram
            if len(parts) > 6 and _WHOLE_DISK.match(parts[2]):
                total += int(parts[5])
    return total


def drop_caches() -> bool:
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3")
        return True
    except OSError:
        return False


def run_query_cell(args) -> int:
    """One measurement cell, meant to run in a fresh subprocess."""
    from pyspark.sql import functions as F  # noqa: F401

    from riot_spark.blocks import BlockSearchEngine, read_blocked_index
    from riot_spark.query import SearchRequest
    from riot_spark.session import get_spark

    spark = get_spark("soak_cell", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    bi = read_blocked_index(spark, args.store)
    t_open = time.monotonic() - t0

    eng = BlockSearchEngine(bi)
    if args.impl == "off":
        eng.WAND_BATCH_MIN_POSTINGS = 10**18
        eng.WAND_MIN_POSTINGS = 10**18
    elif args.impl in ("twophase", "onepass"):
        eng.WAND_BATCH_MIN_POSTINGS = 0
        eng.WAND_MIN_RANGES = 0
        eng.WAND_FLAT = 2.0
        eng.WAND_IMPL = "twophase" if args.impl == "twophase" else "auto"
    # 'probe': production defaults — the honest gate decides

    pairs = [p.split(":") for p in args.pairs.split(",")]
    reqs = {
        f"q{i}": SearchRequest(tokens=[a, b], max_outputs=args.k)
        for i, (a, b) in enumerate(pairs)
    }
    sec0 = _disk_sectors_read()
    t0 = time.monotonic()
    rows = eng.search_batch(reqs).collect()
    wall = time.monotonic() - t0
    read_mb = (_disk_sectors_read() - sec0) * 512 / 1e6
    # ranked result fingerprint: pruning must be invisible here
    key = sorted(
        (r["query_id"], int(r["rank"]), int(r["doc_id"]),
         f"{float(r['score']):.4f}")
        for r in rows
        if r["rank"] <= args.k
    )
    digest = hashlib.md5(json.dumps(key).encode()).hexdigest()[:12]
    print(
        json.dumps(
            {
                "impl": args.impl,
                "pairs": args.pairs,
                "k": args.k,
                "t_open_s": round(t_open, 3),
                "t_query_s": round(wall, 3),
                "read_mb": round(read_mb, 1),
                "n_rows": len(rows),
                "digest": digest,
            }
        )
    )
    return 0


def pick_pairs(store: str, count: int = 8) -> dict[str, str]:
    """Term pairs per df tier, chosen from the store's own term_stats."""
    from riot_spark.session import get_spark

    spark = get_spark("soak_pick", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    stats = spark.read.parquet(f"{store}/term_stats")
    rows = stats.orderBy("term").collect()
    by_df = sorted(rows, key=lambda r: -r["df"])
    n = len(by_df)

    def tier(lo_frac, hi_frac, count=count):
        lo, hi = int(n * lo_frac), max(int(n * hi_frac), int(n * lo_frac) + count * 2)
        terms = [r["term"] for r in by_df[lo:hi]]
        return ",".join(f"{terms[2*i]}:{terms[2*i+1]}" for i in range(count))

    out = {
        "hot": tier(0.0, 0.002),
        "mid": tier(0.01, 0.02),
        "rare": tier(0.2, 0.3),
    }
    dfs = {t: r["df"] for r in by_df for t in [r["term"]]}
    for name, pairs in out.items():
        ts = [t for p in pairs.split(",") for t in p.split(":")]
        print(
            f"# tier {name}: df range "
            f"[{min(dfs[t] for t in ts)}, {max(dfs[t] for t in ts)}]",
            file=sys.stderr,
        )
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    q = sub.add_parser("query")
    q.add_argument("--store", required=True)
    q.add_argument("--impl", default="off",
                   choices=["off", "probe", "twophase", "onepass"])
    q.add_argument("--pairs", required=True)
    q.add_argument("--k", type=int, default=100)
    g = sub.add_parser("grid")
    g.add_argument("--store", required=True)
    g.add_argument("--k", type=int, default=100)
    g.add_argument("--tiers", default="hot,mid,rare")
    g.add_argument("--impls", default="off,probe,twophase,onepass")
    g.add_argument("--temps", default="cold,warm")
    args = ap.parse_args()

    if args.cmd == "query":
        return run_query_cell(args)

    pairs_by_tier = pick_pairs(args.store)
    results = []
    for tier in args.tiers.split(","):
        for impl in args.impls.split(","):
            for temp in args.temps.split(","):
                if temp == "cold" and not drop_caches():
                    print("WARN: cannot drop caches; skipping cold", file=sys.stderr)
                    continue
                cmd = [
                    sys.executable, os.path.abspath(__file__), "query",
                    "--store", args.store, "--impl", impl,
                    "--pairs", pairs_by_tier[tier], "--k", str(args.k),
                ]
                p = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO
                )
                line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
                if not line:
                    print(f"FAIL {tier}/{impl}/{temp}: {p.stderr[-500:]}",
                          file=sys.stderr)
                    continue
                rec = json.loads(line[-1])
                rec.update({"tier": tier, "temp": temp})
                results.append(rec)
                print(json.dumps(rec))
    # parity: within (tier, temp-independent) every impl must agree
    by_tier: dict[str, set] = {}
    for r in results:
        by_tier.setdefault(r["tier"], set()).add(r["digest"])
    for tier, digests in by_tier.items():
        status = "OK" if len(digests) == 1 else f"MISMATCH {digests}"
        print(f"# parity {tier}: {status}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] not in ("query", "grid"):
        sys.argv.insert(1, "grid")
    elif len(sys.argv) == 1:
        sys.argv.append("grid")
    sys.exit(main())
