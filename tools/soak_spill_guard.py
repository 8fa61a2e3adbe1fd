"""Spill-safety auto-guard soak (round-5 #2, SCALING.md limit 5).

The one-pass kernels buffer each task's shuffled block rows on the JVM
heap and cannot spill.  This tool demonstrates the dispatch-time guard
on the 10M-doc disk store: with `spark.sql.shuffle.partitions` forced
pathologically low (1) and a small driver heap, the UNGUARDED dispatch
(budget disabled) funnels the whole matched set into one task's heap
buffer — the hazard the guard exists for — while the GUARDED run (same
heap, same forced partition conf) re-sizes the block_id exchange from
the driver-side metadata estimate and completes with a digest
identical to the healthy-configuration reference.

Each cell runs in a fresh subprocess (own JVM, own heap cap).

Usage:
  python tools/soak_spill_guard.py run --store /root/store10m
  python tools/soak_spill_guard.py cell --store S --pairs a:b,c:d \
      --parts 1 --budget default --k 100
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(args) -> int:
    from riot_spark.blocks import BlockSearchEngine, read_blocked_index
    from riot_spark.query import SearchRequest
    from riot_spark.session import get_spark

    spark = get_spark(
        "spill_cell",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        shuffle_partitions=args.parts,
    )
    # get_spark floors shuffle partitions at 8; the soak needs the
    # pathological value verbatim
    spark.conf.set("spark.sql.shuffle.partitions", str(args.parts))
    spark.sparkContext.setLogLevel("ERROR")
    if args.budget == "off":
        # effectively infinite budget: needed tasks always 1, so the
        # guard passes the forced-low partition count through — the
        # unguarded hazard twin
        spark.conf.set(BlockSearchEngine.ONEPASS_BUDGET_CONF, str(1 << 60))
    elif args.budget != "default":
        spark.conf.set(BlockSearchEngine.ONEPASS_BUDGET_CONF, args.budget)

    bi = read_blocked_index(spark, args.store)
    eng = BlockSearchEngine(bi)
    eng.WAND_ONEPASS_MIN_POSTINGS = 0  # always the one-pass kernel
    chosen: list = []
    orig = eng._onepass_parts

    def spy(est, bpp):
        out = orig(est, bpp)
        chosen.append({"est_postings": est, "parts": out})
        return out

    eng._onepass_parts = spy

    pairs = [p.split(":") for p in args.pairs.split(",")]
    reqs = {
        f"q{i}": SearchRequest(tokens=list(p), max_outputs=args.k)
        for i, p in enumerate(pairs)
    }
    t0 = time.monotonic()
    rows = eng.search_batch(reqs).collect()
    wall = time.monotonic() - t0
    key = sorted(
        (r["query_id"], int(r["rank"]), int(r["doc_id"]),
         f"{float(r['score']):.4f}")
        for r in rows
        if r["rank"] <= args.k
    )
    digest = hashlib.md5(json.dumps(key).encode()).hexdigest()[:12]
    print(json.dumps({
        "parts_conf": args.parts,
        "budget": args.budget,
        "guard": chosen,
        "t_query_s": round(wall, 3),
        "n_rows": len(rows),
        "digest": digest,
    }))
    return 0


def _spawn(store, pairs, parts, budget, mem, k=100, timeout=900):
    env = dict(os.environ, SPARK_DRIVER_MEM=mem, SPARK_GRAFT_CPUS="8",
               PYTHONPATH=REPO)
    cmd = [sys.executable, os.path.abspath(__file__), "cell",
           "--store", store, "--pairs", pairs, "--parts", str(parts),
           "--budget", budget, "--k", str(k)]
    t0 = time.monotonic()
    try:
        p = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"outcome": "timeout", "wall_s": round(time.monotonic() - t0, 1)}
    out = None
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    if p.returncode == 0 and out:
        out["outcome"] = "ok"
        return out
    tail = "\n".join((p.stderr or "").splitlines()[-30:])
    oom = ("OutOfMemoryError" in (p.stderr or "")
           or "OutOfMemoryError" in (p.stdout or "")
           or p.returncode in (-9, 137, 52))
    return {
        "outcome": "oom" if oom else f"failed rc={p.returncode}",
        "wall_s": round(time.monotonic() - t0, 1),
        "stderr_tail": tail[-2000:],
    }


def run_grid(args) -> int:
    from tools.soak_disk import pick_pairs

    pairs = pick_pairs(args.store, count=8)["hot"]
    print(f"# hot pairs: {pairs}", file=sys.stderr)
    cells = [
        # reference digest: healthy configuration
        ("reference", dict(parts=32, budget="default", mem="8g")),
        # hazard twin: forced 1 partition, small heap, guard disabled
        ("unguarded", dict(parts=1, budget="off", mem=args.mem)),
        # the guard under identical pressure
        ("guarded", dict(parts=1, budget="default", mem=args.mem)),
    ]
    results = {}
    for name, kw in cells:
        print(f"# running {name} {kw} ...", file=sys.stderr)
        results[name] = _spawn(args.store, pairs, k=args.k, **kw)
        print(json.dumps({name: results[name]}), file=sys.stderr)
    summary = {
        "store": args.store,
        "pairs": pairs,
        "heap": args.mem,
        "cells": results,
        "digest_match": (
            results.get("guarded", {}).get("digest")
            == results.get("reference", {}).get("digest")
            and results.get("reference", {}).get("digest") is not None
        ),
    }
    print(json.dumps(summary, indent=2))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("cell")
    c.add_argument("--store", required=True)
    c.add_argument("--pairs", required=True)
    c.add_argument("--parts", type=int, default=1)
    c.add_argument("--budget", default="default")
    c.add_argument("--k", type=int, default=100)
    r = sub.add_parser("run")
    r.add_argument("--store", default="/root/store10m")
    r.add_argument("--mem", default="1200m")
    r.add_argument("--k", type=int, default=100)
    args = ap.parse_args()
    return run_cell(args) if args.cmd == "cell" else run_grid(args)


if __name__ == "__main__":
    sys.exit(main())
