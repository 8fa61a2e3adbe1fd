"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N).

No real cluster exists in this sandbox, so per the driver instruction
the same index-build job runs at two parallelism levels (local[N] vs
local[4N]) on the same input; efficiency = (T_N / T_4N) / 4.

Each level runs in its own JVM (subprocess); the build runs
`warm + repeats` times and the best warm time is taken so JIT noise
doesn't pollute the ratio.  Results are appended to BENCH.md.

Usage: python tools/bench_scaling.py [n_docs] [N] [--pairs 2,8 8,32]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from riot_spark.session import get_spark
from riot_spark.sources.corpus import generate_pages
from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX

cores = int(sys.argv[1]); n_docs = int(sys.argv[2])
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = generate_pages(spark, n_docs).selectExpr(
    "cast(conv(substr(md5(url),1,15),16,10) as long) AS doc_id", "text").cache()
pages.count()
cfg = EngineConfig(index_type=FREQUENCIES_INDEX, num_index_partitions=cores)
best = None; entries = 0
for trial in range(4):  # trial 0 = JIT warm-up, discarded
    t0 = time.perf_counter()
    idx = build_index(pages, cfg, cache=False)
    entries = idx.postings.count()
    dt = time.perf_counter() - t0
    if trial > 0 and (best is None or dt < best):
        best = dt
print(json.dumps({"cores": cores, "time_s": best, "entries": entries,
                  "n_docs": n_docs}))
"""


def run_level(repo: str, cores: int, n_docs: int) -> dict:
    code = WORKER.replace("@REPO@", repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_docs)],
        capture_output=True, text=True, timeout=1200,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    pairs = [(8, 32)]
    if "--pairs" in sys.argv:
        i = sys.argv.index("--pairs")
        pairs = [tuple(map(int, p.split(","))) for p in sys.argv[i + 1 :]]
    results = {}
    lines = []
    for n, n4 in pairs:
        for cores in (n, n4):
            if cores not in results:
                results[cores] = run_level(repo, cores, n_docs)
                r = results[cores]
                print(
                    f"local[{cores}]: {r['time_s']:.2f}s, "
                    f"{r['entries']/r['time_s']:,.0f} entries/s", flush=True
                )
        tn, t4 = results[n]["time_s"], results[n4]["time_s"]
        eff = (tn / t4) / (n4 / n)
        ent = results[n]["entries"]
        lines.append(
            f"| {n_docs} docs / {ent} entries | local[{n}] {tn:.2f}s "
            f"({ent/tn:,.0f} e/s) | local[{n4}] {t4:.2f}s ({ent/t4:,.0f} e/s) "
            f"| {tn/t4:.2f}x | **{eff:.2f}** |"
        )
        print(f"N={n} -> 4N={n4}: speedup {tn/t4:.2f}x, efficiency {eff:.2f}")
    header = (
        "\n## Scaling evidence (same job, two parallelism levels)\n\n"
        "Identical index build (synthetic Common-Crawl-style pages, "
        "FrequenciesIndex) per JVM, best warm run of 3 after a discarded "
        "JIT warm-up; efficiency = speedup / (core ratio).\n\n"
        "| input | T_N | T_4N | speedup | efficiency |\n|---|---|---|---|---|\n"
    )
    with open(os.path.join(repo, "BENCH.md"), "a") as f:
        f.write(header + "\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
