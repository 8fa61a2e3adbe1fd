"""Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction
the same index-build job runs at two parallelism levels on the same
input.  Parallelism here means *executors*: Spark's `local-cluster`
master launches genuinely separate executor JVMs (own heap, own GC,
own shuffle files) on this machine, so N -> 4N executors is measured
the same way it would be on a real cluster — identical job, identical
partitioning (the partition counts belong to the dataset, not the
cluster), only the executor count changes.

Each level runs in its own driver process; the build runs
`1 warm-up + 2` times and the best warm time is taken so JIT
noise doesn't pollute the ratio.  Results are appended to BENCH.md.

Caveat (stated in BENCH.md too): all executors share one machine's
memory bus and disks, so large-core runs under-report what a real 4N
cluster (4x bandwidth) would deliver; the efficiency numbers are a
lower bound in that respect.

Usage: python tools/bench_scaling.py [n_docs] [--pairs 1,4 2,8] [--cores-per-exec 1] [--locs]
       python tools/bench_scaling.py --query STORE [--pairs 1,4] [--nq 8] [--weak] [--parts 64]

`--query STORE` measures the READ path instead: the production hot
8-pair top-100 batch (block executor, one-pass WAND engaged at these
dfs) against a persisted disk store, same protocol — fixed partition
count, each level its own driver process, best warm run of 3.

`--weak` measures WEAK scaling on the read path: the 4N level serves
4x the query volume (the same hot-pair mix repeated with distinct
query ids), which is what a 4x serving cluster actually does —
per-batch driver fan-out cost amortizes over the bigger batch instead
of being charged 4x against the same 8 queries.  Efficiency =
(throughput-per-executor at 4N) / (throughput-per-executor at N).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession
from riot_spark.sources.corpus import generate_pages
from riot_spark.build import build_index
from riot_spark.config import EngineConfig, FREQUENCIES_INDEX

n_exec = int(sys.argv[1]); cpe = int(sys.argv[2])
n_docs = int(sys.argv[3]); parts = int(sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "freq"
spark = (
    SparkSession.builder.appName("scaling")
    .master(f"local-cluster[{n_exec},{cpe},12288]")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    # One shared spinning disk would serialize all executors' shuffle
    # I/O — a sandbox artifact (real cluster nodes each have local
    # disks).  tmpfs shuffle dirs model per-node disk correctly.
    .config("spark.local.dir", "/dev/shm/spark-local")
    # zstd shuffle: trade spare CPU for scarce memory/disk bandwidth
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.shuffle.partitions", str(parts))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
pages = generate_pages(spark, n_docs, n_parts=parts).selectExpr(
    "cast(conv(substr(md5(url),1,15),16,10) as long) AS doc_id", "text").cache()
pages.count()
from riot_spark.config import LOCS_INDEX
cfg = EngineConfig(
    index_type=LOCS_INDEX if mode == "locs" else FREQUENCIES_INDEX,
    num_index_partitions=parts)
best = None; entries = 0
for trial in range(3):  # trial 0 = JIT warm-up, discarded
    t0 = time.perf_counter()
    idx = build_index(pages, cfg, cache=False)
    entries = idx.postings.count()
    dt = time.perf_counter() - t0
    if trial > 0 and (best is None or dt < best):
        best = dt
print(json.dumps({"executors": n_exec, "cores_per_exec": cpe,
                  "time_s": best, "entries": entries, "n_docs": n_docs}))
"""


QUERY_WORKER = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession

n_exec = int(sys.argv[1]); cpe = int(sys.argv[2])
store = sys.argv[3]; parts = int(sys.argv[4]); pairs_csv = sys.argv[5]
from riot_spark.session import jvm_jar_path
builder = (
    SparkSession.builder.appName("scaling_query")
    .master(f"local-cluster[{n_exec},{cpe},12288]")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.shuffle.partitions", str(parts))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
)
jar = jvm_jar_path()
if jar:
    builder = (builder.config("spark.driver.extraClassPath", jar)
               .config("spark.executor.extraClassPath", jar))
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from riot_spark.blocks import BlockSearchEngine, read_blocked_index
from riot_spark.query import SearchRequest
bi = read_blocked_index(spark, store)
eng = BlockSearchEngine(bi)  # production gates: one-pass WAND by df
reqs = {
    f"q{i}": SearchRequest(tokens=p.split(":"), max_outputs=100)
    for i, p in enumerate(pairs_csv.split(","))
}
best = None; n_rows = 0
for trial in range(3):  # trial 0 = JIT + block-cache warm-up, discarded
    t0 = time.perf_counter()
    n_rows = len(eng.search_batch(reqs).collect())
    dt = time.perf_counter() - t0
    if trial > 0 and (best is None or dt < best):
        best = dt
print(json.dumps({"executors": n_exec, "cores_per_exec": cpe,
                  "time_s": best, "entries": len(reqs), "n_docs": n_rows}))
"""


def run_level(repo: str, n_exec: int, cpe: int, n_docs: int, parts: int,
              mode: str = "freq", store: str = "", pairs_csv: str = "") -> dict:
    if mode == "query":
        code = QUERY_WORKER.replace("@REPO@", repo)
        argv = [str(n_exec), str(cpe), store, str(parts), pairs_csv]
    else:
        code = WORKER.replace("@REPO@", repo)
        argv = [str(n_exec), str(cpe), str(n_docs), str(parts), mode]
    out = subprocess.run(
        [sys.executable, "-c", code, *argv],
        capture_output=True, text=True, timeout=1800,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise RuntimeError(f"worker failed at {n_exec} executors")
    return json.loads(lines[-1])


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # positionals = argv minus flags AND minus each flag's value(s)
    value_flags = {"--cores-per-exec": 1, "--query": 1, "--nq": 1,
                   "--parts": 1}
    skip = 0
    args = []
    for i, a in enumerate(sys.argv[1:], 1):
        if skip:
            skip -= 1
            continue
        if a.startswith("--"):
            skip = value_flags.get(a, 0)
            if a == "--pairs":  # variadic: consume until the next flag
                j = i + 1
                while j < len(sys.argv) and not sys.argv[j].startswith("--"):
                    j += 1
                skip = j - i - 1
            continue
        args.append(a)
    n_docs = int(args[0]) if args else 300_000
    cpe = 1
    if "--cores-per-exec" in sys.argv:
        cpe = int(sys.argv[sys.argv.index("--cores-per-exec") + 1])
    # default = the BENCH.md protocol: 1-core executors, both pairs
    # that sit below this machine's shared-memory-bus ceiling
    pairs = [(1, 4), (2, 8)]
    if "--pairs" in sys.argv:
        i = sys.argv.index("--pairs")
        pairs = []
        for p in sys.argv[i + 1:]:
            if p.startswith("--"):
                break
            pairs.append(tuple(map(int, p.split(","))))
    mode = "locs" if "--locs" in sys.argv else "freq"
    store = pairs_csv = ""
    if "--query" in sys.argv:
        mode = "query"
        store = sys.argv[sys.argv.index("--query") + 1]
        # pick the hot-tier pairs ONCE from the store's own term_stats
        # so both levels run the byte-identical batch
        sys.path.insert(0, repo)
        from tools.soak_disk import pick_pairs

        nq = 8
        if "--nq" in sys.argv:
            nq = int(sys.argv[sys.argv.index("--nq") + 1])
        pairs_csv = pick_pairs(store, count=nq)["hot"]
        print(f"hot pairs: {pairs_csv}", flush=True)
    weak = "--weak" in sys.argv and mode == "query"
    # partition count belongs to the DATASET, not the cluster size —
    # fixed across levels and floored so tasks stay cache-friendly
    parts = max(64, 2 * cpe * max(max(p) for p in pairs))
    if "--parts" in sys.argv:
        parts = int(sys.argv[sys.argv.index("--parts") + 1])
    base_n = min(min(p) for p in pairs)

    def level_csv(n_exec: int) -> str:
        # weak scaling: each level serves (n_exec/base) x the SAME
        # query mix — distinct qids, so every repeat is scored
        if not weak:
            return pairs_csv
        return ",".join([pairs_csv] * max(1, n_exec // base_n))

    results: dict[int, dict] = {}
    lines = []
    for n, n4 in pairs:
        for n_exec in (n, n4):
            if n_exec not in results:
                results[n_exec] = run_level(
                    repo, n_exec, cpe, n_docs, parts, mode, store,
                    level_csv(n_exec))
                r = results[n_exec]
                rate = (len(level_csv(n_exec).split(",")) if mode == "query"
                        else r["entries"]) / r["time_s"]
                unit = "queries/s" if mode == "query" else "entries/s"
                print(
                    f"{n_exec} executors x {cpe} cores: {r['time_s']:.2f}s, "
                    f"{rate:,.2f} {unit}", flush=True
                )
        tn, t4 = results[n]["time_s"], results[n4]["time_s"]
        if mode == "query":
            qn = len(level_csv(n).split(","))
            q4 = len(level_csv(n4).split(","))
            eff = ((q4 / t4) / (qn / tn)) / (n4 / n)
            kind = "weak" if weak else "strong"
            label = (f"query {os.path.basename(store)} hot top-100 "
                     f"{kind} ({qn}q@N, {q4}q@4N)")
            lines.append(
                f"| {label} | {n} exec x{cpe} {tn:.2f}s ({qn/tn:.2f} q/s) "
                f"| {n4} exec x{cpe} {t4:.2f}s ({q4/t4:.2f} q/s) "
                f"| {(q4/t4)/(qn/tn):.2f}x | **{eff:.2f}** |"
            )
        else:
            eff = (tn / t4) / (n4 / n)
            ent = results[n]["entries"]
            lines.append(
                f"| {mode} {n_docs} docs / {ent} entries | {n} exec x{cpe} {tn:.2f}s "
                f"({ent/tn:,.0f} e/s) | {n4} exec x{cpe} {t4:.2f}s ({ent/t4:,.0f} e/s) "
                f"| {tn/t4:.2f}x | **{eff:.2f}** |"
            )
        print(f"N={n} -> 4N={n4} executors: speedup {tn/t4:.2f}x, "
              f"efficiency {eff:.2f}")
    job_desc = (
        "Identical hot-tier top-100 block-executor batch (one-pass WAND "
        "engaged at these dfs) against the same persisted disk store"
        if mode == "query"
        else "Identical one-shuffle index build (synthetic Common-Crawl-style "
        "pages, FrequenciesIndex)"
    )
    header = (
        "\n## Scaling evidence (same job, N vs 4N executors)\n\n"
        f"{job_desc}, identical partitioning at both levels; "
        "`local-cluster` master = real separate executor JVMs on this "
        "machine; best warm run of 3 after a discarded JIT warm-up; "
        "efficiency = speedup / (executor ratio). All executors share one "
        "machine's memory bus + disks, so this under-reports a real 4N "
        "cluster; treat as a lower bound.\n\n"
        "| input | T_N | T_4N | speedup | efficiency |\n|---|---|---|---|---|\n"
    )
    if mode == "query":
        # query rows are printed for manual curation into BENCH.md's
        # consolidated read-path section (auto-append caused duplicate
        # near-identical sections)
        print(header + "\n".join(lines))
    else:
        with open(os.path.join(repo, "BENCH.md"), "a") as f:
            f.write(header + "\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
