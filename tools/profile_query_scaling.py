"""One-off: profile WHERE the query-batch wall goes at N vs 4N executors.

Runs the same hot-tier top-100 block-executor batch as
tools/bench_scaling.py --query, but with Spark event logging enabled,
then parses the event log into per-stage wall/task-time so the
non-scaling stage is visible instead of guessed.

Usage: python tools/profile_query_scaling.py /root/store10m 1 4
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

n_exec = int(sys.argv[1]); cpe = int(sys.argv[2])
store = sys.argv[3]; parts = int(sys.argv[4]); pairs_csv = sys.argv[5]
evdir = sys.argv[6]
from riot_spark.session import jvm_jar_path
builder = (
    SparkSession.builder.appName(f"prof_query_{n_exec}")
    .master(f"local-cluster[{n_exec},{cpe},12288]")
    .config("spark.executorEnv.PYTHONPATH", "@REPO@")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.io.compression.codec", "zstd")
    .config("spark.sql.shuffle.partitions", str(parts))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", evdir)
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
eng = BlockSearchEngine(bi)
reqs = {
    f"q{i}": SearchRequest(tokens=p.split(":"), max_outputs=100)
    for i, p in enumerate(pairs_csv.split(","))
}
# warm-up (JIT + page cache), then ONE measured run with a job-group
# marker so the event-log parse can exclude warm-up stages
t0 = time.perf_counter()
eng.search_batch(reqs).collect()
warm = time.perf_counter() - t0
spark.sparkContext.setJobGroup("measured", "measured batch")
t0 = time.perf_counter()
n = len(eng.search_batch(reqs).collect())
dt = time.perf_counter() - t0
print(json.dumps({"n_exec": n_exec, "warm_s": warm, "time_s": dt, "rows": n}))
spark.stop()
"""


def parse_eventlog(evdir: str) -> dict:
    """Per-stage wall + task-time for jobs in the 'measured' group."""
    logs = sorted(
        (os.path.join(evdir, f) for f in os.listdir(evdir)),
        key=os.path.getmtime,
    )
    path = logs[-1]
    if os.path.isdir(path):  # eventlog v2 = rolling dir of event files
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.startswith("events_") or f.startswith("eventLog")
        ) or [os.path.join(path, f) for f in os.listdir(path)
              if not f.startswith("appstatus")]
    else:
        files = [path]
    measured_jobs: set[int] = set()
    job_stages: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}

    def lines_iter():
        for fp in files:
            if fp.endswith(".zstd"):
                out = subprocess.run(
                    ["zstd", "-dc", fp], capture_output=True, text=True)
                yield from out.stdout.splitlines()
            else:
                with open(fp) as fh:
                    yield from fh

    for line in lines_iter():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            jid = ev["Job ID"]
            job_stages[jid] = [
                s["Stage ID"] for s in ev.get("Stage Infos", [])
            ]
            if props.get("spark.jobGroup.id") == "measured":
                measured_jobs.add(jid)
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages.setdefault(si["Stage ID"], {}).update({
                "name": si["Stage Name"].split("\n")[0][:70],
                "tasks": si["Number of Tasks"],
                "wall_ms": (si.get("Completion Time", 0)
                            - si.get("Submission Time", 0)),
            })
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            st = stages.setdefault(sid, {})
            st["task_ms"] = st.get("task_ms", 0) + m.get(
                "Executor Run Time", 0)
            st["max_task_ms"] = max(
                st.get("max_task_ms", 0), m.get("Executor Run Time", 0))
            st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            sr = m.get("Shuffle Read Metrics") or {}
            st["sw_mb"] = st.get("sw_mb", 0) + sw.get(
                "Shuffle Bytes Written", 0) / 1e6
            st["sr_mb"] = st.get("sr_mb", 0) + (
                sr.get("Local Bytes Read", 0)
                + sr.get("Remote Bytes Read", 0)) / 1e6
    wanted = sorted(
        {s for j in measured_jobs for s in job_stages.get(j, [])}
    )
    return {sid: stages[sid] for sid in wanted if sid in stages}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    store = sys.argv[1]
    nq = 8
    if "--nq" in sys.argv:
        i = sys.argv.index("--nq")
        nq = int(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    levels = [int(x) for x in sys.argv[2:]] or [1, 4]
    sys.path.insert(0, repo)
    from tools.soak_disk import pick_pairs

    pairs_csv = pick_pairs(store, count=nq)["hot"]
    print(f"hot pairs: {pairs_csv}", flush=True)
    parts = 64
    for n_exec in levels:
        evdir = f"/tmp/prof_ev_{n_exec}"
        import shutil

        shutil.rmtree(evdir, ignore_errors=True)
        os.makedirs(evdir, exist_ok=True)
        code = WORKER.replace("@REPO@", repo)
        out = subprocess.run(
            [sys.executable, "-c", code, str(n_exec), "1", store,
             str(parts), pairs_csv, evdir],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in out.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], out.stderr[-3000:])
            raise SystemExit(1)
        hdr = json.loads(lines[-1])
        print(f"\n=== {n_exec} executors: measured {hdr['time_s']:.2f}s "
              f"(warm-up {hdr['warm_s']:.2f}s) ===")
        prof = parse_eventlog(evdir)
        total_wall = sum(s.get("wall_ms", 0) for s in prof.values())
        for sid, s in prof.items():
            print(f"  stage {sid:>3} wall {s.get('wall_ms', 0)/1e3:7.2f}s "
                  f"task-sum {s.get('task_ms', 0)/1e3:7.2f}s "
                  f"max-task {s.get('max_task_ms', 0)/1e3:6.2f}s "
                  f"gc {s.get('gc_ms', 0)/1e3:5.2f}s "
                  f"sw {s.get('sw_mb', 0):7.1f}MB sr {s.get('sr_mb', 0):7.1f}MB "
                  f"x{s.get('tasks', 0):<3} {s.get('name', '?')}")
        print(f"  stage-wall total {total_wall/1e3:.2f}s "
              f"(driver gap = {hdr['time_s'] - total_wall/1e3:.2f}s)")


if __name__ == "__main__":
    main()
