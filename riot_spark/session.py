"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile

from pyspark.sql import SparkSession


def _java_major() -> int:
    """Major version of the JVM Spark will launch (0 if undetectable)."""
    java = os.path.join(os.environ.get("JAVA_HOME", ""), "bin", "java")
    if not os.path.exists(java):
        java = shutil.which("java") or ""
    if not java:
        return 0
    try:
        out = subprocess.run(
            [java, "-version"], capture_output=True, text=True, timeout=10
        ).stderr
        m = re.search(r'version "(\d+)', out)
        return int(m.group(1)) if m else 0
    except Exception:
        return 0


def _gc_opts() -> str:
    """GC flags appropriate for the detected JVM.

    local[32] in one JVM: allocation-heavy string tokenization at 32
    threads makes G1 pause-bound and bimodal (measured 3.3s vs 11.6s on
    identical builds); ZGC stays concurrent.  Generational ZGC needs
    JDK 21+; plain ZGC needs 15+; older JVMs get no extra flags."""
    major = _java_major()
    if major >= 21:
        return "-XX:+UseZGC -XX:+ZGenerational"
    if major >= 15:
        return "-XX:+UseZGC"
    return ""


def jvm_jar_path() -> str | None:
    """Path of the compiled JVM kernel jar (riotspark.jar), if built.

    The jar holds the JVM-side block packer (riot_spark/jvm/
    BlockPack.scala; rebuild with tools/build_jvm.sh).  It is loaded
    via extraClassPath at session creation; sessions created elsewhere
    (the driver harness builds its own SparkSession) simply fall back
    to the Arrow packer — see blocks.jvm_pack_available."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jvm", "riotspark.jar")
    return p if os.path.exists(p) else None


def _local_dir() -> str:
    """tmpfs scratch when /dev/shm is big enough, else the system temp
    dir (containers commonly cap /dev/shm at 64MB — a shuffle there
    dies with no-space errors)."""
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize >= 8 * (1 << 30):
            return "/dev/shm/riot-spark-local"
    except OSError:
        pass
    return os.path.join(tempfile.gettempdir(), "riot-spark-local")


def get_spark(
    app_name: str = "riot_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for this engine.

    On a real cluster these configs come from spark-submit; the knobs
    that matter at 100 TB (AQE, skew-join handling, Arrow batching,
    partition sizing) are set identically here so local plans match
    cluster plans.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_JAVA_OPTS", _gc_opts()),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # shuffle/spill dirs on tmpfs when it is big enough: this box
        # has one shared disk; real cluster nodes have local NVMe.
        # Override via SPARK_LOCAL_DIRS.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", _local_dir()),
        )
        .config("spark.ui.enabled", "false")
    )
    jar = jvm_jar_path()
    if jar:
        # static confs: only effective for the session that launches
        # the JVM — getOrCreate() returning an existing session keeps
        # its classpath, which is why callers probe
        # blocks.jvm_pack_available instead of assuming
        builder = builder.config(
            "spark.driver.extraClassPath", jar
        ).config("spark.executor.extraClassPath", jar)
    return builder.getOrCreate()
