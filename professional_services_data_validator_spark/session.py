"""SparkSession factory tuned for the validation workload.

Scale posture (designed for a 1000-executor cluster, tested on local[N]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting.
- UTC session timezone everywhere (the reference forces UTC too:
  reference data_validation/clients.py:95-97).
- Arrow enabled for the pandas-UDF drift kernels.
- shuffle partitions default to cluster parallelism; AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "psdv-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with validation-engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it comes from spark-submit and this factory only sets conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # Python workers (pandas-UDF / mapInPandas kernels) import this package
    # by name from cloudpickled closures; driver sys.path does NOT propagate
    # to them. Exporting the package root on PYTHONPATH before the JVM (and
    # its worker daemons) start makes `from <pkg>.operators import ...`
    # resolve in workers no matter the launch cwd. On a real cluster the
    # same job ships dist/psdv_spark.zip via spark-submit --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet scans: split files so local[N] gets N-way scan parallelism
        # even for single-file tables (driver testdata is one file per table).
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # local mode: the driver JVM IS the executor. Fixed-size, pre-touched
        # heap: lazy heap growth faults in pages mid-query (kernel time
        # spikes to 90% on this microVM); pre-touching moves that cost to
        # session startup. On a real cluster spark-submit overrides these.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "20g"))
        # ParallelGC (round 5): the allocation-heavy codegen stages (shingle
        # explode: 208M short-lived strings/pass) measured 20% faster than
        # G1 at local[16] (40.5 vs 50.1 s) — the throughput collector is the
        # right trade for a batch engine with no latency SLO.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '20g')} "
            "-XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        # the dominant operator is the PK-equi full-outer row-compare join:
        # shuffled-hash beats sort-merge by ~30% (no per-side sort of 10^?
        # rows); hash build spills since Spark 3.2 so the memory risk SMJ
        # guards against is handled, and AQE still picks broadcast when a
        # side is small.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    # sandbox: shuffle scratch on tmpfs — the VM's virtio disk writeback
    # stalls dominate shuffle-heavy stages otherwise. On a real cluster
    # spark.local.dir points at executor-local NVMe instead.
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-scratch")
        # local-cluster worker JVMs resolve scratch from SPARK_LOCAL_DIRS
        # env (it overrides spark.local.dir); export it so executor
        # shuffle files land on tmpfs there too
        os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-scratch")
    # local-cluster[k,c,m] (the sandbox's multi-executor emulation — used
    # by the N-vs-4N-executor scaling protocol): size each executor JVM
    # explicitly. Round-5 measurement: a SINGLE local[16] JVM under-scales
    # map stages 3x per-task vs 4 tasks (host-level effect on one process;
    # GC pauses 0.5 s, bandwidth 28 GB/s available, stack samples all
    # RUNNABLE in codegen), while 4 separate 4-core executor JVMs on the
    # same 16 pinned cores run the same stage 2.9x faster — executor-JVM
    # isolation is both the faithful cluster emulation and the faster one.
    if master.startswith("local-cluster"):
        emem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "8g")
        builder = builder.config("spark.executor.memory", emem).config(
            "spark.executor.extraJavaOptions", "-XX:+UseParallelGC"
        )
    # AQE initial shuffle width, GATED ON WORKLOAD SCALE (round-5 A/B).
    # Corpus-scale aggregates want wide-start exchanges: at 5M docs the
    # MinHash aggregate (~265M shingle rows) at cores-many initial
    # partitions divides executor memory across cores-many concurrent
    # 8M-row hash maps and spills — measured as the 16-core leg LOSING
    # per-core throughput vs the 4-core leg; 256-wide start bounds
    # per-task state and AQE coalesces small shuffles back down. But the
    # wide start is NOT free for sub-second interactive queries: at sf0.1
    # a 3-row-result chained aggregate (mutual_info_lang_source) pays 2.1x
    # in 256-task stage waves (interleaved A/B, 12 tries/cell, 0% steal).
    # Small queries never hit the spill the wide start exists to prevent,
    # so the default follows shuffle.partitions; corpus-scale runs opt in
    # via SPARK_GRAFT_INITIAL_PARTS (the in-Spark corpus replication
    # harness implies it), and cluster deploys set it in spark-submit conf
    # sized to executor count.
    # replication >= 100x (40M-turn / multi-M-doc protocol runs) is the
    # corpus-scale regime where the spill was measured; the x10 bench
    # replication stays in the interactive regime.
    ipn = os.environ.get("SPARK_GRAFT_INITIAL_PARTS")
    if ipn is None and (
        int(os.environ.get("SPARK_GRAFT_REPLICATE_DOCS", "1")) >= 100
        or int(os.environ.get("SPARK_GRAFT_REPLICATE", "1")) >= 100
    ):
        ipn = "256"
    if ipn:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", ipn
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
