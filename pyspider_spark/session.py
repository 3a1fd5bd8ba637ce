"""SparkSession factory tuned for the crawl workload.

Local testing runs on local[N]; the same configs are what we'd submit with
``spark-submit --py-files pyspider_spark.zip`` on a real cluster. AQE is on
so skewed host-buckets get split at runtime (hot-host skew is a first-class
concern per BASELINE.json north rule); shuffle partitions default to the
core count locally — on a 1000-executor cluster this would be set to
~2-3x total cores or left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One place for every scale-relevant knob so tests / bench / entry agree.
BASE_CONFS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones (hot hosts), convert to broadcast when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at its default (true): honoring the 64m
    # advisory size instead was MEASURED to coalesce the minhash/dedup
    # shuffles to ~5 partitions on this box and regress the dominant
    # bench query 13s → 35s (round-4 A/B, BENCH/BASELINE.md §3c) — the
    # small-round fixed-cost tax is cheaper than starving mid-size
    # shuffles of cores.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # the engine is built for Spark 4 ANSI semantics (null-safe F.get /
    # try_* accessors on data paths) — pin it so a host cluster that
    # overrides the default can't silently change expression behavior
    "spark.sql.ansi.enabled": "true",
    # Arrow for all pandas UDFs (URL kernel, bloom probe, minhash...).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Small dims (project config, robots rules, budgets) always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Deterministic timestamps in tests.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: keep row groups reasonable for the local runs; at 100TB
    # this would be tuned with spark.sql.files.maxPartitionBytes=256m.
    "spark.sql.files.maxPartitionBytes": "128m",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Serialized RDD blocks (the per-round frontier checkpoint) compress
    # with lz4: single-socket memory BANDWIDTH is the measured binding
    # resource at corpus-scale waves (BENCH/BASELINE.md §3b) — fewer bytes
    # through the cache beats the extra lz4 CPU at 32 threads.
    "spark.rdd.compress": "true",
}


def get_spark(
    app_name: str = "pyspider-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` pins ``local[cores]`` — used by the bench harness to measure
    scaling efficiency between local[8] and local[32] (the sandbox proxy for
    N vs 4N executors).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.appName(app_name).master(f"local[{cores}]")
    confs = dict(BASE_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cores)
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
