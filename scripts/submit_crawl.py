"""spark-submit entry point: run a synthetic crawl on an existing cluster.

The north-rule deployment shape (``spark-submit --py-files
pyspider_spark.zip scripts/submit_crawl.py``): unlike the local scripts,
this does NOT build its own local[N] master — it attaches to whatever
session spark-submit provides (cluster master, executor confs, memory
all come from the submit command line), applies only the SQL-level confs
from session.BASE_CONFS, and runs the standard crawl-to-exhaustion
bench, printing one JSON summary line.

Example (local check):
    python scripts/package_pyfiles.py
    spark-submit --master 'local[8]' --py-files dist/pyspider_spark.zip \
        scripts/submit_crawl.py --total 20000 --sql-partitions 8
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--total", type=int, default=20000, help="corpus pages")
    ap.add_argument("--hosts", type=int, default=16)
    ap.add_argument("--show", type=int, default=20, help="links per page")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=50, help="max rounds")
    ap.add_argument("--sql-partitions", type=int, default=0,
                    help="override spark.sql.shuffle.partitions (0 = leave)")
    args = ap.parse_args()

    # the session comes from spark-submit; only layer the SQL confs on top
    from pyspider_spark.session import BASE_CONFS

    builder = SparkSession.builder.appName("pyspider-spark-submit")
    for k, v in BASE_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if args.sql_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.sql_partitions))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import synth_documents, synth_robots, synth_seeds

    docs = synth_documents(spark, total=args.total, show=args.show, hosts=args.hosts).cache()
    n_docs = docs.count()
    seeds = synth_seeds(spark, total=args.total, hosts=args.hosts, n_seeds=args.seeds)
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e10, "burst": 1e10,
                            "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}}},
        loop_limit=3 * args.total,
    )
    t0 = time.time()
    report = crawl(
        spark, seeds, docs, cfg, robots=synth_robots(spark, hosts=args.hosts),
        max_rounds=args.rounds, collect_results=False,
        use_bloom=True, bloom_expected=2 * args.total,
    )
    dt = time.time() - t0
    seen = report.frontier.count()
    print(json.dumps({
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "corpus_docs": n_docs,
        "rounds": report.rounds,
        "urls_selected": report.selected_total,
        "urls_seen": seen,
        "sec": round(dt, 2),
        "urls_per_sec": round(report.selected_total / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
