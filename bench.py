"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus a crawl-to-exhaustion throughput
bench on the synthetic interleaved corpus (the reference 'pyspider bench'
analogue — known link-graph size, dedup converges the crawl).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "crawl": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspider_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline relational + training-data queries (subset of queries())
HEADLINE = [
    "f1_rank_select",
    "f2_merge_on_put",
    "f9_urlseen_antijoin",
    "f13_retry_ladder",
    "f23_status_counts",
    "r1_result_latest",
    "m2_windowed_counters",
    "filter_pushdown",
    "text_token_stats",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_cosine_topk",
    "embedding_near_dup",
]

CRAWL_TOTALS = {"sf0.001": 500, "sf0.01": 2000, "sf0.1": 20000}


def force(df) -> int:
    """Execute fully without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark) -> dict[str, float]:
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
        # measurement hygiene: drop caches a query persisted internally
        # (e.g. minhash's shingle cache) so queries don't contaminate
        # each other's memory budget
        spark.catalog.clearCache()
    return times


def bench_crawl(spark, total: int) -> dict:
    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import synth_documents, synth_robots, synth_seeds

    hosts = 16
    docs = synth_documents(spark, total=total, show=20, hosts=hosts).cache()
    n_docs = docs.count()
    seeds = synth_seeds(spark, total=total, hosts=hosts, n_seeds=20)
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e10, "burst": 1e10,
                            "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}}},
        loop_limit=3 * total,  # fair-share max clamp = total ⇒ unthrottled
    )
    t0 = time.time()
    report = crawl(
        spark, seeds, docs, cfg, robots=synth_robots(spark, hosts=hosts),
        max_rounds=50, collect_results=False, use_bloom=True, bloom_expected=2 * total,
    )
    dt = time.time() - t0
    seen = report.frontier.count()
    docs.unpersist()
    return {
        "sec": round(dt, 2),
        "rounds": report.rounds,
        "urls_selected": report.selected_total,
        "urls_seen": seen,
        "corpus_docs": n_docs,
        "urls_per_sec": round(report.selected_total / dt, 1),
        # refetch_rate: fraction of selects that were re-fetches of an
        # already-seen URL (0.0 = every URL fetched exactly once);
        # convergence: fraction of the reachable corpus discovered
        "refetch_rate": round(1.0 - seen / max(report.selected_total, 1), 4)
        if report.selected_total > seen else 0.0,
        "convergence": round(seen / max(n_docs, 1), 4),
    }


def main() -> None:
    spark = get_spark("pyspider-spark-bench", cores=CPUS,
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    sf = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}.get(sf_name, 0.1)

    times = bench_queries(spark)
    crawl_stats = bench_crawl(spark, CRAWL_TOTALS.get(sf_name, 20000))
    times["crawl_bench"] = crawl_stats["sec"]

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + crawl-to-exhaustion wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": CPUS,
                "crawl": crawl_stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
