"""Manual smoke: tiny crawl to exhaustion; prints round stats."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.session import get_spark
from pyspider_spark.synth import synth_documents, synth_project_config, synth_robots, synth_seeds

spark = get_spark("smoke", cores=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("WARN")

TOTAL, SHOW, HOSTS = 100, 5, 4
docs = synth_documents(spark, total=TOTAL, show=SHOW, hosts=HOSTS).cache()
print("docs:", docs.count())
docs.show(3, truncate=80)
seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=5)
seeds.show(10, truncate=False)
robots = synth_robots(spark, hosts=HOSTS)

config = RoundConfig(
    projects={
        "bench": {
            "rate": 1e9, "burst": 1e9, "retries": 3,
            "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400},
        }
    },
    loop_limit=10000,
)

t0 = time.time()
report = crawl(
    spark, seeds, docs, config, robots=robots, max_rounds=30,
    on_round=lambda out: print(
        f"round={out.state.round_no - 1} selected={out.selected_counts}"
    ),
)
dt = time.time() - t0
print(f"rounds={report.rounds} selected={report.selected_total} results={report.results_total} in {dt:.1f}s")
fr = report.frontier
fr.groupBy("status").count().show()
n_unique = fr.count()
print("frontier rows (URL-seen set):", n_unique)
