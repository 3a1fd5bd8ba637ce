"""Kernel-dominance scaling evidence: ONE full scheduling round at a
corpus-scale wave (select -> fetch-join -> explode ~40x links ->
canonicalize -> batch-dedup -> route -> merge -> checkpoint), timed at
local[32] and local[8], interleaved, min-per-core.

Why this experiment: end-to-end crawls at small totals are fixed-cost
bound (few-second rounds can't feed 32 threads in one JVM), so their
wall-clock ratio says nothing about the data path. This measures the
regime a real cluster runs in — rounds of 10^6+ URLs — where the data
path dominates. Writes BENCH/scaling_biground.json.

Run: python scripts/round_scaling.py [total=2000000] [orders=32,8,32,8]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, os, sys, time
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig, RoundState, run_round
from pyspider_spark.session import get_spark
from pyspider_spark.synth import synth_documents, synth_seeds

cores = {cores}; total = {total}; hosts = 16
spark = get_spark("biground%d" % cores, cores=cores, shuffle_partitions=64,
                  extra_confs={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = synth_documents(spark, total=total, show=40, hosts=hosts, partitions=64).cache()
docs.count()
seeds = synth_seeds(spark, total=total, hosts=hosts, n_seeds=50)
cfg = RoundConfig(projects={{"bench": {{"rate": 1e10, "burst": 1e10}}}}, loop_limit=3 * total)
# 3 bootstrap rounds keep waves small (50/2k/80k) while DISCOVERING the
# corpus-scale frontier; the reset below then makes the measured round a
# full-corpus wave without paying for a full crawl first
rep = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=3, collect_results=False)
# reset every task to ready: the measured round selects the WHOLE corpus
f = (rep.frontier.withColumn("status", F.lit(1))
     .withColumn("schedule", F.col("schedule").withField("exetime", F.lit(0.0)))
     .localCheckpoint(eager=True))
f.count()
state = RoundState(frontier=f, round_no=5, qsizes=None)
spark.range(100000).select(F.md5(F.col("id").cast("string"))).count()  # warm workers
t0 = time.time()
out = run_round(state, docs, cfg)           # the round's single stats job
t_stats = time.time() - t0
t0 = time.time()
from pyspider_spark.plans.crawl import CKPT_LEVEL
out.state.frontier.localCheckpoint(eager=True, storageLevel=CKPT_LEVEL)  # the round's checkpoint
t_ckpt = time.time() - t0
print(json.dumps({{"cores": cores, "wave": sum(out.selected_counts.values()),
                   "stats_sec": round(t_stats, 1), "ckpt_sec": round(t_ckpt, 1),
                   "round_sec": round(t_stats + t_ckpt, 1)}}))
spark.stop()
"""


def run_at(cores: int, total: int) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, total=total)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    orders = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "32,8,32,8,32,8").split(",")]
    runs: dict[int, list[dict]] = {}
    for c in orders:
        r = run_at(c, total)
        print(f"local[{c}]:", r)
        runs.setdefault(c, []).append(r)
    best = {c: min(rs, key=lambda r: r["round_sec"]) for c, rs in runs.items()}
    if 8 in best and 32 in best:
        speedup = best[8]["round_sec"] / best[32]["round_sec"]
        print(f"speedup {speedup:.2f}x, efficiency {speedup / 4:.3f}")
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "scaling_biground.json").write_text(
        json.dumps({"total": total, "best": best, "all_runs": runs,
                    "measured": time.strftime("%Y-%m-%d %H:%M:%S")})
    )


if __name__ == "__main__":
    main()
