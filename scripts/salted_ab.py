"""Interleaved salted-vs-unsalted select A/B at the corpus-scale wave.

VERDICT r04 item 2 / ADVICE: the only corpus-scale measurement of the
16-way select salt (BENCH/scaling_biground_salted.json) was n=2 with a
1112s outlier on a drifting box — not evidence. This runs >=3 trials per
arm, strictly interleaved (salted, unsalted, salted, ...) in one session
so both arms see the same box conditions, each trial a fresh subprocess
(same protocol as the AQE-revert A/B, BENCH/BASELINE.md §3c).

The measured quantity is ONE full scheduling round at the reset
whole-corpus wave (the round_scaling.py regime), with
select_salt_buckets=16 vs 1 the only difference.

Run: python scripts/salted_ab.py [total=2000000] [trials_per_arm=3] [repo_dir]
Writes BENCH/scaling_biground_ab.json.
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

total = {total}; salt = {salt}; hosts = 16
spark = get_spark("saltab%d" % salt, cores=32, shuffle_partitions=64,
                  extra_confs={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = synth_documents(spark, total=total, show=40, hosts=hosts, partitions=64).cache()
docs.count()
seeds = synth_seeds(spark, total=total, hosts=hosts, n_seeds=50)
cfg = RoundConfig(projects={{"bench": {{"rate": 1e10, "burst": 1e10}}}},
                  loop_limit=3 * total, select_salt_buckets=salt)
rep = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=3, collect_results=False)
f = (rep.frontier.withColumn("status", F.lit(1))
     .withColumn("schedule", F.col("schedule").withField("exetime", F.lit(0.0)))
     .localCheckpoint(eager=True))
f.count()
state = RoundState(frontier=f, round_no=5, qsizes=None)
spark.range(100000).select(F.md5(F.col("id").cast("string"))).count()
t0 = time.time()
out = run_round(state, docs, cfg)
t_stats = time.time() - t0
t0 = time.time()
from pyspider_spark.plans.crawl import CKPT_LEVEL
out.state.frontier.localCheckpoint(eager=True, storageLevel=CKPT_LEVEL)
t_ckpt = time.time() - t0
print(json.dumps({{"salt": salt, "wave": sum(out.selected_counts.values()),
                   "stats_sec": round(t_stats, 1), "ckpt_sec": round(t_ckpt, 1),
                   "round_sec": round(t_stats + t_ckpt, 1)}}))
spark.stop()
"""


def run_trial(repo: str, salt: int, total: int) -> dict:
    code = RUNNER.format(repo=repo, salt=salt, total=total)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        return {"salt": salt, "error": out.stderr[-2000:]}
    return json.loads(lines[-1])


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    per_arm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repo = sys.argv[3] if len(sys.argv) > 3 else str(REPO)
    trials: list[dict] = []
    for i in range(per_arm):
        for salt in (16, 1):
            t0 = time.time()
            r = run_trial(repo, salt, total)
            r["trial"] = i
            r["wall_incl_setup"] = round(time.time() - t0, 1)
            trials.append(r)
            print(f"trial {i} salt={salt}:", json.dumps(r), flush=True)
    ok = [t for t in trials if "round_sec" in t]
    arms = {}
    for salt in (16, 1):
        xs = sorted(t["round_sec"] for t in ok if t["salt"] == salt)
        if xs:
            arms[str(salt)] = {
                "n": len(xs),
                "median": xs[len(xs) // 2] if len(xs) % 2 else (xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2,
                "min": xs[0], "max": xs[-1], "all": xs,
            }
    result = {"total": total, "interleaved": True, "arms": arms, "trials": trials,
              "measured": time.strftime("%Y-%m-%d %H:%M:%S")}
    if "16" in arms and "1" in arms:
        result["salted_over_unsalted_median"] = round(arms["16"]["median"] / arms["1"]["median"], 3)
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "scaling_biground_ab.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
