"""Scaling of the data-parallel crawl kernel (one job, no round barriers):
explode link spans → canonicalize (Arrow UDF) → md5 taskid → host →
dedup count. This is the work that dominates a real cluster round; the
round *orchestration* (driver-side, O(#projects)) is measured separately
by scaling_bench.py.

Run: python scripts/kernel_scaling.py [total] [show]
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
from pyspider_spark.functions import urlkit
from pyspider_spark.session import get_spark
from pyspider_spark.synth import synth_documents

cores = {cores}
spark = get_spark("kernel-scaling", cores=cores, shuffle_partitions=256,
                  extra_confs={{"spark.ui.showConsoleProgress": "false",
                                "spark.sql.execution.arrow.maxRecordsPerBatch": "65536"}})
spark.sparkContext.setLogLevel("ERROR")
docs = synth_documents(spark, total={total}, show={show}, hosts=16, partitions=256).cache()
n = docs.count()  # materialize outside the timed window

def kernel():
    links = docs.select(
        F.col("doc_id").alias("base"),
        F.explode(F.filter("spans", lambda s: s.kind == F.lit("link"))).alias("s"),
    )
    cand = links.select(urlkit.canonical(F.col("s").text, F.col("base")).alias("url"))
    cand = cand.select(
        urlkit.taskid_of("url").alias("taskid"), urlkit.host_of(F.col("url")).alias("host")
    )
    uniq = cand.groupBy("taskid").agg(F.count("*").alias("n"), F.first("host").alias("host"))
    got = uniq.groupBy("host").count()
    got.write.format("noop").mode("overwrite").save()

kernel()  # warm-up: JIT, python workers, cache residency
times = []
for _ in range(3):
    t0 = time.time()
    kernel()
    times.append(time.time() - t0)
times.sort()
dt = times[1]  # median of 3
n_links = {total} * {show}
print(json.dumps({{"cores": cores, "sec": round(dt, 2),
                   "links": n_links, "links_per_sec": round(n_links / dt)}}))
spark.stop()
"""


def run_at(cores: int, total: int, show: int) -> dict:
    code = RUNNER.format(repo=str(REPO), cores=cores, total=total, show=show)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=3000)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise RuntimeError("runner failed")
    return json.loads(lines[-1])


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    show = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    r8 = run_at(8, total, show)
    print("local[8]: ", r8)
    r32 = run_at(32, total, show)
    print("local[32]:", r32)
    speedup = r8["sec"] / r32["sec"]
    print(json.dumps({"speedup": round(speedup, 2), "efficiency": round(speedup / 4, 3),
                      "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
