"""Interleaved code-level A/B of the dedup_minhash driver query: current
HEAD vs the round-4 final commit (the same pin bench.py's drift control
uses), 3 trials per arm, fresh subprocess session per trial, strictly
interleaved (prev, cur, prev, cur, ...) so box drift hits both arms
equally. Purpose: settle whether the round-5 signature rework
(dedup.minhash_signatures_from_sets, commit 5cab5d7) moves sf0.1
wall-clock against the round-4 committed pipeline, after BENCH drift
probes suggested parity. Writes BENCH/minhash_ab_r5.json.

Run: python scripts/minhash_ab.py [sf_dir] [trials_per_arm=3]
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PIN_SUBJECT_RE = r"^round \d+:"

RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as em
from pyspider_spark.session import get_spark
sf = sys.argv[2]
spark = get_spark("minhash-ab", cores=32,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
q = em.queries()["dedup_minhash"]
q(spark, sf).write.format("noop").mode("overwrite").save()  # warm
spark.catalog.clearCache()
t0 = time.time()
q(spark, sf).write.format("noop").mode("overwrite").save()
print("AB:" + json.dumps({"sec": round(time.time() - t0, 3)}))
spark.stop()
"""


def prev_round_pin() -> str:
    import re

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    log = subprocess.run(
        ["git", "log", "--format=%H %s", "-200"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        if sha != head and re.match(PIN_SUBJECT_RE, subject):
            return sha
    raise SystemExit("no round-N pin commit found")


def run_once(path: str, sf_dir: str) -> float:
    r = subprocess.run(
        [sys.executable, "-c", RUNNER, path, sf_dir],
        capture_output=True, text=True, timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("AB:"):
            return json.loads(line[3:])["sec"]
    raise RuntimeError(f"probe failed: {r.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    pin = prev_round_pin()
    prev_dir = tempfile.mkdtemp(prefix="minhash_ab_pin_")
    archive = subprocess.run(["git", "archive", pin], capture_output=True, cwd=REPO)
    subprocess.run(["tar", "-x", "-C", prev_dir], input=archive.stdout, check=True)

    arms: dict[str, list[float]] = {"prev": [], "cur": []}
    for i in range(n):
        for arm, path in (("prev", prev_dir), ("cur", str(REPO))):
            sec = run_once(path, sf_dir)
            arms[arm].append(sec)
            print(f"trial {i} {arm}: {sec}s", flush=True)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    out = {
        "query": "dedup_minhash",
        "sf_dir": sf_dir,
        "pin": pin[:12],
        "trials_per_arm": n,
        "interleaved": True,
        "prev": arms["prev"],
        "cur": arms["cur"],
        "median_prev": med(arms["prev"]),
        "median_cur": med(arms["cur"]),
        "cur_over_prev": round(med(arms["cur"]) / med(arms["prev"]), 3),
        "measured": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    (REPO / "BENCH" / "minhash_ab_r5.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
