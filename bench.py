"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus a crawl-to-exhaustion throughput
bench on the synthetic interleaved corpus (the reference 'pyspider bench'
analogue — known link-graph size, dedup converges the crawl).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query MEDIAN sec...}, "spread": {...[min,max]...},
   "sf": ..., "crawl": {...}}

Measurement hygiene (this box's wall-time noise is 2-3x run-to-run): each
query gets one uncounted warm-up run, then SPARK_GRAFT_BENCH_TRIALS (default
3) timed runs with cache clearing between; the reported figure is the
median, with [min, max] spread alongside so BENCH_rN files are comparable
across rounds without a judge re-run. The crawl bench is median-of-trials
too (no extra warm-up: a multi-round crawl self-warms on round 0).
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
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

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
    # round 5: corpus-prep family (operators/corpus)
    "boilerplate_strip",
    "ngram_contamination",
    "pack_sequences",
    "rebalance_mix",
    "dedup_paragraphs",
    "url_filter",
    # round 5 session 2: learned quality gate + shard writer layout
    "quality_classifier",
    "training_shards",
    # round 5 session 3: substring cut list + CCNet terciles
    "dup_substring_spans",
    "perplexity_buckets",
    # round 5 session 4: cut application + Gopher document rules
    "apply_span_cuts",
    "gopher_rules",
    # round 5 session 4: incremental new-vs-archive fuzzy dedup
    "incremental_minhash",
    # round 5 session 4: domain-level source gating
    "domain_curation",
    # round 5 session 5: exact prefix-filter join + per-source cap
    "allpairs_exact",
    "per_source_cap",
    # round 5 session 6: leakage-safe split (minhash pairs -> components
    # -> hashed split). winnow_overlap stays oracle-only: the synthetic
    # corpus's template vocabulary makes nearly every fingerprint hot, so
    # its inverted-index join volume (~66 s at sf0.1) measures the
    # corpus's pathology, not the operator (real-web fingerprint sharing
    # is sparse; the hot-fp guard bounds it there).
    "leakage_split",
    # round 5 session 7: media perceptual-hash near-dup (synth + variants
    # + phash64 one narrow mapInPandas pipeline, pigeonhole Hamming join)
    "media_near_dup",
    # round 5 session 7: doc-level near-dup over interleaved text+media
    # docs (minhash text vote + phash media-containment vote)
    "interleaved_near_dup",
]

CRAWL_TOTALS = {"sf0.001": 500, "sf0.01": 2000, "sf0.1": 20000}


def force(df) -> int:
    """Execute fully without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def bench_queries(spark) -> tuple[dict[str, float], dict[str, list[float]]]:
    qs = entrymod.queries()
    times: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE:
        # warm-up (uncounted): JIT, python-worker spin-up, page cache
        force(qs[name](spark, SF_DIR))
        spark.catalog.clearCache()
        trials = []
        for _ in range(TRIALS):
            t0 = time.time()
            force(qs[name](spark, SF_DIR))
            trials.append(time.time() - t0)
            # measurement hygiene: drop caches a query persisted internally
            # (e.g. minhash's shingle cache) so queries don't contaminate
            # each other's memory budget
            spark.catalog.clearCache()
        times[name] = round(_median(trials), 3)
        spread[name] = [round(min(trials), 3), round(max(trials), 3)]
    return times, spread


# --- cross-round drift control (VERDICT r04 item 8) -------------------------
# This box's wall-clock noise spans 2-3x across days, so cross-round
# absolute comparisons are meaningless without a same-session control.
# drift_ab re-runs two pinned probe queries under the PREVIOUS round's
# committed code (git-archived checkout) interleaved with the current
# code, each in a fresh subprocess session: the prev/cur ratio separates
# real code deltas from box drift in every future BENCH_rN comparison.

DRIFT_QUERIES = ["f1_rank_select", "dedup_minhash"]

_DRIFT_RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as em
from pyspider_spark.session import get_spark
sf = sys.argv[2]; names = sys.argv[3].split(",")
spark = get_spark("drift-probe", cores={cpus},
                  extra_confs={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
qs = em.queries()
out = {{}}
for name in names:
    qs[name](spark, sf).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    t0 = time.time()
    qs[name](spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
    spark.catalog.clearCache()
print("DRIFT:" + json.dumps(out))
spark.stop()
"""


def _prev_round_commit() -> str | None:
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=repo, timeout=30,
        ).stdout.strip()
        log = subprocess.run(
            ["git", "log", "--format=%H %s", "-200"],
            capture_output=True, text=True, cwd=repo, timeout=30,
        ).stdout
    except Exception:
        return None
    import re

    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        # never pin HEAD itself: when the round-N commit IS the checkout,
        # the A/B would compare the current code against itself
        if sha != head and re.match(r"^round \d+:", subject):
            return sha
    return None


def bench_drift_ab() -> dict | None:
    """Interleaved prev-round-pin vs current-code probe (2 runs per arm,
    fresh subprocess session each, min-of-runs per arm). Returns None when
    disabled (SPARK_GRAFT_DRIFT_AB=0) or no pin/checkout is available."""
    import subprocess
    import tempfile

    if os.environ.get("SPARK_GRAFT_DRIFT_AB", "1") == "0":
        return None
    pin = _prev_round_commit()
    if pin is None:
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    prev_dir = tempfile.mkdtemp(prefix="drift_pin_")
    try:
        archive = subprocess.run(
            ["git", "archive", pin], capture_output=True, cwd=repo, timeout=60
        )
        subprocess.run(
            ["tar", "-x", "-C", prev_dir], input=archive.stdout, timeout=60, check=True
        )
    except Exception:
        return None

    def probe(path: str) -> dict | None:
        # a wedged/failed probe must never abort the whole bench run —
        # the main measurements are already in hand by the time this runs
        code = _DRIFT_RUNNER.format(cpus=CPUS)
        try:
            r = subprocess.run(
                [sys.executable, "-c", code, path, SF_DIR, ",".join(DRIFT_QUERIES)],
                capture_output=True, text=True, timeout=1200,
            )
            for line in r.stdout.splitlines():
                if line.startswith("DRIFT:"):
                    return json.loads(line[len("DRIFT:"):])
        except Exception:
            pass
        return None

    arms: dict[str, list[dict]] = {"prev": [], "cur": []}
    try:
        for _ in range(2):  # interleaved: prev, cur, prev, cur
            for arm, path in (("prev", prev_dir), ("cur", repo)):
                got = probe(path)
                if got:
                    arms[arm].append(got)
    finally:
        import shutil

        shutil.rmtree(prev_dir, ignore_errors=True)
    if not arms["prev"] or not arms["cur"]:
        return None
    best = {
        arm: {q: min(run[q] for run in runs) for q in DRIFT_QUERIES}
        for arm, runs in arms.items()
    }
    return {
        "pin": pin[:12],
        "queries": DRIFT_QUERIES,
        "prev": best["prev"],
        "cur": best["cur"],
        "cur_over_prev": {
            q: round(best["cur"][q] / best["prev"][q], 3) for q in DRIFT_QUERIES
        },
        "protocol": "interleaved prev/cur subprocess sessions, warmed, min of 2",
    }


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
        # cumulative fixed-cost decomposition across rounds (§3c): py4j/
        # Catalyst DAG build, stats collect, checkpoint, URL-seen add
        "timings": report.timings,
    }


def main() -> None:
    spark = get_spark("pyspider-spark-bench", cores=CPUS,
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    sf = {"sf0.001": 0.001, "sf0.01": 0.01, "sf0.1": 0.1}.get(sf_name, 0.1)

    times, spread = bench_queries(spark)
    crawl_trials = [
        bench_crawl(spark, CRAWL_TOTALS.get(sf_name, 20000)) for _ in range(TRIALS)
    ]
    spark.stop()  # drift probes run in their OWN sessions — never two at once
    try:
        drift_ab = bench_drift_ab()
    except Exception:
        drift_ab = None  # the control is optional; never lose the run
    crawl_trials.sort(key=lambda c: c["sec"])
    crawl_stats = crawl_trials[len(crawl_trials) // 2]  # median trial by sec
    times["crawl_bench"] = crawl_stats["sec"]
    spread["crawl_bench"] = [crawl_trials[0]["sec"], crawl_trials[-1]["sec"]]

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline queries + crawl-to-exhaustion wall time"
                f" (median of {TRIALS}, warmed)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "spread": spread,
                "sf": sf,
                "cpus": CPUS,
                "trials": TRIALS,
                "crawl": crawl_stats,
                "drift_ab": drift_ab,
            }
        )
    )


if __name__ == "__main__":
    main()
