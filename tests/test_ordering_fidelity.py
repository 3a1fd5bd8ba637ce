"""Exact-match golden tests: the Spark engine must reproduce the reference
model's crawl ordering and URL-seen set under the same seed list +
politeness budget (BASELINE.json north rule; reference contract =
tests/test_scheduler.py / test_task_queue.py semantics)."""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.model_sim import ReferenceSim, SimConfig
from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_robots, synth_seeds

TOTAL, SHOW, HOSTS, SEEDS = 60, 5, 3, 5


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_documents(spark, total=TOTAL, show=SHOW, hosts=HOSTS).cache()
    docs.count()
    return docs


@pytest.fixture(scope="module")
def corpus_dict(corpus):
    rows = corpus.collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }


@pytest.fixture(scope="module")
def seed_rows(spark):
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    return [(r["url"], r["priority"], r["exetime"]) for r in seeds.collect()]


def run_spark(spark, corpus, robots, max_rounds=20, **cfg_kw):
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    cfg = RoundConfig(
        projects={
            "bench": {
                "rate": cfg_kw.pop("rate", 1e9),
                "burst": cfg_kw.pop("burst", 1e9),
                "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400},
                **({"max_per_host_per_round": cfg_kw.pop("max_per_host")}
                   if "max_per_host" in cfg_kw else {}),
            }
        },
        **cfg_kw,
    )
    waves = []
    report = crawl(
        spark, seeds, corpus, cfg, robots=robots, max_rounds=max_rounds,
        on_round=lambda out: waves.append(
            [
                r["taskid"]
                for r in out.wave.select("taskid", "wave_rank")
                .orderBy("wave_rank")
                .collect()
            ]
        ),
    )
    return report, [w for w in waves if w]


def run_sim(corpus_dict, seed_rows, max_rounds=20, **cfg_kw):
    sim = ReferenceSim(corpus_dict, SimConfig(**cfg_kw))
    sim.seed(seed_rows)
    sim.crawl(max_rounds)
    return sim


def assert_match(report, waves, sim):
    sim_waves = [w for w in sim.waves if w]
    assert len(waves) == len(sim_waves), (
        f"round count mismatch: spark={len(waves)} sim={len(sim_waves)}"
    )
    for i, (got, want) in enumerate(zip(waves, sim_waves)):
        assert got == want, f"round {i} pick order mismatch:\n got={got}\nwant={want}"
    spark_seen = {
        r["taskid"]: r["status"] for r in report.frontier.select("taskid", "status").collect()
    }
    assert spark_seen == sim.statuses()


def test_unthrottled_exact_match(spark, corpus, corpus_dict, seed_rows):
    report, waves = run_spark(spark, corpus, synth_robots(spark, hosts=HOSTS))
    sim = run_sim(corpus_dict, seed_rows)
    assert_match(report, waves, sim)


def test_politeness_budget_exact_match(spark, corpus, corpus_dict, seed_rows):
    # rate=burst=7: every wave capped at 7, ordering must still match exactly
    report, waves = run_spark(
        spark, corpus, synth_robots(spark, hosts=HOSTS), max_rounds=25, rate=7.0, burst=7.0
    )
    sim = run_sim(corpus_dict, seed_rows, max_rounds=25, rate=7.0, burst=7.0)
    assert all(len(w) <= 7 for w in waves)
    assert_match(report, waves, sim)


def test_per_host_cap_exact_match(spark, corpus, corpus_dict, seed_rows):
    report, waves = run_spark(
        spark, corpus, synth_robots(spark, hosts=HOSTS), max_rounds=30, max_per_host=3
    )
    sim = run_sim(corpus_dict, seed_rows, max_rounds=30, max_per_host=3)
    assert_match(report, waves, sim)


def test_span_sequence_equality(spark, corpus, corpus_dict):
    """input_hint invariant: per-row span-sequence equality on
    (kind, text, media_ref, order) between what the engine reads and the
    corpus ground truth."""
    got = (
        corpus.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .select("doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["pos"])
        want = corpus_dict[doc_id]
        assert [(r["kind"], r["text"], r["media_ref"], r["offset"]) for r in rows] == want
        offsets = [r["offset"] for r in rows]
        assert offsets == sorted(offsets)  # strictly increasing order
        assert len(set(offsets)) == len(offsets)
