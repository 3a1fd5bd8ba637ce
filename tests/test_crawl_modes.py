"""Crawl-mode equivalences: bloom prefilter path == exact path, and
checkpoint/resume reproduces the uninterrupted run (north rule:
checkpoint-resumable frontier state)."""

import pytest

from pyspider_spark.plans.crawl import crawl, resume
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.sources.store import SnapshotStore
from pyspider_spark.synth import synth_documents, synth_robots, synth_seeds

TOTAL, SHOW, HOSTS, SEEDS = 50, 4, 3, 4


def mk_cfg():
    return RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9,
                            "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}}},
        loop_limit=10000,
    )


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_documents(spark, total=TOTAL, show=SHOW, hosts=HOSTS).cache()
    docs.count()
    return docs


def snapshot(frontier):
    return {
        (r["project"], r["taskid"]): (r["status"], r["seq"], r["schedule"]["retried"])
        for r in frontier.collect()
    }


@pytest.mark.parametrize("flt", ["bloom", "cuckoo"])
def test_urlseen_path_equals_exact_path(spark, corpus, flt):
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    robots = synth_robots(spark, hosts=HOSTS)
    exact = crawl(spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15)
    filtered = crawl(
        spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15,
        use_bloom=True, bloom_expected=4096, urlseen_filter=flt,
    )
    assert exact.rounds == filtered.rounds
    assert exact.selected_total == filtered.selected_total
    assert snapshot(exact.frontier) == snapshot(filtered.frontier)


def test_resume_cuckoo_project_delete_compose(spark, corpus, tmp_path_factory):
    """VERDICT r04 item 7: the three round-4 features COMPOSE — kill a
    two-project crawl mid-run, resume with the cuckoo URL-seen filter
    (rebuilt from the recovered frontier), hit a scheduled project delete
    after the resume point (unlearn + alias repair), and land on the
    exact frontier of the uninterrupted run."""
    seeds = synth_seeds(
        spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS, project="alpha"
    ).unionByName(
        synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS, project="beta")
    )
    robots = synth_robots(spark, hosts=HOSTS)

    def cfg2():
        return RoundConfig(
            projects={"alpha": {"rate": 1e9, "burst": 1e9},
                      "beta": {"rate": 1e9, "burst": 1e9}},
            loop_limit=10000,
        )

    updates = {6: {"beta": {"status": "STOP", "group": "old delete"}}}
    full = crawl(
        spark, seeds, corpus, cfg2(), robots=robots, max_rounds=15,
        use_bloom=True, bloom_expected=4096, urlseen_filter="cuckoo",
        project_updates=updates,
    )

    store = SnapshotStore(str(tmp_path_factory.mktemp("ckpt_cd")), spark)
    crawl(  # killed at round 3 — BEFORE the round-6 delete fires
        spark, seeds, corpus, cfg2(), robots=robots, max_rounds=3, store=store,
        use_bloom=True, bloom_expected=4096, urlseen_filter="cuckoo",
        project_updates=updates,
    )
    resumed = resume(
        spark, store, corpus, cfg2(), robots=robots, max_rounds=15,
        use_bloom=True, bloom_expected=4096, urlseen_filter="cuckoo",
        project_updates=updates,
    )
    assert snapshot(full.frontier) == snapshot(resumed.frontier)
    assert {r["project"] for r in resumed.frontier.select("project").distinct().collect()} == {"alpha"}


def test_bound_postponed_caps_driver_transfer(spark, monkeypatch):
    """VERDICT r04 item 5: a postponed set past the cap must NOT collect
    to the driver — it checkpoints distributedly; under the cap the cheap
    collect path still runs and preserves content."""
    from pyspark.sql import DataFrame

    from pyspider_spark.plans import crawl as crawl_mod

    big = spark.range(0, 5000).selectExpr("'p' AS project", "cast(id as string) AS taskid")
    monkeypatch.setattr(crawl_mod, "POSTPONED_COLLECT_CAP", 1000)
    real_collect = DataFrame.collect

    def forbidden(self, *a, **k):
        raise AssertionError("driver collect on an over-cap postponed set")

    monkeypatch.setattr(DataFrame, "collect", forbidden)
    try:
        bounded = crawl_mod.bound_postponed(spark, big, count=5000)
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)
    assert bounded is not None and bounded.count() == 5000  # distributed path

    small = spark.range(0, 10).selectExpr("'p' AS project", "cast(id as string) AS taskid")
    out = crawl_mod.bound_postponed(spark, small, count=10)
    assert sorted(r["taskid"] for r in out.collect()) == sorted(
        r["taskid"] for r in small.collect()
    )
    assert crawl_mod.bound_postponed(spark, small, count=0) is None


def test_checkpoint_resume_identical(spark, corpus, tmp_path_factory):
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    robots = synth_robots(spark, hosts=HOSTS)

    full = crawl(spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15)

    # interrupted run: stop after 3 rounds (kill point), then resume
    store = SnapshotStore(str(tmp_path_factory.mktemp("ckpt")), spark)
    crawl(spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=3, store=store)
    manifest = store.read_manifest()
    assert manifest["round_no"] == 2  # rounds 0,1,2 committed

    resumed = resume(spark, store, corpus, mk_cfg(), robots=robots, max_rounds=15)
    assert snapshot(full.frontier) == snapshot(resumed.frontier)
    assert full.rounds == resumed.rounds
    # resume with the URL-seen prefilter rebuilt from the recovered
    # frontier (the filter is a cache, never checkpointed) must land on
    # the same frontier; cuckoo exercises the path for both kinds (the
    # resume code is identical up to the filter class)
    store2 = SnapshotStore(str(tmp_path_factory.mktemp("ckpt_ck")), spark)
    crawl(spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=3,
          store=store2, use_bloom=True, bloom_expected=4096, urlseen_filter="cuckoo")
    resumed_f = resume(spark, store2, corpus, mk_cfg(), robots=robots,
                       max_rounds=15, use_bloom=True, bloom_expected=4096,
                       urlseen_filter="cuckoo")
    assert snapshot(full.frontier) == snapshot(resumed_f.frontier)
    # results log = every round's results, no duplicates
    results = store.read_log("results")
    assert results.count() == full.results_total
    assert results.select("taskid").distinct().count() == full.results_total
    # metrics/lineage rows exist for every committed round
    metrics = store.read_log("metrics")
    assert metrics.select("round_no").distinct().count() == full.rounds
