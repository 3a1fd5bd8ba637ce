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


@pytest.mark.parametrize("flt", ["stored-bloom", "stored-cuckoo"])
def test_stored_filter_path_equals_exact_path(spark, corpus, flt, tmp_path_factory):
    """The parquet-resident URL-seen filter (10^10 posture: driver holds
    only a path) drives a full crawl to the same frontier as exact-only
    routing."""
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    robots = synth_robots(spark, hosts=HOSTS)
    exact = crawl(spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15)
    stored = crawl(
        spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15,
        use_bloom=True, bloom_expected=4096, urlseen_filter=flt,
        urlseen_path=str(tmp_path_factory.mktemp("flt_eq")),
    )
    assert exact.rounds == stored.rounds
    assert snapshot(exact.frontier) == snapshot(stored.frontier)


def test_stored_filter_resume_catches_up_by_tag(spark, corpus, tmp_path_factory):
    """Resume with a stored filter reopens the committed parquet version
    and adds ONLY the rounds past its through_round tag — never a full
    rebuild — then lands on the uninterrupted run's frontier."""
    from pyspider_spark.operators.urlseen import StoredFilter

    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=SEEDS)
    robots = synth_robots(spark, hosts=HOSTS)
    full = crawl(
        spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=15,
        use_bloom=True, bloom_expected=4096,
    )

    store = SnapshotStore(str(tmp_path_factory.mktemp("ckpt_sf")), spark)
    fpath = str(tmp_path_factory.mktemp("flt_sf"))
    crawl(  # killed at round 3
        spark, seeds, corpus, mk_cfg(), robots=robots, max_rounds=3, store=store,
        use_bloom=True, bloom_expected=4096, urlseen_filter="stored-bloom",
        urlseen_path=fpath,
    )
    # the on-disk filter is tagged consistent through the last snapshot
    reopened = StoredFilter(spark, fpath, kind="bloom", n_shards=16,
                            expected_per_shard=max(1024, 4096 // 16))
    assert reopened.tag == {"through_round": 2}

    # catch-up must be the tag delta, not a full-frontier rebuild: count
    # adds by row volume through the filter's add_df
    added = []
    orig_add = StoredFilter.add_df

    def counting_add(self, df, taskid_col="taskid", peak_acc=None, tag=None):
        added.append(df.count())
        return orig_add(self, df, taskid_col=taskid_col, peak_acc=peak_acc, tag=tag)

    StoredFilter.add_df = counting_add
    try:
        resumed = resume(
            spark, store, corpus, mk_cfg(), robots=robots, max_rounds=15,
            use_bloom=True, bloom_expected=4096, urlseen_filter="stored-bloom",
            urlseen_path=fpath,
        )
    finally:
        StoredFilter.add_df = orig_add
    # tag says through round 2 and the manifest is at round 2 -> through ==
    # last -> NO catch-up pass at all: every recorded add is one resumed
    # round's delta (a full rebuild would show an extra, frontier-sized add)
    assert added, "resume ran no rounds?"
    # CrawlReport.rounds is the TOTAL round counter (incl. the 3 killed-run
    # rounds); the resumed loop itself ran rounds - 3 of them
    assert len(added) == resumed.rounds - 3
    frontier_size = full.frontier.count()
    assert all(a < frontier_size for a in added)
    assert snapshot(full.frontier) == snapshot(resumed.frontier)


def test_stored_filter_param_mismatch_refuses(spark, tmp_path):
    """Reopening a stored filter with different sizing would mis-address
    every probe — must raise, not corrupt."""
    from pyspider_spark.operators.urlseen import StoredFilter

    path = str(tmp_path / "flt")
    sf = StoredFilter(spark, path, kind="bloom", n_shards=8, expected_per_shard=1000)
    sf.add_df(spark.range(5).selectExpr("md5(cast(id as string)) AS taskid"))
    with pytest.raises(ValueError, match="params"):
        StoredFilter(spark, path, kind="bloom", n_shards=16, expected_per_shard=1000)


def test_stored_filter_delete_clears_tag(spark, tmp_path):
    """delete_df must clear the through_round tag: post-delete state is
    not a superset of earlier snapshots, so resume may not trust it."""
    from pyspider_spark.operators.urlseen import StoredFilter

    ids = spark.range(50).selectExpr("md5(cast(id as string)) AS taskid")
    sf = StoredFilter(spark, str(tmp_path / "flt"), kind="cuckoo",
                      n_shards=8, expected_per_shard=1000)
    sf.add_df(ids, tag={"through_round": 4})
    assert sf.tag == {"through_round": 4}
    sf.delete_df(ids.limit(10))
    assert sf.tag is None
    reopened = StoredFilter(spark, str(tmp_path / "flt"), kind="cuckoo",
                            n_shards=8, expected_per_shard=1000)
    assert reopened.tag is None
