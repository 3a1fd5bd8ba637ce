"""Dynamic project updates mid-crawl (VERDICT r01 item 9 — quantized
_update_projects, scheduler.py:206-259): an itag bump + reseed at round k
must recrawl previously-SUCCESS tasks via the F10 itag-restart path."""

from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_seeds

TOTAL, HOSTS = 30, 2


def mk_cfg():
    return RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9, "itag": "v1"}},
        loop_limit=10000,
    )


def test_itag_bump_recrawls_success_tasks(spark):
    docs = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS).cache()
    docs.count()
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3)

    plain = crawl(spark, seeds, docs, mk_cfg(), robots=None, max_rounds=30)
    assert plain.rounds < 12  # converged well before the update round

    waves = []
    updated = crawl(
        spark, seeds, docs, mk_cfg(), robots=None, max_rounds=30,
        project_updates={12: {"bench": {"itag": "v2", "reseed": True}}},
        on_round=lambda o: waves.append(sum(o.selected_counts.values())),
    )
    docs.unpersist()

    # the whole reachable graph was crawled twice: once under v1, once
    # after the round-12 itag bump (every candidate now carries v2, so
    # every SUCCESS task restarts exactly once)
    assert updated.selected_total == 2 * plain.selected_total
    assert sum(waves[12:]) == plain.selected_total  # second sweep
    itags = {
        r["itag"] for r in updated.frontier.select(
            updated.frontier.schedule.itag.alias("itag")
        ).collect()
    }
    assert itags == {"v2"}  # every task recrawled under the new itag


def test_rate_update_unthrottles_next_rounds(spark):
    """Raising rate/burst mid-crawl takes effect next round (reference
    Bucket semantics: no clamp of accumulated tokens, so the faithful
    observable direction is throttled -> unthrottled)."""
    docs = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS).cache()
    docs.count()
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3)
    waves = []
    crawl(
        spark, seeds, docs,
        RoundConfig(projects={"bench": {"rate": 2.0, "burst": 2.0}}, loop_limit=10000),
        robots=None, max_rounds=8,
        project_updates={3: {"bench": {"rate": 1e9, "burst": 1e9}}},
        on_round=lambda o: waves.append(sum(o.selected_counts.values())),
    )
    docs.unpersist()
    assert all(w <= 2 for w in waves[:3])  # throttled prefix
    assert max(waves[3:]) > 2  # unthrottled after the update


def test_group_has_delete_tokenizes_like_reference():
    """ADVICE r04: projectdb.split_group uses re.split("\\W+"), so space-
    and comma-separated groups must both trigger delete; word substrings
    must not."""
    from pyspider_spark.plans.crawl import group_has_delete

    assert group_has_delete("delete")
    assert group_has_delete("foo delete")
    assert group_has_delete("foo, delete")
    assert group_has_delete("foo,delete")
    assert group_has_delete("DELETE")
    assert not group_has_delete("not-deleted")
    assert not group_has_delete("undelete")
    assert not group_has_delete("")
    assert not group_has_delete(None)


def test_delete_projects_filters_postponed_and_pending(spark):
    """ADVICE r04: project delete must also drop POSTPONED force_update
    replays and pending synthetic/reseed candidates for the doomed project
    — otherwise they re-insert orphan frontier rows next round."""
    from pyspider_spark.operators import politeness
    from pyspider_spark.plans.crawl import delete_projects
    from pyspider_spark.plans.round import RoundConfig, RoundState
    from pyspider_spark.types import FRONTIER_SCHEMA

    frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    post = spark.createDataFrame(
        [("beta", "t1"), ("alpha", "t2")], "project string, taskid string"
    )
    pend = spark.createDataFrame(
        [("beta", "t3"), ("alpha", "t4")], "project string, taskid string"
    )
    syn = spark.createDataFrame([("beta", "t5")], "project string, taskid string")
    state = RoundState(
        frontier=frontier, budget=politeness.BudgetState(), postponed=post,
        qsizes={"alpha": 1, "beta": 2},
    )
    cfg = RoundConfig(projects={"alpha": {}, "beta": {"status": "STOP", "group": "x delete"}})
    _, pend2, syn2 = delete_projects(
        state, cfg, ["beta"], pending_extra=pend, pending_syn=syn
    )
    assert {r["project"] for r in state.postponed.collect()} == {"alpha"}
    assert {r["project"] for r in pend2.collect()} == {"alpha"}
    assert syn2.count() == 0
    assert "beta" not in cfg.projects and "beta" not in state.qsizes


def test_project_delete_drops_tasks_and_results(spark):
    """F7 at project granularity (scheduler.py:630-647 _check_delete): a
    STOP'd project in group 'delete' loses its frontier rows, results, and
    accounting at the round boundary; other projects are untouched."""
    from pyspark.sql import functions as F

    docs = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS).cache()
    docs.count()
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3, project="alpha").unionByName(
        synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3, project="beta")
    )
    cfg = RoundConfig(
        projects={"alpha": {"rate": 1e9, "burst": 1e9}, "beta": {"rate": 1e9, "burst": 1e9}},
        loop_limit=10000,
    )
    solo = crawl(
        spark, synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3, project="alpha"),
        docs, RoundConfig(projects={"alpha": {"rate": 1e9, "burst": 1e9}}, loop_limit=10000),
        robots=None, max_rounds=30,
    )
    report = crawl(
        spark, seeds, docs, cfg, robots=None, max_rounds=30,
        project_updates={12: {"beta": {"status": "STOP", "group": "delete"}}},
    )
    docs.unpersist()
    per_project = dict(
        report.frontier.groupBy("project").count().collect()
    )
    assert "beta" not in per_project  # taskdb.drop
    assert per_project["alpha"] == solo.frontier.count()  # alpha untouched
    assert report.results.where(F.col("project") == "beta").count() == 0  # resultdb.drop


def test_project_delete_cuckoo_unlearns_and_recreate_recrawls(spark):
    """Delete + re-create under the cuckoo URL-seen: the deleted project's
    taskids are unlearned (delete_df), so the re-created project's reseed
    re-crawls its whole graph through the definitely-new fast path — and
    the no-false-negative guarantee holds throughout (no frontier row is
    ever double-inserted)."""
    from pyspark.sql import functions as F

    # beta lives in a DISJOINT host universe (doc_id must be unique across
    # the documents table — the simulated fetch is a lookup join)
    docs_a = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS, seed=42)
    docs_b = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS, seed=77, host_prefix="beta")
    docs = docs_a.unionByName(docs_b).cache()
    docs.count()
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3, seed=42, project="alpha").unionByName(
        synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3, seed=77, project="beta", host_prefix="beta")
    )
    cfg = RoundConfig(
        projects={"alpha": {"rate": 1e9, "burst": 1e9}, "beta": {"rate": 1e9, "burst": 1e9}},
        loop_limit=10000,
    )
    report = crawl(
        spark, seeds, docs, cfg, robots=None, max_rounds=45,
        use_bloom=True, bloom_expected=4096, urlseen_filter="cuckoo",
        project_updates={
            12: {"beta": {"status": "STOP", "group": "delete"}},
            13: {"beta": {"status": "RUNNING", "group": "", "rate": 1e9, "burst": 1e9,
                          "reseed": True}},
        },
    )
    docs.unpersist()
    per_project = dict(report.frontier.groupBy("project").count().collect())
    # beta's graph (seed=77 corpus) fully re-crawled after delete+reseed
    assert per_project.get("beta", 0) > 0
    # no duplicate (project, taskid) anywhere — the definitely-new path
    # never double-inserted despite delete+re-add churn in the filter
    dupes = (
        report.frontier.groupBy("project", "taskid").count().where(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_reseed_alone_recrawls(spark):
    """ADVICE r02: a bare {"reseed": True} delta (no itag bump) must
    re-issue seeds WITH force_update — the reference 'run' button sets
    force_update, so already-SUCCESS seed tasks restart."""
    docs = synth_documents(spark, total=TOTAL, show=4, hosts=HOSTS).cache()
    docs.count()
    seeds = synth_seeds(spark, total=TOTAL, hosts=HOSTS, n_seeds=3)

    plain = crawl(spark, seeds, docs, mk_cfg(), robots=None, max_rounds=30)
    waves = []
    updated = crawl(
        spark, seeds, docs, mk_cfg(), robots=None, max_rounds=30,
        project_updates={12: {"bench": {"reseed": True}}},
        on_round=lambda o: waves.append(sum(o.selected_counts.values())),
    )
    docs.unpersist()
    # only the seeds themselves restart (follows of a force_update seed
    # carry no force_update and stay deduped) — but the delta must not be
    # a silent no-op
    assert updated.selected_total > plain.selected_total
    assert sum(waves[12:]) >= 3  # the 3 re-issued seeds were re-fetched
