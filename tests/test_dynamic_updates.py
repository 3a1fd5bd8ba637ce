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
