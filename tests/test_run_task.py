"""Single-task debug helper ('one mode', SURVEY §3.3): run ONE url through
the standard round DAG and inspect track/follows/result — mirrors the
reference's tests/test_run.py one-mode assertions (fetch ok, callback ran,
follows surfaced, result emitted)."""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.plans.debug import run_task
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_robots, synth_seeds
from pyspider_spark.types import SUCCESS


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synth_documents(spark, total=60, show=4, hosts=2).cache()
    docs.count()
    yield docs
    docs.unpersist()


def mk_cfg():
    return RoundConfig(projects={"debugproj": {"rate": 1e9, "burst": 1e9}})


def test_run_task_success_with_follows_and_result(spark, corpus):
    url = synth_seeds(spark, total=60, hosts=2, n_seeds=1, project="debugproj").first()["url"]
    rep = run_task(spark, url, mk_cfg(), documents=corpus)
    assert rep.ok and rep.status == SUCCESS
    assert rep.task is not None and rep.task["url"] == url
    # the status pack both debugger panes read
    assert rep.track["fetch"]["ok"] is True
    assert rep.track["process"]["ok"] is True
    assert rep.track["process"]["follows"] == len(rep.follows) > 0
    # on_result payload emitted and carries the page
    assert rep.result is not None and rep.result["taskid"] == rep.task["taskid"]
    # the follows were ROUTED (frontier rows exist beyond the seed task)
    assert rep.frontier.count() == 1 + len(rep.follows)


def test_run_task_robots_blocked(spark, corpus):
    """A disallowed private page must come back blocked, no follows."""
    robots = synth_robots(spark, hosts=2)
    blocked = corpus.select(
        F.col("doc_id").alias("url")
    ).where(F.col("url").contains("/private")).first()["url"]
    rep = run_task(spark, blocked, mk_cfg(), documents=corpus, robots=robots)
    assert not rep.ok  # 403 → retry ladder, not SUCCESS
    assert rep.track["fetch"]["ok"] is False
    assert rep.follows == []


def test_run_task_requires_corpus_unless_real(spark):
    with pytest.raises(ValueError, match="documents"):
        run_task(spark, "http://site0.test/x", mk_cfg())
