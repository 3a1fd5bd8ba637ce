"""X2 redirects, X4 conditional GET, P5 curl import, P9 messages."""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.functions.urlkit import curl_to_crawl_kwargs
from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_seeds


def mk_cfg(**kw):
    return RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9,
                            "retry_delay": {0: 0, 1: 0, 2: 0, 3: 0, "": 0}}},
        loop_limit=1000, **kw,
    )


def test_redirects_followed_and_budget(spark):
    docs = synth_documents(spark, total=10, show=2, hosts=1).cache()
    # seed hits a redirect chain of 2 hops into page 0, plus an infinite loop
    redirects = spark.createDataFrame(
        [
            ("http://site0.test/r1", "http://site0.test/r2"),
            ("http://site0.test/r2", "http://site0.test/page?n=0"),
            ("http://site0.test/loop", "http://site0.test/loop2"),
            ("http://site0.test/loop2", "http://site0.test/loop"),
        ],
        "from_url string, to_url string",
    )
    seeds = spark.createDataFrame(
        [("bench", "http://site0.test/r1", 0, 0.0),
         ("bench", "http://site0.test/loop", 0, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    report = crawl(spark, seeds, docs, mk_cfg(), robots=None, max_rounds=3,
                   redirects=redirects)
    rows = {r["taskid"]: r for r in report.frontier.collect()}
    import hashlib

    rid = hashlib.md5(b"http://site0.test/r1").hexdigest()
    lid = hashlib.md5(b"http://site0.test/loop").hexdigest()
    assert rows[rid]["track"]["fetch"]["status_code"] == 200  # chain resolved
    assert rows[rid]["track"]["fetch"]["redirect_url"] == "http://site0.test/r2"
    assert rows[lid]["track"]["fetch"]["status_code"] == 599  # budget blown
    assert "redirect" in rows[lid]["track"]["fetch"]["error"]


def test_conditional_get_304_skips_callback(spark):
    docs = synth_documents(spark, total=6, show=2, hosts=1).cache()
    seeds = synth_seeds(spark, total=6, hosts=1, n_seeds=2)
    # age=0 via candidates isn't set by synth seeds; instead crawl twice:
    # second crawl seeded from the first frontier would need age. Simpler:
    # run with conditional_get on; first fetch of each page has no prior
    # track -> NOT 304; pages retried after 404 (none here) unaffected.
    report = crawl(spark, seeds, docs, mk_cfg(conditional_get=True), robots=None,
                   max_rounds=8)
    # all first-time fetches: no 304s, crawl behaves identically
    codes = [r["track"]["fetch"]["status_code"] for r in report.frontier.collect()]
    assert 304 not in codes
    assert codes.count(200) == len(codes)


def test_conditional_get_304_on_recrawl(spark):
    from pyspider_spark.model_sim import md5 as md5s
    from pyspider_spark.operators.frontier import merge_candidates, route_candidates
    from pyspider_spark.plans.round import RoundState, run_round
    from pyspider_spark.plans.crawl import bootstrap

    docs = synth_documents(spark, total=4, show=1, hosts=1).cache()
    cfg = mk_cfg(conditional_get=True)
    seeds = spark.createDataFrame(
        [("bench", "http://site0.test/page?n=0", 0, 0.0)],
        "project string, url string, priority int, exetime double",
    )
    state = bootstrap(spark, seeds, cfg)
    out1 = run_round(state, docs, cfg)  # first fetch: 200
    state = out1.state
    state.frontier = state.frontier.localCheckpoint(eager=True)
    tid = md5s("http://site0.test/page?n=0")
    first = {r["taskid"]: r for r in state.frontier.collect()}[tid]
    assert first["track"]["fetch"]["status_code"] == 200

    # force an age-restart of the same task, then recrawl: 304 expected
    from tests.test_route_candidates import CAND_SCHEMA, cand_row

    cand = spark.createDataFrame(
        [cand_row(tid, "http://site0.test/page?n=0", age=0, seq=1 << 50, project="bench")],
        CAND_SCHEMA,
    )
    ups, _ = route_candidates(state.frontier, merge_candidates(cand),
                              cfg.clock(state.round_no), state.round_no)
    from pyspider_spark.operators.frontier import merge_frontier

    state.frontier = merge_frontier(state.frontier, ups).localCheckpoint(eager=True)
    out2 = run_round(state, docs, cfg)
    out2.state.frontier = out2.state.frontier.localCheckpoint(eager=True)
    again = {r["taskid"]: r for r in out2.state.frontier.collect()}[tid]
    assert again["track"]["fetch"]["status_code"] == 304
    assert again["status"] == 2  # still finishes SUCCESS
    assert again["track"]["process"]["follows"] == 0  # callback skipped
    # no result row emitted for the 304
    assert out2.results.where(F.col("taskid") == tid).count() == 0


def test_curl_import():
    kw = curl_to_crawl_kwargs(
        "curl 'http://a.test/x' -X POST -H 'Accept: text/html' "
        "-H 'X-K: v' --data 'a=1&b=2' --compressed"
    )
    assert kw["urls"] == ["http://a.test/x"]
    assert kw["method"] == "POST"
    assert kw["headers"] == {"Accept": "text/html", "X-K": "v"}
    assert kw["data"] == "a=1&b=2"
    assert kw["use_gzip"] is True
    with pytest.raises(ValueError):
        curl_to_crawl_kwargs("curl -X POST")


def test_send_message(spark):
    from pyspider_spark.operators.frontier import send_message
    from pyspider_spark.plans.crawl import bootstrap
    from pyspider_spark.plans.round import run_round

    docs = synth_documents(spark, total=4, show=1, hosts=1).cache()
    cfg = mk_cfg()
    seeds = synth_seeds(spark, total=4, hosts=1, n_seeds=1)
    state = bootstrap(spark, seeds, cfg)
    msg = send_message(spark, "bench", "bench", '{"hello": 1}', state.round_no,
                       cfg.clock(state.round_no))
    out = run_round(state, docs, cfg, synthetic_wave=msg)
    rows = out.processed.where(F.col("taskid") == "_on_message").collect()
    assert len(rows) == 1
    assert rows[0]["fetch"]["save"] == '{"hello": 1}'
    assert rows[0]["process_ok"]
    # message task produced a result but no frontier row
    out.state.frontier = out.state.frontier.localCheckpoint(eager=True)
    assert out.state.frontier.where(F.col("taskid") == "_on_message").count() == 0


def test_per_task_redirect_budget_simulated(spark):
    """X2 parity: simulated resolve_redirects honors fetch.max_redirects
    per task (clamped to the plan-wide budget), like the real kernel."""
    from pyspider_spark.operators.fetch import resolve_redirects

    redirects = spark.createDataFrame(
        [("u://r0", "u://r1"), ("u://r1", "u://r2"), ("u://r2", "u://r3")],
        "from_url string, to_url string",
    )
    wave = spark.createDataFrame(
        [("b1", 1), ("b2", 2), ("b3", 3), ("bdef", None)],
        "taskid string, _mr int",
    ).withColumn("url", F.lit("u://r0")).withColumn(
        "fetch",
        F.struct(
            F.lit(None).cast("string").alias("method"),
            F.lit(None).cast("map<string,string>").alias("headers"),
            F.lit(None).cast("string").alias("data"),
            F.lit(None).cast("int").alias("timeout"),
            F.lit(None).cast("string").alias("save"),
            F.lit(None).cast("boolean").alias("robots_txt"),
            F.lit(None).cast("string").alias("proxy"),
            F.lit(None).cast("boolean").alias("use_gzip"),
            F.col("_mr").alias("max_redirects"),
        ),
    ).drop("_mr")
    rows = {
        r["taskid"]: r
        for r in resolve_redirects(wave, redirects, max_redirects=5).collect()
    }
    assert (rows["b1"]["resolved_url"], rows["b1"]["redirect_exhausted"]) == ("u://r1", True)
    assert (rows["b2"]["resolved_url"], rows["b2"]["redirect_exhausted"]) == ("u://r2", True)
    assert (rows["b3"]["resolved_url"], rows["b3"]["redirect_exhausted"]) == ("u://r3", False)
    assert (rows["bdef"]["resolved_url"], rows["bdef"]["redirect_exhausted"]) == ("u://r3", False)
    # the first hop is still recorded for the track even when truncated
    assert rows["b1"]["redirect_url"] == "u://r1"
