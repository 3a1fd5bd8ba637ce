"""F5/F9/F10 unit tests at the DataFrame level: every routing branch
(new, new+force_update, queued merge-on-put, LEASED postpone, restart by
itag/age/force_update, cancel, no-restart drop) — the branches a plain
crawl corpus never exercises (scheduler.py:810-887 semantics)."""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.operators.frontier import (
    empty_frontier,
    merge_candidates,
    route_candidates,
)
from pyspider_spark.types import ACTIVE, BAD, FRONTIER_SCHEMA, LEASED, SUCCESS

NOW = 1_700_000_000.0


def cand_row(taskid, url, priority=0, exetime=0.0, seq=1, age=-1, itag=None,
             force_update=False, auto_recrawl=False, cancel=False, project="p"):
    return (
        project, taskid, url, "h.test",
        (priority, 3, 0, exetime, age, itag, force_update, auto_recrawl, cancel),
        ("GET", None, None, 120, None, True, None, None, None),
        ("index_page",),
        seq,
    )


CAND_SCHEMA = (
    "project string, taskid string, url string, host string, "
    "schedule struct<priority:int,retries:int,retried:int,exetime:double,age:bigint,"
    "itag:string,force_update:boolean,auto_recrawl:boolean,cancel:boolean>, "
    "fetch struct<method:string,headers:map<string,string>,data:string,timeout:int,"
    "save:string,robots_txt:boolean,proxy:string,use_gzip:boolean,max_redirects:int>, "
    "process struct<callback:string>, seq bigint"
)


def frontier_row(taskid, status, priority=0, exetime=0.0, seq=100, itag=None,
                 lastcrawltime=None, lease_until=None):
    return (
        taskid, "p", f"http://h.test/{taskid}", "h.test", status,
        {"priority": priority, "retries": 3, "retried": 0, "exetime": exetime,
         "age": -1, "itag": itag, "force_update": False, "auto_recrawl": False,
         "cancel": False},
        None, None, None, lease_until, seq, 0, lastcrawltime, NOW - 100,
    )


@pytest.fixture()
def frontier(spark):
    rows = [
        frontier_row("queued", ACTIVE, priority=1, seq=10),
        frontier_row("leased", LEASED, lease_until=NOW + 500),
        frontier_row("done_old", SUCCESS, lastcrawltime=NOW - 1000),
        frontier_row("done_recent", SUCCESS, lastcrawltime=NOW - 10),
        frontier_row("done_itag", SUCCESS, itag="v1", lastcrawltime=NOW - 10),
    ]
    return spark.createDataFrame(rows, FRONTIER_SCHEMA)


def route(spark, frontier, cands):
    df = spark.createDataFrame(cands, CAND_SCHEMA)
    return route_candidates(frontier, merge_candidates(df), NOW, round_no=1)


def by_taskid(df):
    return {r["taskid"]: r for r in df.collect()}


def test_new_task_inserted(spark, frontier):
    ups, post = route(spark, frontier, [cand_row("new1", "http://h.test/new1")])
    rows = by_taskid(ups)
    assert rows["new1"]["status"] == ACTIVE
    assert post.count() == 0


def test_new_task_with_force_update_inserted(spark, frontier):
    # regression: NULL old_status & force_update must not be dropped
    ups, post = route(
        spark, frontier, [cand_row("synth", "data:,on_finished", force_update=True, priority=9)]
    )
    rows = by_taskid(ups)
    assert rows["synth"]["status"] == ACTIVE
    assert rows["synth"]["schedule"]["priority"] == 9


def test_queued_without_fu_dropped(spark, frontier):
    ups, _ = route(spark, frontier, [cand_row("queued", "http://h.test/queued", priority=5)])
    assert ups.count() == 0


def test_queued_with_fu_merges_keeps_seq(spark, frontier):
    ups, _ = route(
        spark, frontier,
        [cand_row("queued", "http://h.test/queued", priority=5, force_update=True, seq=999)],
    )
    r = by_taskid(ups)["queued"]
    assert r["status"] == ACTIVE
    assert r["schedule"]["priority"] == 5  # max(1, 5)
    assert r["seq"] == 10  # original queue slot kept


def test_leased_with_fu_postponed(spark, frontier):
    ups, post = route(
        spark, frontier, [cand_row("leased", "http://h.test/leased", force_update=True)]
    )
    assert by_taskid(ups).get("leased") is None
    assert post.count() == 1


def test_leased_without_fu_dropped(spark, frontier):
    ups, post = route(spark, frontier, [cand_row("leased", "http://h.test/leased")])
    assert ups.count() == 0 and post.count() == 0


def test_done_no_restart_dropped(spark, frontier):
    ups, _ = route(spark, frontier, [cand_row("done_recent", "http://h.test/done_recent")])
    assert ups.count() == 0


def test_restart_by_age(spark, frontier):
    ups, _ = route(
        spark, frontier, [cand_row("done_old", "http://h.test/done_old", age=500, seq=77)]
    )
    r = by_taskid(ups)["done_old"]
    assert r["status"] == ACTIVE and r["seq"] == 77  # fresh queue entry


def test_no_restart_when_age_not_expired(spark, frontier):
    ups, _ = route(
        spark, frontier, [cand_row("done_recent", "http://h.test/done_recent", age=500)]
    )
    assert ups.count() == 0


def test_restart_by_itag_change(spark, frontier):
    ups, _ = route(
        spark, frontier, [cand_row("done_itag", "http://h.test/done_itag", itag="v2")]
    )
    assert by_taskid(ups)["done_itag"]["status"] == ACTIVE
    ups2, _ = route(
        spark, frontier, [cand_row("done_itag", "http://h.test/done_itag", itag="v1")]
    )
    assert ups2.count() == 0  # same itag -> no restart


def test_cancel_marks_bad(spark, frontier):
    ups, _ = route(
        spark, frontier,
        [cand_row("done_old", "http://h.test/done_old", force_update=True, cancel=True)],
    )
    assert by_taskid(ups)["done_old"]["status"] == BAD


def test_future_exetime_routed_to_time_queue(spark, frontier):
    ups, _ = route(
        spark, frontier, [cand_row("new2", "http://h.test/new2", exetime=NOW + 60)]
    )
    r = by_taskid(ups)["new2"]
    assert r["schedule"]["exetime"] == NOW + 60
    ups2, _ = route(
        spark, frontier, [cand_row("new3", "http://h.test/new3", exetime=NOW - 60)]
    )
    assert by_taskid(ups2)["new3"]["schedule"]["exetime"] == 0.0  # past -> ready


def test_route_inserts_equals_empty_frontier_route(spark):
    """r06: the definitely-new fast path must emit byte-identical rows to
    route_candidates against an empty frontier — same schema, same
    values, including the exetime routing branch and the _q_delta."""
    from pyspider_spark.operators.frontier import route_inserts

    cands = merge_candidates(spark.createDataFrame(
        [
            cand_row("a", "http://h.test/a", priority=2, seq=7),
            cand_row("b", "http://h.test/b", exetime=NOW + 60, seq=8),
            cand_row("c", "http://h.test/c", force_update=True, seq=9),
        ],
        CAND_SCHEMA,
    ))
    via_route, _ = route_candidates(
        empty_frontier(spark), cands, NOW, round_no=3, with_qdelta=True
    )
    fast = route_inserts(cands, NOW, round_no=3, with_qdelta=True)
    assert fast.schema == via_route.schema
    key = lambda r: r["taskid"]
    assert sorted(fast.collect(), key=key) == sorted(via_route.collect(), key=key)
