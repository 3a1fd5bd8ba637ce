"""X5 robots gate semantics on rule tables WITHOUT a '/' catch-all.

ADVICE r03 (high): under Spark 4 default ANSI mode, element_at(arr, 1) on
an empty filtered rule array threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT for
any host whose rules match none of the URL's path (e.g. only
'Disallow: /admin'). synth_robots always emits a '/' rule, so the crawl
suite never hit it — this test uses partial-coverage rule tables.
"""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.operators.fetch import robots_gate


def _wave(spark, rows):
    # (url, host, robots_txt opt-in)
    return spark.createDataFrame(
        [(u, h, o) for u, h, o in rows],
        "url string, host string, _opt boolean",
    ).withColumn("fetch", F.struct(F.col("_opt").alias("robots_txt"))).drop("_opt")


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "host string, path_prefix string, allow boolean, crawl_delay double"
    )


def test_no_matching_prefix_is_allowed(spark):
    """A host with rules but no prefix covering this path must NOT crash
    and must default to allowed (RobotFileParser: unmatched path ⇒ allow)."""
    wave = _wave(spark, [
        ("http://a.test/page/1", "a.test", True),     # no rule matches /page
        ("http://a.test/admin/x", "a.test", True),    # matched: deny
        ("http://b.test/anything", "b.test", True),   # host without rules
    ])
    rules = _rules(spark, [("a.test", "/admin", False, 0.0)])
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(wave, rules).select("url", "robots_allowed").collect()
    }
    assert got["http://a.test/page/1"] is True
    assert got["http://a.test/admin/x"] is False
    assert got["http://b.test/anything"] is True


def test_longest_prefix_wins_without_catchall(spark):
    wave = _wave(spark, [
        ("http://a.test/admin/public/ok", "a.test", True),
        ("http://a.test/admin/secret", "a.test", True),
        ("http://a.test/", "a.test", True),
    ])
    rules = _rules(spark, [
        ("a.test", "/admin", False, 0.0),
        ("a.test", "/admin/public", True, 0.0),
    ])
    got = {
        r["url"]: r["robots_allowed"]
        for r in robots_gate(wave, rules).select("url", "robots_allowed").collect()
    }
    assert got["http://a.test/admin/public/ok"] is True
    assert got["http://a.test/admin/secret"] is False
    assert got["http://a.test/"] is True


def test_opt_out_tasks_skip_the_gate(spark):
    wave = _wave(spark, [("http://a.test/admin/x", "a.test", False)])
    rules = _rules(spark, [("a.test", "/admin", False, 0.0)])
    [row] = robots_gate(wave, rules).select("robots_allowed").collect()
    assert row["robots_allowed"] is True
