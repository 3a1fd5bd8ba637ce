"""F20 crawl_config: project-level fetch defaults merged into every
selected task at select time, task values winning — wired into run_round
(VERDICT r01 item 4; base_handler.py:227-253 + scheduler.py:1002-1004
semantics)."""

from pyspark.sql import functions as F

from pyspider_spark.operators.projects import join_crawl_config
from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_seeds

WAVE_SCHEMA = (
    "project string, taskid string, "
    "fetch struct<method:string,headers:map<string,string>,data:string,timeout:int,"
    "save:string,robots_txt:boolean>"
)


def _wave(spark, rows):
    return spark.createDataFrame(rows, WAVE_SCHEMA)


CC = {
    "p": {
        "crawl_config": {
            "headers": {"User-Agent": "proj-ua", "X-Shared": "from-config"},
            "timeout": 99,
            "method": "POST",
        }
    },
    "q": {},  # no crawl_config: untouched
}


def test_config_fills_unset_fields(spark):
    wave = _wave(spark, [("p", "t1", (None, None, None, None, None, True))])
    got = join_crawl_config(wave, CC).collect()[0]["fetch"]
    assert got["method"] == "POST"
    assert got["timeout"] == 99
    assert got["headers"] == {"User-Agent": "proj-ua", "X-Shared": "from-config"}
    assert got["robots_txt"] is True  # task value untouched


def test_task_values_win(spark):
    wave = _wave(spark, [
        ("p", "t1", ("GET", {"X-Shared": "from-task", "X-Task": "1"}, None, 5, None, True)),
    ])
    got = join_crawl_config(wave, CC).collect()[0]["fetch"]
    assert got["method"] == "GET"  # task scalar beats config
    assert got["timeout"] == 5
    # deep merge: task key wins, config-only key survives
    assert got["headers"] == {
        "User-Agent": "proj-ua", "X-Shared": "from-task", "X-Task": "1",
    }


def test_user_agent_becomes_header_base(spark):
    """X6: config user_agent fills User-Agent unless a header wins."""
    cc = {"p": {"crawl_config": {"user_agent": "cfg-ua"}}}
    wave = _wave(spark, [
        ("p", "bare", (None, None, None, None, None, True)),
        ("p", "hdr", (None, {"User-Agent": "task-ua"}, None, None, None, True)),
    ])
    got = {r["taskid"]: r["fetch"]["headers"] for r in join_crawl_config(wave, cc).collect()}
    assert got["bare"] == {"User-Agent": "cfg-ua"}
    assert got["hdr"] == {"User-Agent": "task-ua"}


def test_project_without_config_untouched(spark):
    wave = _wave(spark, [("q", "t2", (None, {"A": "1"}, None, None, None, False))])
    got = join_crawl_config(wave, CC).collect()[0]["fetch"]
    assert got["method"] is None
    assert got["headers"] == {"A": "1"}


def test_noop_when_no_project_has_config(spark):
    wave = _wave(spark, [("q", "t2", (None, None, None, None, None, False))])
    assert join_crawl_config(wave, {"q": {}}) is wave


def test_crawl_config_reaches_processed_wave(spark):
    """Integration: run_round applies the merge — every real (non-seed-
    specified) task in the processed wave carries the project timeout and
    header."""
    docs = synth_documents(spark, total=30, show=4, hosts=2).cache()
    seeds = synth_seeds(spark, total=30, hosts=2, n_seeds=2)
    cfg = RoundConfig(
        projects={"bench": {
            "rate": 1e9, "burst": 1e9,
            "crawl_config": {"headers": {"User-Agent": "bench-ua"}, "timeout": 77},
        }},
        loop_limit=1000,
    )
    seen = []
    report = crawl(
        spark, seeds, docs, cfg, robots=None, max_rounds=3,
        on_round=lambda out: seen.extend(
            out.processed.select("fetch").collect()
        ),
    )
    docs.unpersist()
    assert report.selected_total > 0 and seen
    for r in seen:
        assert r["fetch"]["timeout"] == 77
        assert r["fetch"]["headers"]["User-Agent"] == "bench-ua"


def test_map_override_null_valued_key_wins(spark):
    """ADVICE r02 (medium): an override key mapped to NULL must still
    replace the base entry (dict.update semantics) — and must not crash
    with DUPLICATED_MAP_KEY, which the element_at-based filter did
    because element_at returns NULL for null values as well as missing
    keys."""
    from pyspider_spark.functions.maps import map_override

    df = spark.createDataFrame(
        [({"a": "base", "b": "keep"}, {"a": None, "c": "new"})],
        "base map<string,string>, override map<string,string>",
    )
    got = df.select(
        map_override(F.col("base"), F.col("override")).alias("m")
    ).collect()[0]["m"]
    assert got == {"a": None, "b": "keep", "c": "new"}


def test_crawl_config_fills_max_redirects(spark):
    """X2 via F20: a project-level crawl_config max_redirects fills tasks
    that did not set one; an explicit task value wins."""
    from pyspider_spark.operators.projects import join_crawl_config

    wave = spark.createDataFrame(
        [("t1", "p", None), ("t2", "p", 9)],
        "taskid string, project string, _mr int",
    ).withColumn(
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
    out = join_crawl_config(wave, {"p": {"crawl_config": {"max_redirects": 3}}})
    got = {r["taskid"]: r["fetch"]["max_redirects"] for r in out.collect()}
    assert got == {"t1": 3, "t2": 9}
