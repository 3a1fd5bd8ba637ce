"""F13 per-project retry ladders (ADVICE r01): apply_outcomes must resolve
the delay from EACH task's project, not the first project's ladder."""

from pyspark.sql import functions as F

from pyspider_spark.operators.frontier import apply_outcomes
from pyspider_spark.types import ACTIVE, FAILED, TRACK_TYPE

NOW = 1_700_000_000.0

OUTCOME_SCHEMA = (
    "taskid string, project string, url string, host string, "
    "schedule struct<priority:int,retries:int,retried:int,exetime:double,age:bigint,"
    "itag:string,force_update:boolean,auto_recrawl:boolean,cancel:boolean>, "
    "fetch struct<method:string,headers:map<string,string>,data:string,timeout:int,"
    "save:string,robots_txt:boolean,proxy:string,use_gzip:boolean,max_redirects:int>, "
    "process struct<callback:string>, seq bigint, wave_rank int, process_ok boolean"
)


def _outcome(taskid, project, retried, ok=False):
    return (
        taskid, project, f"http://h/{taskid}", "h",
        (0, 3, retried, 0.0, -1, None, False, False, False),
        ("GET", None, None, 120, None, True, None, None, None), ("cb",), 1, 1, ok,
    )


def _apply(spark, rows, ladders):
    df = spark.createDataFrame(rows, OUTCOME_SCHEMA).withColumn(
        "track", F.lit(None).cast(TRACK_TYPE)
    )
    return {
        r["taskid"]: r
        for r in apply_outcomes(
            df, NOW, round_no=1, retry_delays_by_project=ladders
        ).collect()
    }


def test_per_project_ladders_differ(spark):
    ladders = {
        "fast": {0: 5, 1: 10, "": 60},
        "slow": {0: 500, 1: 1000, "": 9999},
    }
    got = _apply(
        spark,
        [
            _outcome("fa", "fast", retried=0),
            _outcome("fb", "fast", retried=1),
            _outcome("sa", "slow", retried=0),
            _outcome("sb", "slow", retried=1),
        ],
        ladders,
    )
    assert got["fa"]["schedule"]["exetime"] == NOW + 5
    assert got["fb"]["schedule"]["exetime"] == NOW + 10
    assert got["sa"]["schedule"]["exetime"] == NOW + 500
    assert got["sb"]["schedule"]["exetime"] == NOW + 1000
    for t in ("fa", "fb", "sa", "sb"):
        assert got[t]["status"] == ACTIVE
        assert got[t]["schedule"]["retried"] == int(t[1] == "b") + 1


def test_project_without_ladder_uses_default(spark):
    got = _apply(
        spark,
        [_outcome("x", "other", retried=0), _outcome("y", "other", retried=3)],
        {"fast": {0: 5, "": 60}},
    )
    assert got["x"]["schedule"]["exetime"] == NOW + 30  # DEFAULT_RETRY_DELAY[0]
    assert got["y"]["status"] == FAILED  # retried >= retries


def test_success_unaffected_by_ladder(spark):
    got = _apply(spark, [_outcome("ok", "fast", retried=1, ok=True)],
                 {"fast": {0: 5, "": 60}})
    assert got["ok"]["schedule"]["exetime"] == 0.0
    assert got["ok"]["schedule"]["retried"] == 1
