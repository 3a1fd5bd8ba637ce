"""Physical-plan audits: the plans must be the ones we'd want at 100 TB —
filters/projections reach the parquet scan, small dims broadcast, top-k
compiles to TakeOrdered, whole-stage codegen covers the expression work."""

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_and_projection_pushed_to_scan(spark):
    df = entrymod.queries()["filter_pushdown"](spark, SF)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters: \[.*EqualTo\(event_type,click\)", plan)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(value,50", plan)
    # column pruning: scan reads only the needed columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"event_id", "user_id", "event_type", "value"}


def test_config_join_broadcasts(spark):
    df = entrymod.queries()["f20_config_join"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_active_topk_is_take_ordered(spark):
    df = entrymod.queries()["r5_active_topk"](spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_antijoin_stays_join_no_cartesian(spark):
    df = entrymod.queries()["f9_urlseen_antijoin"](spark, SF)
    plan = plan_of(df)
    assert "LeftAnti" in plan
    assert "Cartesian" not in plan


def test_status_counts_partial_agg(spark):
    df = entrymod.queries()["f23_status_counts"](spark, SF)
    plan = plan_of(df)
    # map-side combine: a partial HashAggregate before the exchange
    # (AQE shows isFinalPlan=false pre-execution, so codegen spans aren't
    # in the formatted string — the agg shape is the meaningful assert)
    assert plan.count("HashAggregate") >= 2
    assert plan.index("HashAggregate") < plan.index("Exchange") or "Exchange" in plan


def test_select_wave_no_frontier_wide_sort(spark):
    """The wave select must rank inside window partitions — never a global
    Sort of the whole frontier."""
    from pyspider_spark.operators.frontier import select_wave
    from pyspider_spark.types import FRONTIER_SCHEMA

    frontier = spark.createDataFrame([], FRONTIER_SCHEMA)
    wave = select_wave(frontier, {"bench": 10}, now=0.0, round_no=0)
    plan = plan_of(wave)
    # window sorts are 'Sort [ ... ], false, 0' (local, per partition);
    # a global sort would be 'Sort [...], true, 0'
    assert not re.search(r"Sort \[[^\]]*\], true", plan), plan


def test_select_wave_salted_equals_unsalted(spark):
    """Hot-host salting (north rule) must be a pure execution-shape change:
    the S-way two-phase per-host rank returns the bit-identical wave —
    same taskids, same wave_ranks — with and without a per-host cap.
    Hosts here are skewed (synth host 0 takes ~50% of pages)."""
    from pyspider_spark.operators.frontier import select_wave
    from pyspider_spark.plans.crawl import bootstrap
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import synth_seeds

    seeds = synth_seeds(spark, total=5000, hosts=2, n_seeds=300)
    state = bootstrap(spark, seeds, RoundConfig(projects={"bench": {}}))
    frontier = state.frontier.persist()

    def key(df):
        return sorted(
            (r["taskid"], r["wave_rank"])
            for r in df.select("taskid", "wave_rank").collect()
        )

    for cap in (None, {"bench": 7}):
        base = select_wave(frontier, {"bench": 50}, now=0.0, round_no=0,
                           max_per_host=cap, salt_buckets=1)
        salted = select_wave(frontier, {"bench": 50}, now=0.0, round_no=0,
                             max_per_host=cap, salt_buckets=16)
        assert key(base) == key(salted)
    frontier.unpersist()


def test_crawl_round_driver_action_budget(spark, monkeypatch):
    """Per-round driver-barrier budget (VERDICT r01 item 5): in memory mode
    without results collection a round may trigger at most ONE collect (the
    folded stats job) and ONE localCheckpoint (lineage truncation). A
    regression that re-adds per-metric collects/counts fails this.
    (Raw scheduler-job counts are NOT the metric: AQE + broadcast
    exchanges legitimately spawn many internal jobs per action.)"""
    # patch the CLASSIC implementation class — pyspark.sql.DataFrame is
    # the facade in Spark 4; instances dispatch to classic.dataframe
    from pyspark.sql.classic.dataframe import DataFrame

    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import synth_documents, synth_seeds

    docs = synth_documents(spark, total=40, show=4, hosts=2).cache()
    docs.count()
    seeds = synth_seeds(spark, total=40, hosts=2, n_seeds=3)
    cfg = RoundConfig(projects={"bench": {"rate": 1e9, "burst": 1e9}}, loop_limit=10000)

    calls = {"collect": 0, "count": 0, "localCheckpoint": 0, "toPandas": 0}
    for name in list(calls):
        orig = getattr(DataFrame, name)

        def wrapper(self, *a, _n=name, _o=orig, **kw):
            calls[_n] += 1
            return _o(self, *a, **kw)

        monkeypatch.setattr(DataFrame, name, wrapper)

    report = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=20,
                   collect_results=False)
    docs.unpersist()
    r = report.rounds
    # stats collect once per round (+1 bootstrap queue_sizes fallback);
    # the lower bound keeps this non-vacuous (a broken patch records 0)
    assert r <= calls["collect"] <= r + 1, calls
    assert calls["localCheckpoint"] <= r, calls
    assert calls["count"] == 0 and calls["toPandas"] == 0, calls


def test_crawl_round_driver_action_budget_pause_fsm(spark, monkeypatch):
    """VERDICT r02 item 6: pause_fsm=True must fit the SAME 1-collect
    budget — the F18 outcome feed rides the round's single stats job
    (distributed last-100 aggregate), not an O(wave) collect."""
    from pyspark.sql.classic.dataframe import DataFrame

    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import synth_documents, synth_seeds

    docs = synth_documents(spark, total=40, show=4, hosts=2).cache()
    docs.count()
    seeds = synth_seeds(spark, total=40, hosts=2, n_seeds=3)
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9}}, loop_limit=10000,
        pause_fsm=True,
    )

    calls = {"collect": 0, "count": 0, "localCheckpoint": 0, "toPandas": 0}
    for name in list(calls):
        orig = getattr(DataFrame, name)

        def wrapper(self, *a, _n=name, _o=orig, **kw):
            calls[_n] += 1
            return _o(self, *a, **kw)

        monkeypatch.setattr(DataFrame, name, wrapper)

    report = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=20,
                   collect_results=False)
    docs.unpersist()
    r = report.rounds
    assert r <= calls["collect"] <= r + 1, calls
    assert calls["localCheckpoint"] <= r, calls
    assert calls["count"] == 0 and calls["toPandas"] == 0, calls
    assert report.selected_total > 0


def test_robots_gate_no_wave_shuffle(spark):
    """VERDICT r02 item 7: the robots gate must not introduce a shuffle or
    re-aggregation of the wave — rules broadcast as per-host arrays, the
    longest-prefix pick is a pure row expression."""
    from pyspider_spark.operators.fetch import robots_gate
    from pyspider_spark.synth import synth_robots
    from pyspider_spark.types import FRONTIER_SCHEMA

    wave = spark.createDataFrame([], FRONTIER_SCHEMA).withColumn(
        "wave_rank", F.lit(1)
    )
    gated = robots_gate(wave, synth_robots(spark, hosts=4))
    plan = plan_of(gated)
    # only the rules side may exchange (its own tiny agg + broadcast);
    # the wave side must see no hash-partition exchange and no aggregate
    # over the wave's own columns
    wave_plan_ops = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in wave_plan_ops, plan
    assert "BroadcastHashJoin" in plan


def test_fsm_feed_is_rank_bounded(spark):
    """VERDICT r03 item 1: the F18 outcome feed must rank-filter to the
    newest 100 per project BEFORE collect_list — the aggregation buffer is
    ≤100 structs by construction, never the whole per-project wave."""
    from pyspider_spark.plans.round import fsm_outcome_feed

    n = 250
    processed = spark.createDataFrame(
        [("p", i, i % 3 != 0) for i in range(1, n + 1)]
        + [("q", i, True) for i in range(1, 6)],
        "project string, wave_rank int, process_ok boolean",
    )
    feed = fsm_outcome_feed(processed)

    # plan shape: the _rn <= 100 Filter sits BELOW the collect_list
    # Aggregate (tree prints parents first, so Aggregate appears earlier)
    plan = feed._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan and "collect_list" in plan, plan
    filt = re.search(r"Filter.*_rn.* <= 100", plan)
    agg = re.search(r"Aggregate.*collect_list", plan)
    assert filt and agg, plan
    assert agg.start() < filt.start(), "collect_list must consume the rank-bounded rows"

    rows = {r["project"]: r for r in feed.collect()}
    assert rows["p"]["n"] == n
    assert len(rows["p"]["outcomes"]) == 100  # bounded, not O(wave)
    # newest first: wave_rank n down to n-99
    expect = [(i % 3 != 0) for i in range(n, n - 100, -1)]
    assert list(rows["p"]["outcomes"]) == expect
    assert rows["q"]["n"] == 5 and len(rows["q"]["outcomes"]) == 5
