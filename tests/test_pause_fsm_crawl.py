"""F18 end-to-end: a project whose recent tasks all fail gets its select
quota gated to zero (scheduler.py:51-102,489-492 semantics)."""

from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents


def test_all_failures_pause_project(spark):
    # corpus exists but seeds point at missing pages -> every fetch 404s
    docs = synth_documents(spark, total=5, show=2, hosts=2).cache()
    seeds = spark.createDataFrame(
        [("bench", f"http://site0.test/missing?n={i}", 0, 0.0) for i in range(12)],
        "project string, url string, priority int, exetime double",
    )
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9,
                            "retry_delay": {0: 0, 1: 0, 2: 0, 3: 0, "": 0}}},
        loop_limit=1000,
        pause_fsm=True,
    )
    waves = []
    crawl(spark, seeds, docs, cfg, robots=None, max_rounds=4,
          on_round=lambda o: waves.append(sum(o.selected_counts.values())))
    # round 0 selects all 12, all fail (>= FAIL_PAUSE_NUM=10) -> paused:
    # despite zero-delay retries being ready, nothing selects afterwards
    assert waves[0] == 12
    assert all(w == 0 for w in waves[1:])
