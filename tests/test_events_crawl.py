"""F16/F17 end-to-end: cronjob ticks and on_finished fire inside a real
crawl and land as completed synthetic tasks in the frontier."""

from pyspark.sql import functions as F

from pyspider_spark.plans.crawl import crawl
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.synth import synth_documents, synth_seeds


def test_events_fire_in_crawl(spark):
    docs = synth_documents(spark, total=10, show=2, hosts=2).cache()
    seeds = synth_seeds(spark, total=10, hosts=2, n_seeds=3)
    # min_tick derives as gcd(6, 9) = 3 from the @every intervals (F16)
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9, "every": [6, 9]}},
        loop_limit=1000,
        events=True,
    )
    report = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=18)
    fr = report.frontier
    cron = fr.where(F.col("taskid") == "_on_cronjob")
    fin = fr.where(F.col("taskid") == "on_finished")
    assert cron.count() == 0  # cron tasks bypass the frontier entirely
    assert fin.count() == 1
    fin_row = fin.collect()[0]
    assert fin_row["url"] == "data:,on_finished"
    assert fin_row["status"] == 2  # completed (data: fetch always succeeds)
    assert fin_row["schedule"]["priority"] == 9
    # data: URI fetches succeeded and produced result rows; cron ticks at
    # 3,6,9,... each yield a result even without a frontier row
    res_cron = report.results.where(F.col("taskid") == "_on_cronjob")
    assert res_cron.count() >= 2
    res_fin = report.results.where(F.col("taskid") == "on_finished")
    assert res_fin.count() == 1
