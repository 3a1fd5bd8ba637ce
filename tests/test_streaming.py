"""Continuous mode: the streaming ticker advances real scheduling rounds
and converges the same crawl; streaming windowed counters run with a
watermark."""

import time

from pyspider_spark.plans.crawl import bootstrap
from pyspider_spark.plans.round import RoundConfig
from pyspider_spark.streaming.continuous import StreamingCrawl, streaming_metrics_counters
from pyspider_spark.synth import synth_documents, synth_seeds
from pyspider_spark.types import METRICS_SCHEMA, SUCCESS


def test_streaming_crawl_converges(spark):
    docs = synth_documents(spark, total=20, show=3, hosts=2).cache()
    seeds = synth_seeds(spark, total=20, hosts=2, n_seeds=4)
    cfg = RoundConfig(projects={"bench": {"rate": 1e9, "burst": 1e9}}, loop_limit=1000)
    sc = StreamingCrawl(spark, docs, cfg)
    state = bootstrap(spark, seeds, cfg)
    q = sc.start(state, ticks_per_second=5)
    try:
        # NOTE: processAllAvailable() never returns on a rate source (new
        # ticks keep arriving) — poll the round counter instead
        deadline = time.time() + 240
        while time.time() < deadline and sc.rounds_run < 6:
            time.sleep(1.0)
    finally:
        q.stop()
    assert sc.rounds_run >= 4
    statuses = {
        r["status"]: r["count"] for r in sc.state.frontier.groupBy("status").count().collect()
    }
    assert statuses.get(SUCCESS, 0) >= 15  # crawl actually progressed


def test_streaming_windowed_counters(spark, tmp_path):
    # write a small metrics log, stream it back through the windowed agg
    rows = [(0, 1_700_000_000.0 + i, "bench", "selected", float(i)) for i in range(10)]
    spark.createDataFrame(rows, METRICS_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "metrics")
    )
    stream = spark.readStream.schema(METRICS_SCHEMA).parquet(str(tmp_path / "metrics"))
    agg = streaming_metrics_counters(spark, stream, duration="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("counters")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from counters").collect()
    finally:
        q.stop()
    assert len(got) == 1
    assert got[0]["value_sum"] == sum(range(10))
