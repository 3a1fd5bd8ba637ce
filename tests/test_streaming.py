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


def test_streaming_ingest_dedup(spark, tmp_path):
    """Streaming ingest dedup: batch 2 docs pair against batch 1's
    archived docs AND within batch 2; novel docs join the archive so a
    batch-3 recopy of a batch-1 doc is still caught; duplicate docs are
    NOT archived (the batch-3 copy of a batch-2 dup pairs with the
    ORIGINAL, not the dup)."""
    from pyspider_spark.streaming.ingest import StreamingDedup

    base = ("a perfectly ordinary web page about garden tools and the "
            "proper storage of rakes shovels and twine through winter ")
    other = ("entirely different prose concerning railway timetables "
             "and the scheduling of overnight freight through the alps ")
    third = ("a third unrelated document describing tidepool ecology "
             "and the feeding habits of anemones urchins and crabs ")
    src = tmp_path / "incoming"
    src.mkdir()
    schema = "doc_id long, text string"

    # the file source wants flat files in the watched dir — write each
    # batch as one parquet FILE (maxFilesPerTrigger=1 -> one batch each)
    import glob
    import shutil

    def add_file(name, rows):
        tmp = tmp_path / ("stage_" + name)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        part = glob.glob(str(tmp / "part-*.parquet"))[0]
        shutil.copy(part, str(src / (name + ".parquet")))

    add_file("b1", [(1, base * 3), (2, other * 3)])
    add_file("b2", [(10, base * 3 + "tiny tail"), (11, third * 3),
                    (12, third * 3 + "small suffix")])
    add_file("b3", [(20, base * 3), (21, third * 3 + "small suffix ok")])

    sd = StreamingDedup(spark, threshold=0.6)
    q = sd.start(str(src), schema)
    q.awaitTermination(240)
    assert sd.batches_run == 3

    got = {(r["doc_new"], r["doc_old"]) for r in sd.pairs_df.collect()}
    assert (10, 1) in got          # batch-2 vs batch-1 archive
    assert (11, 12) in got or (12, 11) in got  # intra-batch pair
    assert (20, 1) in got          # batch-3 recopy of an archived batch-1 doc
    # doc 12 (a dup) was NOT archived: 21 pairs with the archived 11
    assert (21, 11) in got
    assert (21, 12) not in got
    # no self-pairs, no pairs among unrelated docs
    assert all(a != b for a, b in got)
    assert not any({a, b} == {1, 2} for a, b in got)
