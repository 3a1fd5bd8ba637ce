"""R1-R5 result operators + M2 windowed counters (resultdb / result_dump /
active-task-view semantics)."""

import json

from pyspark.sql import functions as F

from pyspider_spark.operators.metrics import windowed_counters
from pyspider_spark.operators.results import (
    common_fields,
    dump_results,
    latest_results,
    select_results,
)
from pyspider_spark.types import METRICS_SCHEMA, RESULTS_SCHEMA


def mk_results(spark):
    rows = [
        ("t1", "p", "http://h/1", json.dumps({"a": 1, "b": 2, "c": 3}), 100.0),
        ("t1", "p", "http://h/1", json.dumps({"a": 9, "b": 8, "c": 7}), 200.0),  # upsert
        ("t2", "p", "http://h/2", json.dumps({"a": 4, "b": 5, "d": 6}), 150.0),
        ("t3", "q", "http://h/3", json.dumps({"a": 0}), 120.0),
    ]
    return spark.createDataFrame(rows, RESULTS_SCHEMA)


def test_latest_wins_upsert(spark):
    latest = latest_results(mk_results(spark))
    rows = {r["taskid"]: json.loads(r["result"]) for r in latest.collect()}
    assert rows["t1"] == {"a": 9, "b": 8, "c": 7}  # second write won
    assert len(rows) == 3


def test_select_pagination(spark):
    res = mk_results(spark)
    page1 = select_results(res, "p", limit=1).collect()
    page2 = select_results(res, "p", offset=1, limit=1).collect()
    assert page1[0]["taskid"] == "t1"  # newest updatetime first
    assert page2[0]["taskid"] == "t2"


def test_common_fields_intersection(spark):
    fields = common_fields(latest_results(mk_results(spark)))
    assert fields == ["a"]  # only 'a' is in every result dict


def test_dump_csv_projects_common_fields(spark, tmp_path):
    path = str(tmp_path / "dump")
    dump_results(mk_results(spark).where(F.col("project") == "p"), path, fmt="csv")
    got = spark.read.option("header", True).csv(path)
    assert set(got.columns) >= {"url", "a", "b"}
    vals = {r["url"]: r["a"] for r in got.collect()}
    assert vals["http://h/1"] == "9"


def test_dump_csv_spills_noncommon_fields(spark, tmp_path):
    """R4 '...' column: keys outside the common set survive as JSON."""
    path = str(tmp_path / "dump_spill")
    dump_results(mk_results(spark).where(F.col("project") == "p"), path, fmt="csv")
    got = spark.read.option("header", True).csv(path)
    assert "..." in got.columns
    spill = {r["url"]: json.loads(r["..."]) for r in got.collect()}
    assert spill["http://h/2"] == {"d": 6}  # 'd' is not common to both rows
    assert spill["http://h/1"] == {"c": 7}


def test_dump_txt_format(spark, tmp_path):
    """R4 txt: url<TAB>result-json lines (result_dump.dump_as_txt)."""
    path = str(tmp_path / "dump_txt")
    dump_results(mk_results(spark).where(F.col("project") == "q"), path, fmt="txt")
    lines = [r["value"] for r in spark.read.text(path).collect()]
    assert lines == ['http://h/3\t{"a": 0}']


def test_windowed_counters_buckets(spark):
    rows = [
        (0, 1_700_000_000.0, "p", "selected", 5.0),
        (1, 1_700_000_030.0, "p", "selected", 7.0),
        (2, 1_700_000_400.0, "p", "selected", 11.0),  # next 5-min bucket
    ]
    m = spark.createDataFrame(rows, METRICS_SCHEMA)
    got = windowed_counters(m, "5 minutes").orderBy("start").collect()
    assert [r["value_sum"] for r in got] == [12.0, 11.0]


def test_ann_lsh_recall_vs_bruteforce(spark):
    """LSH ANN must recover >= 0.9 of the brute-force top-k (averaged
    over queries so one lucky draw can't pass)."""
    import numpy as np

    from pyspider_spark.functions.similarity import ann_topk_lsh, cosine_topk

    rng = np.random.RandomState(3)
    vecs = rng.randn(400, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    ).cache()
    recalls = []
    for _ in range(3):
        query = [round(float(x), 5) for x in rng.randn(16)]
        exact = {r["vec_id"] for r in cosine_topk(df, query, k=10).collect()}
        approx = {r["vec_id"] for r in
                  ann_topk_lsh(df, query, k=10, n_planes=10, n_tables=6, max_hamming=3).collect()}
        recalls.append(len(exact & approx) / 10)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.9, f"recall {recalls}"


def test_minhash_finds_planted_near_dups(spark):
    """Planted near-duplicates must surface; unrelated docs must not."""
    from pyspider_spark.operators.dedup import minhash_dedup

    import random

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")  # one-word edit
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(500)]
    rows = [(0, base), (1, near)] + [
        (i, " ".join(rng.choice(vocab) for _ in range(60))) for i in range(2, 12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             minhash_dedup(df, threshold=0.6, n_hashes=32, bands=16, rows=2).collect()}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)
