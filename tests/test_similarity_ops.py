"""ANN index materialization + embedding near-dup recall/guard posture
(VERDICT r01 items 3/7): the signature index must be computed once and
probed with pushdown-able filters, and the near-dup banding must actually
catch near-dups (the round-1 full-signature bucket had ~4% recall).
"""

import numpy as np
from pyspark.sql import functions as F

from pyspider_spark.functions.similarity import (
    ann_topk_lsh,
    build_ann_index,
    embedding_near_dup_pairs,
)


def _vec_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_ann_index_probe_is_pushed_down(spark, tmp_path):
    """Materialized index + probe: the sig IN (...) filters must reach the
    parquet scan (PushedFilters), so a signature-partitioned index prunes
    instead of re-scoring every row."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(200, 16).astype("float32")
    query = [float(x) for x in rng.randn(16)]
    idx_path = str(tmp_path / "ann_index")
    build_ann_index(_vec_df(spark, vecs), dims=16, n_planes=10, n_tables=4).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    top = ann_topk_lsh(
        index, query, k=5, n_planes=10, n_tables=4, max_hamming=1, index=index
    )
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "sig_0" in plan.split("PushedFilters")[1][:400]
    assert top.count() >= 0  # runs

    # the index path must give the same answer as the inline path
    inline = ann_topk_lsh(
        _vec_df(spark, vecs), query, k=5, n_planes=10, n_tables=4, max_hamming=1
    )
    assert [r["vec_id"] for r in top.collect()] == [r["vec_id"] for r in inline.collect()]


def test_embedding_near_dup_planted_recall(spark):
    """Plant near-dups at cosine ~0.95; banded buckets must find >= 0.9 of
    them (full-signature bucketing found ~none)."""
    rng = np.random.RandomState(11)
    base = rng.randn(150, 32)
    # planted copy: small additive noise -> cosine ~0.95
    noisy = base + 0.33 * rng.randn(150, 32)
    cos = (base * noisy).sum(1) / (
        np.linalg.norm(base, axis=1) * np.linalg.norm(noisy, axis=1)
    )
    planted = {(i, 150 + i) for i in range(150) if cos[i] >= 0.9}
    rows = [(i, v.tolist()) for i, v in enumerate(base.astype("float32"))] + [
        (150 + i, v.tolist()) for i, v in enumerate(noisy.astype("float32"))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in embedding_near_dup_pairs(df, dims=32, threshold=0.9).collect()
    }
    found = len(planted & pairs)
    assert found / max(len(planted), 1) >= 0.9, f"recall {found}/{len(planted)}"
    # verify stage is exact: nothing below the threshold sneaks in
    for r in embedding_near_dup_pairs(df, dims=32, threshold=0.9).collect():
        assert r["cos_sim"] >= 0.9


def test_embedding_near_dup_hot_bucket_guard(spark):
    """Identical vectors flood every band bucket; the guard must bound the
    join instead of going O(n^2), while distinct planted pairs survive."""
    rng = np.random.RandomState(13)
    hot = np.tile(rng.randn(1, 16), (80, 1))
    a = rng.randn(16)
    rows = (
        [(i, v.tolist()) for i, v in enumerate(hot.astype("float32"))]
        + [(100, [float(x) for x in a]), (101, [float(x) for x in a * 2.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in embedding_near_dup_pairs(
            df, dims=16, threshold=0.99, max_bucket_size=50
        ).collect()
    }
    assert (100, 101) in pairs  # scaled copy (cosine 1.0) survives
    assert all(p == (100, 101) for p in pairs)  # hot bucket contributed nothing


def test_near_dup_uses_no_window(spark):
    df = _vec_df(spark, np.random.RandomState(1).randn(5, 8).astype("float32"))
    plan = embedding_near_dup_pairs(df, dims=8)._jdf.queryExecution().toString()
    assert "Window" not in plan
