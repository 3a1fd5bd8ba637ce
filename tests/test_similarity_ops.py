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


def test_ann_ivf_recall_and_partition_pruning(spark, tmp_path):
    """IVF path: recall >= 0.9 vs brute force across queries, and a
    cell-partitioned index scans only the probed cells (PartitionFilters)."""
    from pyspider_spark.functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        cosine_topk,
        ivf_probe_cells,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(500, 16).astype("float32")
    df = _vec_df(spark, vecs).cache()
    recalls = []
    for _ in range(3):
        query = [round(float(x), 5) for x in rng.randn(16)]
        exact = {r["vec_id"] for r in cosine_topk(df, query, k=10).collect()}
        approx = {r["vec_id"] for r in
                  ann_topk_ivf(df, query, k=10, n_cells=8, nprobe=6).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, f"recall {recalls}"

    # materialized index partition-prunes to the probe cells
    idx_path = str(tmp_path / "ivf")
    build_ivf_index(df, dims=16, n_cells=8).write.partitionBy("cell").parquet(idx_path)
    index = spark.read.parquet(idx_path)
    query = [float(x) for x in rng.randn(16)]
    top = ann_topk_ivf(index, query, k=5, n_cells=8, nprobe=2, index=index)
    plan = top._jdf.queryExecution().executedPlan().toString()
    probes = ivf_probe_cells(query, 8, 42, 2)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]
    got = {r["cell"] for r in index.where(F.col("cell").isin(probes)).select("cell").distinct().collect()}
    assert got <= set(probes)


def test_ivf_trained_centroids_balance_and_recall(spark):
    """VERDICT r04 item 3: on a deliberately SKEWED embedding set (tight
    clusters of very different sizes + noise), k-means-trained centroids
    must (a) keep cells balanced — max cell ≤ c × mean, where the seeded
    random centroids blow through — and (b) retain ANN recall ≥ 0.9."""
    from pyspider_spark.functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        cosine_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(11)
    # 3 tight clusters (700/250/50 members) + a whisper of noise: the
    # regime where data-independent directions leave most cells empty
    centers = rng.randn(3, 16) * 4
    parts = [
        centers[0] + 0.1 * rng.randn(700, 16),
        centers[1] + 0.1 * rng.randn(250, 16),
        centers[2] + 0.1 * rng.randn(50, 16),
    ]
    vecs = np.vstack(parts).astype("float32")
    df = _vec_df(spark, vecs).cache()

    n_cells = 8
    trained = train_ivf_centroids(vecs, n_cells=n_cells, seed=42)
    assert trained.shape == (n_cells, 16)
    # determinism: same sample, same seed → bit-identical centroids
    again = train_ivf_centroids(vecs, n_cells=n_cells, seed=42)
    assert np.array_equal(trained, again)

    counts = {
        r["cell"]: r["n"]
        for r in build_ivf_index(df, dims=16, n_cells=n_cells, centroids=trained)
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    mean = len(vecs) / n_cells
    assert max(counts.values()) <= 3.0 * mean, f"unbalanced cells: {counts}"
    assert len(counts) >= n_cells - 1  # (almost) every cell in use

    recalls = []
    for _ in range(3):
        base = parts[rng.randint(3)]
        query = [round(float(x), 5) for x in base[rng.randint(len(base))]]
        exact = {r["vec_id"] for r in cosine_topk(df, query, k=10).collect()}
        approx = {
            r["vec_id"] for r in ann_topk_ivf(
                df, query, k=10, n_cells=n_cells, nprobe=3, centroids=trained
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, f"recall {recalls}"


def test_ivf_trained_stamp_guards_drift(spark):
    """An index built with one training run must refuse queries planned
    with different centroids (digest in the _ivf_params stamp)."""
    import pytest

    from pyspider_spark.functions.similarity import (
        ann_topk_ivf,
        build_ivf_index,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(3)
    vecs = rng.randn(200, 16).astype("float32")
    df = _vec_df(spark, vecs)
    c1 = train_ivf_centroids(vecs, n_cells=4, seed=42)
    c2 = train_ivf_centroids(vecs[:100], n_cells=4, seed=42)  # other sample
    index = build_ivf_index(df, dims=16, n_cells=4, centroids=c1)
    query = [float(x) for x in rng.randn(16)]
    with pytest.raises(ValueError, match="_?centroid|params"):
        ann_topk_ivf(index, query, k=5, n_cells=4, index=index, centroids=c2)
    with pytest.raises(ValueError, match="params"):
        ann_topk_ivf(index, query, k=5, n_cells=4, index=index)  # seeded ≠ trained
    assert ann_topk_ivf(index, query, k=5, n_cells=4, index=index, centroids=c1).count() == 5


def test_ivf_oracle_parity_trained(spark):
    """The DuckDB oracle with trained-centroid literals must agree with
    the Spark trained-IVF query on the real sf0.001 embeddings corpus
    (the driver gate runs the same comparison at sf0.01)."""
    import duckdb

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    saved = dict(entry._ORACLE_STATE)
    # neutralize guard state other suite tests may have left (they
    # generate literal oracles for sf0.01; this test runs at sf0.001
    # with its OWN freshly-generated literals, so no mismatch exists)
    entry._ORACLE_STATE["generated_for"] = None
    entry._ORACLE_STATE["last_query_sf"] = None
    try:
        spark_rows = entry.q_ann_ivf_topk(spark, sf).collect()
    finally:
        entry._ORACLE_STATE.clear()
        entry._ORACLE_STATE.update(saved)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'"
    )
    from pyspider_spark import oracles

    sql = oracles.ann_ivf_topk_sql(
        entry._QUERY_VEC, k=10, centroids=entry._ivf_trained_centroids(sf)
    )
    oracle_rows = con.execute(sql).fetchall()
    assert [(r["vec_id"], r["cos_sim"]) for r in spark_rows] == [
        (int(a), float(b)) for a, b in oracle_rows
    ]


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


def test_ann_index_param_mismatch_raises(spark, tmp_path):
    """ADVICE r02: querying a prebuilt index with different
    n_planes/n_tables/seed must fail loudly, not silently probe wrong
    buckets at low recall."""
    import pytest

    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 16).astype("float32")
    query = [float(x) for x in rng.randn(16)]
    idx_path = str(tmp_path / "ann_index_params")
    build_ann_index(
        _vec_df(spark, vecs), dims=16, n_planes=10, n_tables=4, seed=7
    ).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    with pytest.raises(ValueError, match="params"):
        ann_topk_lsh(index, query, k=5, n_planes=12, n_tables=4, seed=7, index=index)
    with pytest.raises(ValueError, match="params"):
        ann_topk_lsh(index, query, k=5, n_planes=10, n_tables=4, seed=42, index=index)
    # matching params still work
    assert ann_topk_lsh(
        index, query, k=5, n_planes=10, n_tables=4, seed=7, index=index
    ).count() == 5


def test_ivf_index_param_mismatch_raises(spark, tmp_path):
    import pytest

    from pyspider_spark.functions.similarity import ann_topk_ivf, build_ivf_index

    rng = np.random.RandomState(9)
    vecs = rng.randn(50, 16).astype("float32")
    query = [float(x) for x in rng.randn(16)]
    idx_path = str(tmp_path / "ivf_params")
    build_ivf_index(_vec_df(spark, vecs), dims=16, n_cells=8, seed=7).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)
    with pytest.raises(ValueError, match="params"):
        ann_topk_ivf(index, query, k=5, n_cells=16, seed=7, index=index)
    assert ann_topk_ivf(index, query, k=5, n_cells=8, seed=7, index=index).count() == 5


def test_semdedup_planted_copies_dropped_keep_lowest_id(spark):
    """SemDeDup kept set vs a numpy brute-force mirror of the SAME rule
    (nearest-centroid cells, within-cell lower-id-wins at the threshold):
    exact copies always drop, the original always survives."""
    from pyspider_spark.functions.similarity import semdedup_keep, train_ivf_centroids

    rng = np.random.RandomState(11)
    base = rng.randn(120, 16).astype("float64")
    # plant exact copies of every 10th vector at id+1000
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    rows += [(i + 1000, base[i].tolist()) for i in range(0, 120, 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(base, n_cells=4, seed=7)
    kept = semdedup_keep(
        df, dims=16, threshold=0.99, centroids=cents, n_clusters=4, seed=7
    )
    got = {(r["vec_id"], r["cell"]) for r in kept.collect()}

    # numpy mirror
    ids = np.array([r[0] for r in rows])
    v = np.array([r[1] for r in rows])
    nv = np.linalg.norm(v, axis=1)
    cell = (v / nv[:, None] @ cents.T).argmax(axis=1) + 1
    want = set()
    for j in range(len(ids)):
        dup = False
        for i in range(len(ids)):
            if cell[i] == cell[j] and ids[i] < ids[j]:
                if v[i] @ v[j] / (nv[i] * nv[j]) >= 0.99:
                    dup = True
                    break
        if not dup:
            want.add((int(ids[j]), int(cell[j])))
    assert got == want
    # every planted copy dropped, every original kept
    assert all((i + 1000, int(cell[list(ids).index(i + 1000)])) not in got
               for i in range(0, 120, 10))
    assert {i for i, _ in got} >= set(range(0, 120, 10))


def test_semdedup_hot_cluster_fail_open(spark):
    """A cluster over max_cluster_size generates NO pairs: everything in
    it is kept (fail-open, same semantics as the near-dup bucket guard)."""
    from pyspider_spark.functions.similarity import semdedup_keep

    rng = np.random.RandomState(3)
    d = rng.randn(16)
    # 30 near-identical vectors -> one hot cluster
    rows = [(i, (d + rng.randn(16) * 1e-3).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dropped = 30 - semdedup_keep(
        df, dims=16, threshold=0.9, n_clusters=2, seed=3
    ).count()
    assert dropped > 0  # sanity: normally these dedup
    kept_guarded = semdedup_keep(
        df, dims=16, threshold=0.9, n_clusters=2, seed=3, max_cluster_size=10
    )
    assert kept_guarded.count() == 30


def test_semdedup_pair_join_is_thin_and_cell_keyed(spark):
    """Plan shape: no CartesianProduct, and the pair-stage exchanges move
    thin (cell, id) rows — the embedding arrays re-join only at verify."""
    from pyspider_spark.functions.similarity import semdedup_keep

    rng = np.random.RandomState(9)
    rows = [(i, v.tolist()) for i, v in enumerate(rng.randn(50, 16))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        semdedup_keep(df, dims=16, threshold=0.95, n_clusters=4, seed=9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
