"""Near-dup clustering: connected components (large-star/small-star) and
canonical-member assignment. Reference has no counterpart (it stops at
pairwise similarity); this is the keep-one-per-cluster step a training-data
dedup pipeline needs (OPERATORS.md round-5 extras)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pyspider_spark.operators.dedup import (
    _cc_with_iters,
    connected_components,
    dedup_assign,
    minhash_dedup,
)


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc_a long, doc_b long"
    )


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    comp: dict[int, int] = {}
    for n in list(parent):
        root = find(n)
        comp.setdefault(root, root)
        comp[n] = min(comp.get(n, n), root)
    # second pass: root's label is min over members
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    out = {}
    for root, ms in members.items():
        lbl = min(ms)
        for m in ms:
            out[m] = lbl
    return out


def test_cc_chain_and_island(spark):
    # chain 1-2-3 (transitive closure) + island 7-8 + reversed-order edge
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8), (9, 4)])
    got = {
        (r["doc"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (4, 4), (9, 4)}


def test_cc_log_round_convergence_on_path(spark):
    # a 64-node path is the worst case for label propagation (diameter 63);
    # star alternation must close it in O(log n) rounds, not O(n).
    pairs = _pairs(spark, [(i, i + 1) for i in range(64)])
    edges, iters = _cc_with_iters(pairs)
    comp = connected_components(pairs)
    assert comp.where(F.col("component") != 0).count() == 0
    assert comp.count() == 65
    assert iters <= 10, f"path-64 took {iters} star rounds (want O(log n))"


def test_cc_matches_union_find_on_random_graphs(spark):
    rng = random.Random(20260818)
    for trial in range(3):
        n = rng.randint(2, 60)
        m = rng.randint(1, 80)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _union_find(edges)
        got = {
            (r["doc"], r["component"])
            for r in connected_components(_pairs(spark, edges)).collect()
        }
        assert got == set(want.items()), f"trial {trial} n={n} m={m}"


def test_dedup_assign_singletons_and_canonicals(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = _pairs(spark, [(0, 3), (3, 5)])
    out = dedup_assign(docs, pairs).orderBy("doc_id").collect()
    comp = {r["doc_id"]: r["component"] for r in out}
    canon = {r["doc_id"]: r["is_canonical"] for r in out}
    assert comp == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
    assert canon == {0: True, 1: True, 2: True, 3: False, 4: True, 5: False}
    # keep-one-per-cluster retains exactly one member per component
    kept = [r["doc_id"] for r in out if r["is_canonical"]]
    assert sorted(kept) == [0, 1, 2, 4]


def test_cc_over_minhash_pairs_is_consistent(spark, corpus=None):
    # end-to-end: the flagship near-dup pipeline's pairs cluster cleanly —
    # every pair lands in one component and labels are component minima.
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4, threshold=0.6)
    comp = connected_components(pairs)
    joined = (
        pairs.join(
            comp.withColumnRenamed("doc", "doc_a").withColumnRenamed(
                "component", "ca"
            ),
            "doc_a",
        )
        .join(
            comp.withColumnRenamed("doc", "doc_b").withColumnRenamed(
                "component", "cb"
            ),
            "doc_b",
        )
    )
    assert joined.where(F.col("ca") != F.col("cb")).count() == 0
    bad_label = comp.groupBy("component").agg(F.min("doc").alias("mn")).where(
        F.col("mn") != F.col("component")
    )
    assert bad_label.count() == 0


def test_corpus_clean_end_to_end(spark):
    from pyspider_spark.operators.clean import corpus_clean

    base = (
        "the cat and the dog of the house is happy to run and play in the "
        "garden all day " * 8
    )
    near = base.replace("garden", "meadow")
    distinct = (
        "the sailors of the old fleet is keen to chart the wide sea and "
        "the wind of dawn " * 8
    )
    german = "der hund und die katze das haus ist gross und der baum " * 8
    junk = "@@@ ### !!!"
    docs = spark.createDataFrame(
        [
            (0, base),        # kept (canonical of the near-dup cluster)
            (1, base),        # exact duplicate -> dropped before near-dup
            (2, near),        # near-dup of 0 -> present, kept=False
            (3, german),      # lang gate drops it
            (4, junk),        # quality gate drops it
            (5, distinct),    # singleton -> kept
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_clean(docs).collect()}
    assert set(out) == {0, 2, 5}
    assert out[0]["component"] == 0 and out[0]["kept"] is True
    assert out[2]["component"] == 0 and out[2]["kept"] is False
    assert out[5]["component"] == 5 and out[5]["kept"] is True
