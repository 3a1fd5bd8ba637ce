"""Dedup blocking soundness + hot-bucket guards (VERDICT r01 items 1b/6).

The simhash pigeonhole scheme must find pairs at ANY distance <= the
requested max_hamming — the round-1 bug was a fixed 4-chunk split that
silently dropped hamming-4..6 pairs whose differing bits spread across all
4 chunks.
"""

from pyspark.sql import functions as F

from pyspider_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash_chunk_plan,
    simhash_near_pairs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc long, simhash long"
    )


def test_chunk_plan_sound():
    # pigeonhole: need more chunks than the max distance
    for d in range(0, 8):
        n_chunks, chunk_bits = simhash_chunk_plan(d)
        assert n_chunks > d
        assert n_chunks * chunk_bits == 56


def test_simhash_planted_pair_hamming5(spark):
    """Differing bits spread across all 4 of the old 14-bit chunks — the
    round-1 4-chunk blocking missed exactly this shape."""
    base = 0x00AA55AA55AA55  # arbitrary 56-bit signature
    flipped = base
    for pos in (0, 14, 28, 42, 43):  # 5 bits, one+ in every 14-bit quarter
        flipped ^= 1 << pos
    noise = [0x0F0F0F0F0F0F0F ^ (i << 20) for i in range(10)]
    df = _sig_df(spark, [base, flipped] + noise)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=6).collect()
    }
    assert pairs.get((0, 1)) == 5


def test_simhash_all_distances_up_to_max(spark):
    """Exhaustive: for every d <= max_hamming, a planted pair at exactly
    distance d (bits spread maximally) is found."""
    base = 0x00123456789ABC
    max_h = 6
    n_chunks, chunk_bits = simhash_chunk_plan(max_h)
    rows, expected = [base], {}
    for d in range(1, max_h + 1):
        sig = base
        for j in range(d):  # one flipped bit per chunk -> worst spread
            sig ^= 1 << (j * chunk_bits)
        expected[(0, len(rows))] = d
        rows.append(sig)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(_sig_df(spark, rows), max_hamming=max_h).collect()
    }
    for pair, d in expected.items():
        assert got.get(pair) == d, f"missed planted pair at hamming {d}"


def test_simhash_hot_block_guard(spark):
    """A block holding 30% of docs must be dropped, not joined O(n^2):
    pair output stays bounded and unrelated planted pairs still surface."""
    hot = [0x00FFFFFFFFFFFF] * 60  # identical sigs: collide in EVERY chunk
    planted = [0x00000000000F0F, 0x00000000000F0E]  # hamming 1
    df = _sig_df(spark, hot + planted)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(df, max_hamming=3, max_block_size=50).collect()
    }
    assert (60, 61) in pairs  # planted pair survives
    assert len(pairs) == 1  # hot block contributed nothing (guard dropped it)


def test_lsh_hot_bucket_guard(spark):
    """Same guard on the MinHash LSH bucket join."""
    # 40 docs with identical signatures (one giant bucket) + 1 distinct
    rows = [(i, *[7] * 8) for i in range(40)] + [(40, *range(100, 108))]
    df = spark.createDataFrame(
        rows, "doc long, " + ", ".join(f"h{i} long" for i in range(8))
    )
    pairs = lsh_candidate_pairs(df, bands=2, rows=4, max_bucket_size=10).collect()
    assert pairs == []  # hot bucket dropped; distinct doc matches nothing


def test_bucket_guards_use_no_window(spark):
    """The guard must be groupBy+join (partial agg), not a window sort."""
    df = _sig_df(spark, [1, 2, 3])
    plan = simhash_near_pairs(df, max_hamming=3)._jdf.queryExecution().toString()
    assert "Window" not in plan
    sigs = spark.createDataFrame(
        [(0, *range(8))], "doc long, " + ", ".join(f"h{i} long" for i in range(8))
    )
    plan2 = lsh_candidate_pairs(sigs, bands=2, rows=4)._jdf.queryExecution().toString()
    assert "Window" not in plan2


def test_array_form_signatures_match_grouped_and_shuffle_free(spark):
    """VERDICT r04 item 6: the per-row array signatures must equal the
    grouped (explode + groupBy) signatures exactly, and their plan must
    contain NO exchange at all (the signature groupBy was minhash's
    dominant remaining shuffle)."""
    from pyspider_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_from_sets,
        shingle_sets,
        shingles,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"some shared text body {i % 3} tail {i}") for i in range(40)],
        "doc_id string, text string",
    )
    grouped = minhash_signatures(shingles(docs, k=4), 16)
    arrform = minhash_signatures_from_sets(shingle_sets(docs, k=4), 16)
    key = lambda r: r["doc"]
    assert sorted(map(tuple, grouped.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, arrform.collect()), key=lambda t: t[0]
    )
    plan = arrform._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle by construction


def test_estimate_prefilter_preserves_results(spark):
    """The opt-in estimate prefilter (100-TB lever for non-broadcastable
    set tables) must not change the verified pair set at the default
    margin on a corpus with real near-dups."""
    from pyspider_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(
        map(tuple, minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4,
                                 threshold=0.6).collect())
    )
    pref = sorted(
        map(tuple, minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4,
                                 threshold=0.6, est_margin=0.25).collect())
    )
    assert base == pref and len(base) > 0
