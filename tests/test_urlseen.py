"""Sharded bloom URL-seen: zero false negatives (hard guarantee), false
positives under the configured bound, and split_candidates soundness."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bloom_and_sets(spark):
    from pyspider_spark.operators.urlseen import ShardedBloom

    seen = spark.range(0, 5000).select(
        F.md5(F.concat(F.lit("http://seen.test/p"), F.col("id").cast("string"))).alias("taskid")
    )
    unseen = spark.range(0, 5000).select(
        F.md5(F.concat(F.lit("http://unseen.test/p"), F.col("id").cast("string"))).alias("taskid")
    )
    bloom = ShardedBloom(n_shards=8, bits_per_key=12, expected_per_shard=2000)
    bloom.add_df(seen)
    return bloom, seen, unseen


def test_no_false_negatives(spark, bloom_and_sets):
    bloom, seen, _ = bloom_and_sets
    probe = bloom.might_contain_udf(spark)
    misses = seen.where(~probe(F.col("taskid"))).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark, bloom_and_sets):
    bloom, _, unseen = bloom_and_sets
    probe = bloom.might_contain_udf(spark)
    fp = unseen.where(probe(F.col("taskid"))).count()
    # 12 bits/key, k=7 → theoretical fp ~0.03%; allow generous 2%
    assert fp / 5000 < 0.02


def test_split_candidates_sound(spark, bloom_and_sets):
    bloom, seen, unseen = bloom_and_sets
    cands = seen.unionByName(unseen)
    definitely_new, maybe_seen = bloom.split_candidates(cands)
    # no seen taskid may land in definitely_new (soundness)
    leaked = definitely_new.join(seen, "taskid", "left_semi").count()
    assert leaked == 0
    # and the split is a partition of the input
    assert definitely_new.count() + maybe_seen.count() == 10000


def test_incremental_add(spark):
    from pyspider_spark.operators.urlseen import ShardedBloom

    bloom = ShardedBloom(n_shards=4, bits_per_key=12, expected_per_shard=1000)
    a = spark.range(0, 100).select(F.md5(F.col("id").cast("string")).alias("taskid"))
    b = spark.range(100, 200).select(F.md5(F.col("id").cast("string")).alias("taskid"))
    bloom.add_df(a)
    probe = bloom.might_contain_udf(spark)
    assert b.where(probe(F.col("taskid"))).count() <= 2  # ~none yet
    bloom.add_df(b)
    probe2 = bloom.might_contain_udf(spark)
    assert b.where(~probe2(F.col("taskid"))).count() == 0


def test_hex_parse_vectorized_equivalent_and_faster():
    """VERDICT r02 item 9: the fixed-width hex->uint64 parse must match the
    scalar int(x,16) reference exactly and beat it >= 5x at batch size."""
    import hashlib
    import time

    import pandas as pd

    from pyspider_spark.operators.urlseen import _hashes, _hashes_scalar

    ids = pd.Series(
        [hashlib.md5(str(i).encode()).hexdigest() for i in range(50_000)]
    )
    h1, h2 = _hashes(ids)
    r1, r2 = _hashes_scalar(ids)
    assert (h1 == r1).all() and (h2 == r2).all()

    # uppercase hex must parse identically too
    up = ids.str.upper()
    u1, u2 = _hashes(up)
    assert (u1 == r1).all() and (u2 == r2).all()

    # micro-bench (min-of-3 each; generous margin over the >=5x ask)
    t_fast = min(
        (lambda t0=time.perf_counter(): (_hashes(ids), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    t_slow = min(
        (lambda t0=time.perf_counter(): (_hashes_scalar(ids), time.perf_counter() - t0)[1])()
        for _ in range(3)
    )
    assert t_slow / t_fast >= 5, f"speedup {t_slow / t_fast:.1f}x"


def test_hex_parse_synthetic_taskids():
    """Non-hex taskids (synthetic events) still hash into the keyspace."""
    import hashlib

    import pandas as pd

    from pyspider_spark.operators.urlseen import _hashes

    mixed = pd.Series(["on_finished", hashlib.md5(b"x").hexdigest(), None])
    h1, h2 = _hashes(mixed)
    want1, _ = _hashes(pd.Series([hashlib.md5(b"on_finished").hexdigest()]))
    assert h1[0] == want1[0]
    assert len(h1) == len(h2) == 3
