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
