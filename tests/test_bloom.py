"""Bloom shards: zero false negatives (hard guarantee), measured FP rate,
and exactness of the accelerated anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.operators import bloom


def test_no_false_negatives_and_fp_rate(spark):
    seen = spark.range(0, 20_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    shards = bloom.build_shards(seen, n_shards=8)
    probed = bloom.probe(spark, seen, shards)
    assert probed.filter(~F.col("maybe_seen")).count() == 0  # zero FN

    fresh = spark.range(100_000, 140_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    fp = bloom.probe(spark, fresh, shards).filter(F.col("maybe_seen")).count()
    assert fp / 40_000 < 0.05  # 10 bits/key, 4 hashes → ~1% expected


def test_accelerated_anti_join_is_exact(spark):
    seen = spark.range(0, 5_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash")
    )
    cand = spark.range(2_500, 9_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.col("id").alias("orig"),
    )
    shards = bloom.build_shards(seen, n_shards=4)
    fast = {
        r["orig"]
        for r in bloom.anti_join_seen(spark, cand, seen, shards).collect()
    }
    exact = {
        r["orig"]
        for r in cand.join(seen, "url_hash", "left_anti").collect()
    }
    assert fast == exact == set(range(5_000, 9_000))
