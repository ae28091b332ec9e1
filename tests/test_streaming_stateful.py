"""applyInPandasWithState streaming dedup == batch distinct-first."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from housing_crawler_spark.streaming.stateful import streaming_seen_dedup


def test_streaming_dedup_matches_batch(spark, sf_smoke, tmp_path):
    # build a URL stream with guaranteed duplicates from orders keys
    src = tmp_path / "urlstream"
    src.mkdir()
    base = spark.read.parquet(f"{sf_smoke}/orders.parquet").select(
        F.concat(
            F.lit("https://host-"),
            (F.col("o_orderkey") % 7).cast("string"),
            F.lit(".example/ad/"),
            (F.col("o_orderkey") % 300).cast("string"),
        ).alias("canonical_url")
    )
    base.coalesce(2).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(base.schema).parquet(str(src))
    q = (
        streaming_seen_dedup(stream, n_buckets=8)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT canonical_url FROM dedup_out").collect()
    finally:
        q.stop()
    got_urls = sorted(r["canonical_url"] for r in got)
    want = sorted(
        r["canonical_url"] for r in base.select("canonical_url").distinct().collect()
    )
    assert got_urls == want  # exactly one row per distinct URL
