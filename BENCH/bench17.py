import sys, os, json
sys.path.insert(0, "/root/repo")
import bench
# r04's exact headline list (BENCH_r04.json keys, in order)
bench.HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "f4_sanity_range_filter",
    "j1_seen_anti_join", "w1_priority_rank", "a11_threshold_bands",
    "t1_text_stats", "d2_minhash_signatures", "d4_simhash",
    "s2_ann_lsh_bucketed", "etl6_impute", "d7_dedup_pipeline",
    "m2_phash_near_dup", "s3_ann_near_dup", "t5_corpus_prep",
    "t6_redact_pii", "v3_weekly_model_train_multi",
]
from housing_crawler_spark.session import spark_session
spark = spark_session("bench17", cores=32, shuffle_partitions=32)
try:
    crawl = bench.bench_crawl(spark)
    queries = bench.bench_queries(spark)
    print(json.dumps({"queries": queries, **crawl}))
finally:
    spark.stop()
