"""Benchmark harness (driver contract: print ONE JSON line).

Two workloads:
1. headline analytic queries at $SPARK_GRAFT_SF_DIR (default sf0.1),
   fully materialized through the noop sink (count() would let Spark
   skip column materialization);
2. the crawl engine on a synthetic frontier (the BASELINE.json metric:
   frontier URLs processed/sec through fetch+decode+write).

Modes:
    python bench.py                 # full: queries + crawl → one JSON line
    python bench.py --crawl-only    # crawl throughput JSON only (used by
                                    # bench_scaling.py at two core counts)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_ROUNDS, SPARK_GRAFT_BENCH_PAGES.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "f4_sanity_range_filter",
    "j1_seen_anti_join",
    "w1_priority_rank",
    "a11_threshold_bands",
    "t1_text_stats",
    "d2_minhash_signatures",
    "d4_simhash",
    "s2_ann_lsh_bucketed",
    "etl6_impute",  # the full 6-stage ETL chain
    "d7_dedup_pipeline",  # LSH candidates → Jaccard verify → keeper
    "m2_phash_near_dup",  # 4-band Hamming near-dup (skew-guarded)
    "s3_ann_near_dup",  # star-to-representative ANN near-dup
    "t5_corpus_prep",  # quality → langid → exact dedup → near-dup → corpus
    "t6_redact_pii",  # regex scrub + audit counts (round 4)
    "v3_weekly_model_train_multi",  # k-feature walk-forward ridge (round 4)
    # round 5: the Arrow codec path over the FULL sf corpus (~7.5k
    # images at sf0.1 — the 400-doc cap is gone) and its banded dedup
    "m1_image_decode_stats",  # gen→encode→decode→PSNR verify, mat table
    "m3_phash_image_near_dup",  # real-phash banded Hamming near-dup
    "t7_transitive_corpus_dedup",  # d8 components → one doc per cluster
    "v5_weekly_model_train_k6",  # k=6 Gaussian-elimination ridge
    "t8_decontaminate",  # eval-overlap scan (broadcast eval grams)
    "t9_repetition_filter",  # Gopher repetition fractions (one scan)
    "d9_substring_dup_audit",  # ExactSubstr span audit (int64 spans)
    # round 5 (late): DSIR selection, as-of join, LAION curation funnel,
    # Gopher quality battery, exposure filter
    "t12_dsir_selection",
    "j9_asof_join",
    "m9_image_curation",
    "t14_gopher_quality_rules",
    "m10_image_exposure_filter",
    "t15_quality_classifier",  # ridge-probe train+apply in one plan
    "s6_pq_ann",  # product-quantization ANN (train+encode+ADC)
    # round 6: audit → production semantics
    "d10_substring_dup_cut",  # ExactSubstr CUT (interval merge + excise)
    "s7_ivfpq_ann",  # IVF lists × PQ codes (the IVFADC composition)
    "s8_semdedup",  # SemDeDup (k-means cells + within-cell cosine prune)
    "j10_split_leakage_audit",  # cross-split MinHash leakage audit
    "m11_ocr_text_density",  # text-in-image pre-filter (Arrow decode)
    "m12_video_frame_sample",  # video container + stride sample + cuts
    "m13_video_near_dup",  # clip-level banded-phash near-dup
    # round 6 (late): refine re-rank, CCNet sampling, basic image gates
    "s10_ivfpq_rerank",  # IVFADC + exact re-rank of the ADC shortlist
    "t16_perplexity_sampling",  # t13 LM scoring + bucket-aware sampling
    "m16_image_basic_filters",  # DataComp basic-filter battery
    "m17_image_corpus_prep",  # end-to-end image funnel, one decode pass
    # round 6 (late): crawl-tier scheduling family + watermark gate
    "c4_dust_param_rules",  # DUST strippable-parameter mining
    "c5_host_pagerank",  # 3 exact-integer power iterations
    "m18_watermark_filter",  # LAION watermark gate (corner variance)
    # round 6 (session 5): crawl-tier family 3
    "c8_mirror_host_detection",  # image-fingerprint Jaccard mirror pairs
    "c10_crawl_budget_apportion",  # exact largest-remainder budgets
    "m19_aspect_bucketing",  # SDXL aspect buckets, zero-shuffle argmin fold
    "c13_kmv_cardinality",  # KMV distinct sketch, exact-integer estimator
    # c7_url_alias_components is NOT in the headline for the same
    # reason as d11 below: star_components' ~6-8 supersteps each pay
    # the local-mode job floor (localCheckpoint per round), measuring
    # fixed cost, not data throughput — the driver gate checks its
    # correctness at sf0.01 (t7 keeps a components entry in the
    # headline via the small doc graph).
    # d11_incremental_dedup is NOT in the headline: 3 sequential
    # stateful ingests (~25 Spark jobs of fixed cost) measure the
    # local-mode job floor, not data throughput — the driver gate
    # checks its correctness at sf0.01
]

# single-shot timing couldn't distinguish a regression from noise
# (round-2 VERDICT: s2 +40%, d4 +21% on UNCHANGED plans) — each query
# runs REPS times and the median is reported
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def bench_queries(spark) -> dict[str, float]:
    from housing_crawler_spark.all_queries import REGISTRY

    out = {}
    for name in HEADLINE:
        times = []
        for _ in range(REPS):
            df = REGISTRY[name].fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            # queries cache() derived tables internally; drop between
            # reps so later reps don't accumulate heap pressure
            spark.catalog.clearCache()
            # ...and collect the garbage NOW (JMH-style): leftover heap
            # from a heavy predecessor throttles the next measurement
            # 10-20x (d9 measured 38-73 s right after the m/t block,
            # 2.1 s after one System.gc()) — each rep should pay for
            # its own allocation, not its predecessors' garbage. GC
            # runs outside the timed section.
            spark.sparkContext._jvm.System.gc()
        out[name] = round(sorted(times)[len(times) // 2], 3)
    return out


def bench_crawl(spark) -> dict:
    """Crawl a synthetic world; report frontier URLs processed/sec
    (fetch + parse + image decode/encode + snapshot write)."""
    from housing_crawler_spark import synth
    from housing_crawler_spark.crawl import CrawlEngine, EngineConfig

    # default world = EXACTLY the scaling runs' steady-state workload
    # (bench_scaling.py), so the per-round number here is directly
    # comparable to BENCH/BASELINE.md. Small worlds are fixed-cost-
    # dominated (the old 300-page default read 252 URLs/s at local[32]
    # while the 15000-page steady state reads ~2000 — the bloom
    # prefilter never even activates at 3.6k URLs); realistic payloads
    # (128-512 px, dctq, decode-verify per the north_rule's per-row
    # invariant) keep codec compute, not round overhead, dominant.
    world = synth.WorldConfig(
        n_hosts=40,
        base_pages=int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "15000")),
        round_seconds=int(os.environ.get("SPARK_GRAFT_BENCH_ROUND_SECONDS", "200000")),
        img_lo=int(os.environ.get("SPARK_GRAFT_BENCH_IMG_LO", "128")),
        img_hi=int(os.environ.get("SPARK_GRAFT_BENCH_IMG_HI", "512")),
        imgs_per_detail_max=int(os.environ.get("SPARK_GRAFT_BENCH_IMGS", "2")),
        fmt_override=os.environ.get("SPARK_GRAFT_BENCH_FMT", "dctq") or None,
        img_noise=float(os.environ.get("SPARK_GRAFT_BENCH_IMG_NOISE", "2.0")),
    )
    n_rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2"))
    verify = os.environ.get("SPARK_GRAFT_BENCH_VERIFY", "1") == "1"
    with tempfile.TemporaryDirectory(prefix="hcs_bench_") as tmp:
        from housing_crawler_spark.storage.snapshots import SnapshotStore

        eng = CrawlEngine(
            spark,
            SnapshotStore(tmp),
            world,
            EngineConfig(salt_threshold=50_000, verify_decode=verify),
        )
        seed = synth.seed_frontier_rows(world)
        eng.init_state(seed, synth.robots_rows(world))
        # measure the processing rounds only (seed ingestion is one-time);
        # counts come from round metrics + parquet footers — no extra jobs
        os.sync()  # don't bill prior runs' page-cache writeback to this one
        t0 = time.perf_counter()
        metrics = eng.run(n_rounds)
        elapsed = time.perf_counter() - t0
        n_fetched = sum(m["n_selected"] for m in metrics)
        n_images = _parquet_rows(tmp, "images")
    return {
        "crawl_urls": n_fetched,
        "crawl_images": n_images,
        "crawl_sec": round(elapsed, 3),
        "frontier_urls_per_sec": round(n_fetched / elapsed, 2),
        "cpus": CPUS,
    }


def _parquet_rows(store_root: str, table: str) -> int:
    import glob

    import pyarrow.parquet as pq

    total = 0
    for f in glob.glob(f"{store_root}/{table}/delta-*/*.parquet"):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def main() -> None:
    from housing_crawler_spark.session import spark_session

    crawl_only = "--crawl-only" in sys.argv
    spark = spark_session("hcs-bench", cores=CPUS, shuffle_partitions=CPUS)
    try:
        if crawl_only:
            print(json.dumps(bench_crawl(spark)))
            return
        # crawl FIRST, on the fresh JVM — the same conditions the scaling
        # runs measure under (bench_scaling.py spawns a clean process per
        # crawl); running 40+ query jobs beforehand leaves heap/GC
        # pressure that shaved ~20% off the crawl number
        crawl = bench_crawl(spark)
        queries = bench_queries(spark)
        total = round(sum(queries.values()) + crawl["crawl_sec"], 3)
        print(
            json.dumps(
                {
                    "metric": "headline queries + synthetic crawl wall time",
                    "value": total,
                    "unit": "sec",
                    "queries": queries,
                    "sf": SF_DIR,
                    **crawl,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
