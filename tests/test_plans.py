"""Physical-plan assertions: the optimizations we claim must actually be
in the executed plan — filter/projection pushdown to parquet, broadcast
joins for dims, whole-stage codegen, and no Python eval in pure-SQL
queries."""

from __future__ import annotations

import pytest

from housing_crawler_spark.all_queries import REGISTRY


def plan_of(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_filter_and_projection_pushdown(spark, sf_smoke):
    df = REGISTRY["f2_equality_filter"].fn(spark, sf_smoke)
    plan = plan_of(spark, df)
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]" in plan
    # projection pruning: the scan must read only the 3 needed columns
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "o_orderkey" in read_schema and "o_totalprice" in read_schema
    assert "o_orderdate" not in read_schema


def test_date_filter_pushdown(spark, sf_smoke):
    plan = plan_of(spark, REGISTRY["f3_date_range_filter"].fn(spark, sf_smoke))
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipdate" in plan


def test_dim_joins_are_broadcast(spark, sf_smoke):
    for name in ("q3_shipping_priority", "j1_seen_anti_join", "j4_chained_left_join"):
        plan = plan_of(spark, REGISTRY[name].fn(spark, sf_smoke))
        assert "BroadcastHashJoin" in plan, name
    # the anti join must be broadcast, not shuffle
    plan = plan_of(spark, REGISTRY["j1_seen_anti_join"].fn(spark, sf_smoke))
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan


def test_no_python_eval_in_sql_queries(spark, sf_smoke):
    """Every oracle-verified query must be UDF-free (whole plan JVM-side);
    Python appears only in the multimodal/crawl Arrow stages."""
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            continue
        plan = plan_of(spark, qd.fn(spark, sf_smoke), "extended")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "mapInPandas" not in plan.lower(), name


def test_wholestage_codegen_on_flagship(spark, sf_smoke):
    # AQE hides codegen markers until the final plan exists — execute first
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_smoke)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators
    assert "*(" in plan and "HashAggregate" in plan


def test_single_shuffle_for_groupby(spark, sf_smoke):
    """q1: partial aggregation map-side, ONE exchange on the group keys
    (plus the top-level sort's range exchange)."""
    plan = plan_of(spark, REGISTRY["q1_pricing_summary"].fn(spark, sf_smoke))
    assert plan.count("hashpartitioning(") == 1, plan[:2000]
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_no_cartesian_products_anywhere(spark, sf_smoke):
    """No registry query may fall back to a cartesian / nested-loop
    join — banded LSH, bucketed ANN and the grid join must all stay
    equi-joins (broadcast cross-join vs a K-row centroid dim in s4 is
    the one sanctioned exception: bounded by K, not data)."""
    # sanctioned constant-size broadcasts: s4's K=8 centroid dim and the
    # scalar-stats pattern (1-row aggregate broadcast against the fact
    # table — the alternative, a window over an unpartitioned frame,
    # funnels everything through one task)
    allowed_cross = {"s4_ivf_ann", "a9_standardize", "a12_ttest_ingredients",
                     "a13_ols_slope", "a15_percentile_of_value",
                     # t15's 1-row coefficient table broadcast against
                     # the cached feature table (train+apply, a9 shape)
                     "t15_quality_classifier",
                     # brute-force kNN IS the deliberate all-pairs
                     # baseline (broadcast 5 probes x corpus); s2/s3/s4
                     # are the scale paths
                     "s1_knn_bruteforce",
                     # same K-row centroid-dim broadcast as s4: s7's
                     # coarse quantizer reuses s4's assignment, and
                     # s8/s9's SemDeDup clustering is the identical
                     # K=8 trajectory — bounded by K, not data
                     "s7_ivfpq_ann", "s8_semdedup",
                     "s9_cluster_balanced_sample",
                     # s10 re-ranks s7's shortlist: same centroid-dim
                     # broadcast upstream; the refine join itself is an
                     # equi-join on (probe_id, neighbor_id)
                     "s10_ivfpq_rerank",
                     # c10's total-weight and leftover scalars: two
                     # 1-row aggregate broadcasts (a9 shape) against
                     # the |hosts|-row quota table
                     "c10_crawl_budget_apportion",
                     # c12's total-traffic scalar: one 1-row aggregate
                     # broadcast against the |hosts|-row weight table
                     "c12_shard_skew_audit"}
    for name, qd in REGISTRY.items():
        if qd.oracle is None or name in allowed_cross:
            continue
        plan = plan_of(spark, qd.fn(spark, sf_smoke))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_etl_chain_is_single_scan_no_shuffle(spark, sf_smoke):
    """The full 6-stage ETL is embarrassingly parallel until the final
    id-dedup window: one parquet scan, no exchange before the window's
    hash partitioning."""
    import re

    plan = plan_of(spark, REGISTRY["etl6_impute"].fn(spark, sf_smoke))
    # formatted mode prints each scan twice (tree + details) — count nodes
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "hashpartitioning" not in plan  # stage chain alone: no shuffle


def test_d7_joins_are_equi(spark, sf_smoke):
    plan = plan_of(spark, REGISTRY["d7_dedup_pipeline"].fn(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_lsh_planes_are_folded_constants(spark, sf_smoke):
    """The LSH hyperplanes are pure functions of (k, j). Catalyst does
    not constant-fold a transform(sequence(...), md5 ...) generator —
    the round-3 audit measured 512 (s2) / 1,536 (s3) md5+conv evals PER
    ROW in the bucketing stage. _plane_col now emits driver-computed
    literal arrays, so NO md5 may survive in either optimized plan
    (the only md5s in these queries were the plane salts)."""
    for name in ("s2_ann_lsh_bucketed", "s3_ann_near_dup"):
        df = REGISTRY[name].fn(spark, sf_smoke)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "md5" not in plan, name


def test_plane_values_match_sql_formula():
    """_plane_values must stay the hashlib twin of _plane_sql's
    (md5int('k:j') % 1001) - 500 or the oracle parity silently breaks."""
    import hashlib

    from housing_crawler_spark.queries_ml import _plane_values

    for k in (0, 7, 23):
        vals = _plane_values(k)
        assert len(vals) == 64
        for j in (1, 32, 64):
            expect = float(
                int(hashlib.md5(f"{k}:{j}".encode()).hexdigest()[:15], 16) % 1001
                - 500
            )
            assert vals[j - 1] == expect
        assert min(vals) >= -500.0 and max(vals) <= 500.0


def test_s3_star_shape_is_linear_on_template_heavy_corpus(spark):
    """The round-2 s3 did a within-bucket all-pairs self-join: a corpus
    where one template floods a bucket emitted ~n^2/buckets candidate
    rows (the d7-measured 188 s failure shape). The round-3 star core
    must emit at most _S3_BANDS links per vector NO MATTER how skewed
    the buckets are: 4000 identical vectors -> exactly 3999 output rows
    (everyone links to the global min id in both bands; distinct), not
    ~8M pairs."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml2 import _S3_BANDS, star_near_dup

    n = 4000
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(v)) for v in (0.3, -1.2, 2.5, 0.7)]).alias("embedding"),
    )
    out = star_near_dup(e)
    rows = out.count()
    assert rows == n - 1, rows  # star links only — linear, never pairs
    assert rows <= _S3_BANDS * n
    # and every link names the single representative
    assert out.filter(F.col("vec_a") != 0).count() == 0


def _ivf_recall(base, probes, k_cells, nprobe, topk):
    """recall@topk of ivf_ann vs brute force, both under the same
    rounded-cosine + id tiebreak ordering so ties can't flip it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml import cosine
    from housing_crawler_spark.queries_ml2 import ivf_ann

    got = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_ann(
            base, probes, k_cells=k_cells, nprobe=nprobe, topk=topk
        ).collect()
    }
    p, x = probes.alias("p"), base.alias("x")
    cs = cosine(F.col("p.e"), F.col("x.e"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc(F.round(F.col("cs") + F.lit(1e-9), 6)), "neighbor_id"
    )
    gt = {
        (r.probe_id, r.neighbor_id)
        for r in (
            p.join(x, F.col("p.vec_id") != F.col("x.vec_id"))
            .select(
                F.col("p.vec_id").alias("probe_id"),
                F.col("x.vec_id").alias("neighbor_id"),
                cs.alias("cs"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= topk)
            .collect()
        )
    }
    return len(got & gt) / len(gt)


def test_s4_ivf_recall_clone_corpus(spark, sf_smoke):
    """IVF quality gate, near-dup use case: on the corpus with planted
    clones, a probe's true nearest neighbor is its clone (cosine 1.0 —
    cell-stable, since uniform scaling preserves the centroid argmax
    almost surely). recall@1 at nprobe=2 must be >= 0.9. Measured: 1.0."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml2 import _emb

    emb = (
        _emb(spark, sf_smoke)
        .select("vec_id", F.col("embedding").alias("e"))
        .cache()
    )
    probes = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 400))
    r = _ivf_recall(emb, probes, k_cells=8, nprobe=2, topk=1)
    assert r >= 0.9, f"clone-corpus recall@1 = {r:.3f}"


def test_s4_ivf_recall_uniform_monotone_in_nprobe(spark, sf_smoke):
    """On UNIFORM random 64-dim vectors (IVF's worst case — pairwise
    cosines are noise-level, so no cell structure exists to prune by),
    recall@3 must still reach >= 0.9 by raising nprobe, and must grow
    monotonically with it (the cost/recall knob works). Measured at
    K=8 over 20 probes: nprobe=2 -> 0.75, nprobe=5 -> 0.93."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries import load

    base = (
        load(spark, sf_smoke, "embeddings")
        .select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        )
        .cache()
    )
    probes = base.filter(F.col("vec_id") < 20)
    r_low = _ivf_recall(base, probes, k_cells=8, nprobe=2, topk=3)
    r_high = _ivf_recall(base, probes, k_cells=8, nprobe=5, topk=3)
    assert r_high >= 0.9, f"uniform recall@3 at nprobe=5 = {r_high:.3f}"
    assert r_high >= r_low, (r_low, r_high)


def test_s4_ivf_scaled_settings_recall(spark, sf_smoke):
    """Production operating point (round-3 verdict item 7): auto
    K=ceil(sqrt(n)) and 'sampled' hash-ordered seeding — first-K
    seeding is biased when ids correlate with content, exactly this
    corpus's shape (clusters are CONTIGUOUS id blocks, so first-K
    seeds all land in the first few clusters). On a 10x corpus of
    tight 10-member clusters (each base vector + 9 deterministic
    perturbations), a probe's true nearest neighbor is a cluster
    sibling; recall@1 at nprobe=5 must be >= 0.9."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries import load
    from housing_crawler_spark.queries_ml2 import ivf_ann

    base0 = load(spark, sf_smoke, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n0 = base0.count()
    copies = [
        base0.select(
            (F.col("vec_id") * 10 + c).alias("vec_id"),
            F.transform(
                "e",
                # (element, index) two-param lambda: deterministic
                # per-copy, per-dimension jitter — tight cluster of 10
                lambda x, i: x + F.sin(F.col("vec_id") * 1.0 + i * 1.0 + c) * 0.02,
            ).alias("e"),
        )
        for c in range(10)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big = big.cache()
    assert big.count() == 10 * n0
    probes = big.filter(F.col("vec_id") % 100 == 0).limit(20).cache()

    got = {
        (r.probe_id, r.neighbor_id)
        for r in ivf_ann(
            big, probes, k_cells=None, nprobe=5, topk=1, seeding="sampled"
        ).collect()
    }
    from pyspark.sql import Window

    from housing_crawler_spark.queries_ml import cosine

    p, x = probes.alias("p"), big.alias("x")
    cs = cosine(F.col("p.e"), F.col("x.e"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc(F.round(F.col("cs") + F.lit(1e-9), 6)), "neighbor_id"
    )
    gt = {
        (r.probe_id, r.neighbor_id)
        for r in (
            p.join(x, F.col("p.vec_id") != F.col("x.vec_id"))
            .select(
                F.col("p.vec_id").alias("probe_id"),
                F.col("x.vec_id").alias("neighbor_id"),
                cs.alias("cs"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 1)
            .collect()
        )
    }
    recall = len(got & gt) / len(gt)
    assert recall >= 0.9, f"scaled-settings recall@1 = {recall:.3f}"


def test_banded_hamming_skew_guard(spark):
    """A hot band value (10k identical phashes — blank images) must NOT
    go quadratic: buckets above _MAX_BUCKET fall back to star links to
    the bucket representative, so the output is n-1 rows (~5*10^7 pairs
    under the unguarded all-pairs join)."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml2 import _banded_hamming

    n = 10_000
    hot = spark.range(n).select(
        F.col("id").alias("image_key"), F.lit(0).cast("long").alias("phash")
    )
    out = _banded_hamming(hot, band_bits=15, n_bands=4, max_hamming=8)
    assert out.count() == n - 1
    # every surviving link points at the representative (image_key 0)
    assert out.filter(F.col("img_a") != 0).count() == 0


def test_min_label_components_chain_and_star(spark):
    """Transitive closure must collapse a long CHAIN (the shape
    single-pass keeper assignment cannot): 0-1-2-...-19 is one
    component labeled 0, and a disjoint star (100 <- 101..140) is one
    component labeled 100. Convergence is O(diameter) driver rounds."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.operators.graph import min_label_components

    chain = spark.range(19).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    star = spark.range(101, 141).select(
        F.lit(100).alias("a"), F.col("id").alias("b")
    )
    comps = {
        r["node"]: r["component"]
        for r in min_label_components(chain.unionByName(star)).collect()
    }
    assert {comps[i] for i in range(20)} == {0}
    assert {comps[i] for i in range(101, 141)} == {100}
    assert comps[100] == 100
    assert len(comps) == 20 + 41


def test_star_components_collapses_1000_hop_chain(spark):
    """small-star/large-star converges in O(log n) rounds regardless of
    diameter: a 1,000-hop chain (min-label propagation would need 1,001
    rounds and raise at its default cap) plus a disjoint star and a
    singleton self-loop, all labeled correctly within 15 iterations."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.operators.graph import star_components

    chain = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    star = spark.range(2001, 2041).select(
        F.lit(2000).alias("a"), F.col("id").alias("b")
    )
    loner = spark.createDataFrame([(5000, 5000)], "a long, b long")
    edges = chain.unionByName(star).unionByName(loner)
    # max_iter=15 IS the O(log n) assertion: ~2*log2(1000)+c rounds
    comps = {
        r["node"]: r["component"]
        for r in star_components(edges, max_iter=15).collect()
    }
    assert {comps[i] for i in range(1001)} == {0}
    assert {comps[i] for i in range(2001, 2041)} == {2000}
    assert comps[2000] == 2000 and comps[5000] == 5000
    assert len(comps) == 1001 + 41 + 1

    # parity with min-label on a shallow graph (d8's production shape)
    from housing_crawler_spark.operators.graph import min_label_components

    shallow = spark.range(8).select(
        (F.col("id") % 3).alias("a"), (F.col("id") + 10).alias("b")
    )
    a = sorted(tuple(r) for r in star_components(shallow).collect())
    b = sorted(
        (r["node"], r["component"]) for r in min_label_components(shallow).collect()
    )
    assert a == b


def test_s6_pq_twin_recall(spark, sf_smoke):
    """PQ quality gate: every planted perturbed-twin probe must rank
    its SOURCE vector as the top-1 ADC neighbor (probe_id = src_id +
    1e6, so the check is pure arithmetic on the query output). The raw
    corpus is near-uniform (exact neighbors are noise-level apart), so
    the twin case is the one ANN is for — measured 25/25 at sf0.01."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml3 import s6_pq_ann

    out = s6_pq_ann(spark, sf_smoke).filter(F.col("approx_dist").isNotNull())
    # collect() order is arbitrary — find each probe's rank-1 row as
    # the (dist, id)-minimal one, mirroring the query's own ordering
    rows = out.collect()
    best = {}
    for r in rows:
        cur = best.get(r.probe_id)
        if cur is None or (r.approx_dist, r.neighbor_id) < cur[:2]:
            best[r.probe_id] = (r.approx_dist, r.neighbor_id)
    assert best, "no probes scored"
    misses = {p: v for p, v in best.items() if v[1] != p - 1000000}
    assert not misses, f"twin not top-1 for {len(misses)} probes: {misses}"


def test_s7_ivfpq_twin_recall_and_candidate_bound(spark, sf_correct):
    """The IVFADC composition gates (round-5 verdict item 3):
    (a) RECALL — every planted perturbed-twin probe must still rank its
        source vector top-1 AFTER IVF pruning, i.e. the twin's cell
        survives nprobe=2 (measured 25/25 at sf0.01; at sf0.001 the
        8 cells hold ~6 vectors each and ±0.06/dim perturbation flips
        2/25 boundary assignments — there nprobe=3 recovers 25/25,
        which is the cost/recall knob working, not a defect);
    (b) COST — the scored-candidate row count is ∝ candidates (the
        members of each probe's nprobe cells), strictly < probes ×
        corpus, which is what the exhaustive s6 would score."""
    from housing_crawler_spark.queries_ml4 import _S7_NPROBE, ivfpq_parts

    probes, cells, cand, _adc, topk = ivfpq_parts(spark, sf_correct)
    n_probes = probes.count()
    n_corpus = cells.count()
    assert n_probes > 0

    # (b) candidate bound: exactly the probed cells' membership mass,
    # never the corpus
    n_cand = cand.count()
    cell_sizes = {r["cid"]: r["n"] for r in cells.groupBy("cid").count().withColumnRenamed("count", "n").collect()}
    assert n_cand < n_probes * n_corpus, (n_cand, n_probes * n_corpus)
    assert n_cand <= n_probes * _S7_NPROBE * max(cell_sizes.values())

    # (a) twin recall@1 through the pruned composition
    rows = topk.collect()
    best = {}
    for r in rows:
        cur = best.get(r.probe_id)
        if cur is None or (r.approx_dist, r.neighbor_id) < cur[:2]:
            best[r.probe_id] = (r.approx_dist, r.neighbor_id)
    assert len(best) == n_probes, "a probe lost ALL candidates to pruning"
    misses = {p: v for p, v in best.items() if v[1] != p - 1000000}
    assert not misses, f"twin not top-1 after pruning for {misses}"


def test_s7_matches_s6_on_surviving_candidates(spark, sf_smoke):
    """PQ here encodes raw vectors, so s7's ADC distance for any
    (probe, neighbor) pair must EQUAL exhaustive s6's for the same
    pair — pruning changes the candidate set, never a score."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml3 import s6_pq_ann
    from housing_crawler_spark.queries_ml4 import s7_ivfpq_ann

    s6 = {
        (r.probe_id, r.neighbor_id): r.approx_dist
        for r in s6_pq_ann(spark, sf_smoke).collect()
    }
    for r in s7_ivfpq_ann(spark, sf_smoke).collect():
        k = (r.probe_id, r.neighbor_id)
        if k in s6:  # s6 keeps top-3 of ALL codes; overlap must agree
            assert s6[k] == r.approx_dist, k


def test_s10_rerank_dominates_adc_ranking(spark, sf_correct):
    """The refine stage's contract: s10's winner per probe is the
    planted twin, and its exact_dist equals the TRUE L2² of the
    deterministic perturbation (closed form from _PQ_PERT) — i.e. the
    re-rank output is the exact metric, not a quantized estimate
    (s7's ADC distances carry codebook error and would fail the
    1e-3 check)."""
    from pyspark.sql import functions as F

    from housing_crawler_spark.queries_ml3 import _PQ_D, _PQ_M
    from housing_crawler_spark.queries_ml4 import s10_ivfpq_rerank

    out = s10_ivfpq_rerank(spark, sf_correct).collect()
    best = {}
    for r in out:
        cur = best.get(r.probe_id)
        if cur is None or (r.exact_dist, r.neighbor_id) < cur:
            best[r.probe_id] = (r.exact_dist, r.neighbor_id)
    assert best
    # closed-form perturbation distance: sum over dims of
    # (0.02 * (((i - 1) % 7) - 3))^2, i = 1..64  (queries_ml3._PQ_PERT)
    true_d = sum((0.02 * (((i - 1) % 7) - 3)) ** 2 for i in range(1, _PQ_M * _PQ_D + 1))
    for p, (d, n) in best.items():
        assert n == p - 1000000, (p, n)
        assert abs(d - true_d) < 1e-3, (p, d, true_d)
