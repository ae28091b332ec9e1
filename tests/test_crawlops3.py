"""Invariants for the crawlops family 3 (c8-c11) that the DuckDB
hash-match cannot express: planted-mirror recall, exact budget
conservation, and trap/organic flag separation."""

from __future__ import annotations

import pyspark.sql.functions as F

from housing_crawler_spark.queries import REGISTRY
import housing_crawler_spark.queries_crawlops3  # noqa: F401


def test_c8_planted_mirrors_flagged(spark, sf_correct) -> None:
    pdf = (
        REGISTRY["c8_mirror_host_detection"].fn(spark, sf_correct).toPandas()
    )
    mirrors = pdf[pdf.is_mirror]
    # exactly the three planted full mirrors, Jaccard 1.0
    assert sorted(zip(mirrors.host_a, mirrors.host_b)) == [
        ("h00", "m00"),
        ("h01", "m01"),
        ("h02", "m02"),
    ]
    assert (mirrors.jaccard == 1.0).all()
    # the partial mirror p03 pairs with h03 well above organic overlap
    # but below the mirror threshold
    p = pdf[(pdf.host_a == "h03") & (pdf.host_b == "p03")]
    assert len(p) == 1 and not p.is_mirror.item()
    assert 0.4 <= p.jaccard.item() <= 0.6
    # organic pairs never flag
    organic = pdf[
        pdf.host_a.str.startswith("h") & pdf.host_b.str.startswith("h")
    ]
    assert not organic.is_mirror.any()


def test_c10_budget_conserved_exactly(spark, sf_correct) -> None:
    df = REGISTRY["c10_crawl_budget_apportion"].fn(spark, sf_correct)
    row = df.agg(
        F.sum("alloc").alias("a"),
        F.sum("floor_quota").alias("q"),
        F.max(F.col("alloc") - F.col("floor_quota")).alias("mx"),
        F.min(F.col("alloc") - F.col("floor_quota")).alias("mn"),
    ).collect()[0]
    from housing_crawler_spark.queries_crawlops3 import _C10_BUDGET

    assert row["a"] == _C10_BUDGET  # largest-remainder conservation
    assert row["q"] < _C10_BUDGET  # leftover arm actually exercised
    assert row["mn"] == 0 and row["mx"] == 1  # each host gets q0 or q0+1


def test_c11_trap_separation(spark, sf_correct) -> None:
    pdf = (
        REGISTRY["c11_spider_trap_detection"].fn(spark, sf_correct).toPandas()
    )
    planted = pdf[pdf.host % 5 == 3]
    organic = pdf[pdf.host % 5 != 3]
    assert planted.is_trap.all(), planted.to_string()
    assert not organic.is_trap.any(), organic.to_string()
    # the detector margin: planted runs clear the threshold, organic
    # runs sit strictly below it
    assert planted.max_growth_run.min() >= 3
    assert organic.max_growth_run.max() < 3


def test_c9_all_statuses_present(spark, sf_correct) -> None:
    df = REGISTRY["c9_sitemap_reconcile"].fn(spark, sf_correct)
    statuses = {r[0] for r in df.select("status").distinct().collect()}
    assert statuses == {"fresh", "stale", "never_fetched", "undeclared"}
    # backlog only accrues to refetchable statuses
    bad = df.filter(
        (~F.col("status").isin("stale", "never_fetched"))
        & (F.col("refetch_backlog") > 0)
    ).count()
    assert bad == 0


def test_c12_salting_restores_balance(spark, sf_correct) -> None:
    pdf = REGISTRY["c12_shard_skew_audit"].fn(spark, sf_correct).toPandas()
    # exact load conservation through the integer salt shares
    assert pdf.load_before.sum() == pdf.load_after.sum()
    n = len(pdf)
    imb_before = pdf.load_before.max() * n / pdf.load_before.sum()
    imb_after = pdf.load_after.max() * n / pdf.load_after.sum()
    # planted hot hosts skew plain hash sharding hard; round-robin
    # salting with 2x headroom restores near-uniform load
    assert imb_before > 3.0, imb_before
    assert imb_after < 2.0, imb_after


def test_c13_kmv_estimator_quality(spark, sf_correct) -> None:
    pdf = REGISTRY["c13_kmv_cardinality"].fn(spark, sf_correct).toPandas()
    # both estimator branches live at the gate's sf: the planted
    # sparse host takes sketch-is-exact, the rest the k-th-order form
    assert pdf.sketch_exact.sum() >= 1
    assert (~pdf.sketch_exact).sum() >= 30
    exact_rows = pdf[pdf.sketch_exact]
    assert (exact_rows.kmv_estimate == exact_rows.n_distinct).all()
    assert (exact_rows.rel_err == 0).all()
    # KMV at k=64 carries ~1/sqrt(63) ≈ 12.6% expected relative error;
    # the realized per-host errors stay inside a generous 2.8-sigma cap
    sk = pdf[~pdf.sketch_exact]
    assert sk.rel_err.abs().max() < 0.35, sk.rel_err.abs().max()
    assert sk.rel_err.abs().mean() < 0.15
