"""c3/m14 (queries_crawlops) beyond the registry-wide oracle mirror:
the salted path must actually ENGAGE in c3 (otherwise the query
silently tests the trivial one-window path), and m14's planted
conflicts must exercise the audit columns (otherwise an empty result
passes vacuously)."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.operators.frontier import select_round, with_budgets
from housing_crawler_spark.queries_crawlops import (
    _C3_ROUND_SECONDS,
    _C3_SALT_THRESHOLD,
    _c3_candidates,
    c3_politeness_schedule,
    m14_caption_conflicts,
)


def test_c3_hot_host_exceeds_salt_threshold(spark, sf_smoke):
    """The planted hot host must be larger than the salt threshold at
    the smoke SF, or the two-phase path never runs and the query tests
    nothing the one-window path doesn't."""
    hot_n = (
        _c3_candidates(spark, sf_smoke)
        .filter(F.col("host") == "hot.example")
        .count()
    )
    assert hot_n > _C3_SALT_THRESHOLD, (hot_n, _C3_SALT_THRESHOLD)


def test_c3_salted_equals_one_window_path(spark, sf_smoke):
    """Two-phase exact top-B (salted, forced by the tiny threshold)
    must select exactly the rows the plain one-window path selects —
    skew handling is invisible in the result set."""
    cand = _c3_candidates(spark, sf_smoke)
    robots = cand.select("host").distinct().withColumn(
        "crawl_delay_s", F.lit(1) + F.length("host") % 3
    )
    budgets = with_budgets(robots, _C3_ROUND_SECONDS)
    salted = c3_politeness_schedule(spark, sf_smoke)
    # frontier_size_hint small → the single-window path in select_round
    plain = select_round(
        cand, budgets, salt_threshold=10**9, frontier_size_hint=1
    ).select("host", "canonical_url", "rank")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_m14_planted_conflicts_surface(spark, sf_smoke):
    """Planted reposts must produce non-vacuous conflict groups, the
    canonical caption must be the first-seen original (never the
    ' (repost)' twin), and every group must have at least one row to
    rewrite."""
    out = m14_caption_conflicts(spark, sf_smoke).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_captions >= 2
        assert not r.canonical_caption.endswith(" (repost)")
        assert r.n_noncanonical >= 1
        assert r.n_images > r.n_noncanonical  # the original stays
