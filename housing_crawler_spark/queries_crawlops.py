"""Crawl-scheduler semantics as gate-checked queries (round 6).

Two surfaces the engine executes every round but that until now were
verified only by engine parity tests (test_crawl_parity), not by the
driver's independent DuckDB oracle:

- **c3_politeness_schedule** — the north_rule's "per-host politeness-
  bucketed priority queue re-expressed as DataFrame window-over-host
  ranking": the ENGINE's ``with_budgets`` + ``select_round``
  (operators/frontier.py), deliberately driven through the SALTED
  two-phase exact-top-B path (a planted hot host holds ~40% of the
  candidates and ``salt_threshold`` is set below its size), checked
  against a plain one-window ``row_number ... QUALIFY rank <= budget``
  oracle. The two-phase prune is exact by construction (any global
  top-B row is in its salt's local top-B), so the oracle needs no
  knowledge of the salting — which is the point: skew handling must be
  invisible in the result.

- **m14_caption_conflicts** — the complement of m8's audit. m8 flags
  same-CAPTION groups whose pixels diverge; m14 flags same-IMAGE
  (identical phash — crawl re-posts serve byte-identical photos)
  groups whose captions diverge, and picks the canonical caption by
  first-seen (min image_id) — the caption-reconciliation op a crawler
  needs when the same listing photo reappears under edited ad text
  (reference re-crawls the same ads each run and keeps one row per ad,
  crawl_wggesucht.py:186-189; this is that rule lifted to the image
  axis). Conflicts are planted deterministically (a ~1/7 hash-selected
  subset of images is re-emitted with a " (repost)" caption), so the
  audit columns are exercised, not vacuously empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .matpaths import mat_path as _mat_path
from .operators.frontier import select_round, with_budgets
from .queries import load, query

# ---------------------------------------------------------------------------
# c3 — politeness schedule: budgets + salted exact top-B per host
# ---------------------------------------------------------------------------

# Below the planted hot host's candidate count at every test SF
# (sf0.001 orders ≈ 1.5k rows → hot host ≈ 600 > 500), so the salted
# two-phase path engages even in the smoke suite.
_C3_SALT_THRESHOLD = 500
_C3_ROUND_SECONDS = 60


def _c3_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → synthetic frontier candidates with one hot host (~40%
    of rows) and a total priority order per host."""
    k = F.col("o_orderkey")
    host = F.when(k % 10 < 4, F.lit("hot.example")).otherwise(
        F.concat(F.lit("host-"), (k % 13).cast("string"))
    )
    return load(spark, sf_dir, "orders").select(
        host.alias("host"),
        (k % 3).cast("int").alias("depth"),
        (k % 7).cast("int").alias("listing_page_no"),
        (k % 5).cast("int").alias("card_idx"),
        F.concat(F.lit("https://"), host, F.lit("/ad/"), k.cast("string")).alias(
            "canonical_url"
        ),
    )


@query(
    "c3_politeness_schedule",
    oracle=f"""
    WITH cand AS (
      SELECT CASE WHEN o_orderkey % 10 < 4 THEN 'hot.example'
                  ELSE 'host-' || (o_orderkey % 13)::VARCHAR END AS host,
             (o_orderkey % 3)::INT AS depth,
             (o_orderkey % 7)::INT AS listing_page_no,
             (o_orderkey % 5)::INT AS card_idx,
             'https://' ||
             (CASE WHEN o_orderkey % 10 < 4 THEN 'hot.example'
                   ELSE 'host-' || (o_orderkey % 13)::VARCHAR END) ||
             '/ad/' || o_orderkey::VARCHAR AS canonical_url
      FROM orders
    ),
    budgets AS (
      SELECT DISTINCT host,
             greatest(1, {_C3_ROUND_SECONDS} // (1 + length(host) % 3)) AS budget
      FROM cand
    ),
    ranked AS (
      SELECT c.host, c.canonical_url, b.budget,
             row_number() OVER (
               PARTITION BY c.host
               ORDER BY c.depth, c.listing_page_no, c.card_idx,
                        c.canonical_url) AS rank
      FROM cand c JOIN budgets b USING (host)
    )
    SELECT host, canonical_url, rank FROM ranked WHERE rank <= budget
    """,
)
def c3_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's politeness-budgeted frontier selection, forced down
    the salted two-phase exact-top-B path (hot host > _C3_SALT_THRESHOLD
    candidates, ``frontier_size_hint=None`` forces the counting pass),
    vs a plain single-window QUALIFY oracle. Budgets come from the
    engine's ``with_budgets`` on a synthetic robots dim
    (crawl_delay_s = 1 + len(host) % 3 → budgets 60/30/20)."""
    cand = _c3_candidates(spark, sf_dir)
    robots = cand.select("host").distinct().withColumn(
        "crawl_delay_s", F.lit(1) + F.length("host") % 3
    )
    budgets = with_budgets(robots, _C3_ROUND_SECONDS)
    sel = select_round(
        cand, budgets, salt_threshold=_C3_SALT_THRESHOLD, frontier_size_hint=None
    )
    return sel.select("host", "canonical_url", "rank")


# ---------------------------------------------------------------------------
# m14 — same-image / different-caption audit (caption reconciliation)
# ---------------------------------------------------------------------------

_M14_MAT = _mat_path("m14_capconf")


@query(
    "m14_caption_conflicts",
    oracle=f"""
    WITH t AS (
      SELECT image_id, caption, phash
      FROM read_parquet('{_M14_MAT}/*.parquet')
    ),
    canon AS (
      SELECT phash, min_by(caption, image_id) AS canonical_caption
      FROM t GROUP BY phash
    )
    SELECT t.phash,
           count(*)::BIGINT AS n_images,
           count(DISTINCT t.caption)::BIGINT AS n_captions,
           min(c.canonical_caption) AS canonical_caption,
           sum(CASE WHEN t.caption <> c.canonical_caption THEN 1 ELSE 0
               END)::BIGINT AS n_noncanonical
    FROM t JOIN canon c USING (phash)
    GROUP BY t.phash
    HAVING count(DISTINCT t.caption) >= 2
    """,
)
def m14_caption_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical images (same phash from the real Arrow decode
    stage) carrying DIFFERENT captions: per conflicted image, how many
    copies, how many distinct captions, the canonical caption
    (first-seen = min image_id), and how many rows a reconciliation
    pass would rewrite. Conflicts are planted by re-emitting a
    hash-selected ~1/7 of images under a " (repost)" caption — pure
    column exprs over the already-decoded table, no second codec pass.
    Linear star-to-representative shape (one agg + one equi-join back),
    never within-group all-pairs — same scale posture as m8."""
    from .queries_multimodal import _image_table

    base = _image_table(spark, sf_dir).select("image_id", "caption", "phash")
    planted = (
        base.filter(F.pmod(F.xxhash64("image_id"), F.lit(7)) == 3)
        .select(
            F.concat("image_id", F.lit("~re")).alias("image_id"),
            F.concat("caption", F.lit(" (repost)")).alias("caption"),
            "phash",
        )
    )
    base.unionByName(planted).write.mode("overwrite").parquet(_M14_MAT)
    t = spark.read.parquet(_M14_MAT)
    canon = t.groupBy("phash").agg(
        F.min_by("caption", "image_id").alias("canonical_caption")
    )
    j = t.join(canon, "phash")
    return (
        j.groupBy("phash")
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("caption").alias("n_captions"),
            F.min("canonical_caption").alias("canonical_caption"),
            F.sum(
                F.when(F.col("caption") != F.col("canonical_caption"), 1).otherwise(0)
            ).alias("n_noncanonical"),
        )
        .filter(F.col("n_captions") >= 2)
    )
