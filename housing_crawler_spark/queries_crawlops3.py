"""Crawl-tier scheduling/dedup operators, family 3 (round 6, session 5).

Four more published web-crawl shapes the reference executes implicitly
(it crawls ONE portal forever with a hand-tuned loop,
housing_crawler/crawl_wggesucht.py:186-189,545-548) but that become
first-class batch jobs at a 10^10-URL frontier:

- **c8_mirror_host_detection** — content-based mirror detection
  (Bharat & Broder, WWW 1999 "Mirror, mirror on the Web"; Cho,
  Shivakumar & Garcia-Molina, VLDB 2000 "Finding replicated Web
  collections"): two hosts are mirrors when the Jaccard similarity of
  their served-IMAGE fingerprint sets is high. This is the crawl-tier
  × image-payload joint op: the fingerprint is the image phash/content
  hash the fetch stage already materializes (input_hint column
  `phash`), so mirror election needs no second decode pass. Planted
  full mirrors (m00-m02 copy h00-h02's sets) and one partial mirror
  (p03 = half of h03) exercise both verdicts; organic hosts share
  images only through the bounded ≤4-host replication of each content.

- **c9_sitemap_reconcile** — sitemaps.org declared-URL reconciliation:
  FULL OUTER join of the sitemap (url, lastmod, priority) against the
  fetch log, classifying every URL as fresh / stale (fetched before
  lastmod) / never_fetched / undeclared, rolled up per host with the
  priority-weighted refetch backlog. The reference hardcodes its
  listing pages and never consults a sitemap; a production crawler
  reconciles every round.

- **c10_crawl_budget_apportion** — global page-budget apportionment
  across hosts by the largest-remainder (Hamilton) method: integer
  floor quotas from host weight, the L leftover pages going to the L
  largest remainders. All arithmetic is exact BIGINT so sum(alloc) ==
  budget EXACTLY (pinned by test_crawlops3) and both engines agree
  bit-for-bit. The remainder ranking is a global sort of |hosts| rows;
  at a real 10^7-host universe that global top-L runs through the same
  salted two-phase top-B machinery as w1 (operators/frontier.py:45) —
  here hosts are constant-sized, so one window suffices.

- **c11_spider_trap_detection** — depth-explosion trap flagging (the
  guard every production crawler ships — cf. Heritrix's path-depth
  caps): per (host, depth) URL counts, a lagged growth flag
  (count_d * 4 >= count_{d-1} * 5, i.e. growth >= 1.25x, integer
  cross-multiplication — the DETECTOR is forgiving because planted
  trap mass grows >= 1.5x nominally while organic mass DECAYS, so
  1.25x sits between the populations and survives small-count draw
  noise), and gaps-and-islands over consecutive flagged depths; a
  host whose longest growth run >= 3 is a trap (calendar pages,
  session-id explosions). Planted trap hosts draw depths from an
  inverted mass function so the flag is exercised both ways
  (sf0.01: trap runs 4-5 vs organic max 2; sf0.1: 7 vs 1).

Scale notes: c8 is one DISTINCT + one fp-keyed self-join + one pair
agg — the ubiquity cap (fingerprints on > _C8_UBIQ_CAP hosts are
dropped BEFORE pairing, the Broder shingle trick) bounds the pair
fanout per fingerprint to CAP^2 regardless of how many hosts share a
site-wide logo; c9 is a single full-outer equi-join on the uniform URL
key; c10 is two aggs + one |hosts|-row window; c11 is one groupBy +
two host-partitioned windows. No cartesian products, no driver loops,
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import load, query, r4
from .queries_ml import _md5int_sql, md5int

# ---------------------------------------------------------------------------
# c8 — mirror-host detection via shared image fingerprints
# ---------------------------------------------------------------------------

_C8_HOSTS = 19  # prime, so k%19 spreads contents across hosts
_C8_REPL = 4  # each image content is served by <= 4 organic hosts
_C8_FULL_MIRRORS = 3  # m00..m02 mirror h00..h02 completely
_C8_UBIQ_CAP = 12  # drop fingerprints on more hosts than this (logos)
_C8_MIN_SHARED = 5  # pair support floor


def _c8_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → distinct (host, img_fp) served-image sets with planted
    mirrors. Content id = k // 4 (fixed <=4-host replication at every
    sf); fingerprint = md5 of the content id — the stand-in for the
    phash the fetch stage materializes."""
    k = F.col("p_partkey")
    hn = (k % _C8_HOSTS).cast("long")
    c = (k / _C8_REPL).cast("long")
    base = load(spark, sf_dir, "part").select(
        hn.alias("hn"),
        c.alias("c"),
        md5int(F.concat(F.lit("img:"), c.cast("string"))).alias("img_fp"),
    )
    h2 = F.lpad(F.col("hn").cast("string"), 2, "0")
    organic = base.select(F.concat(F.lit("h"), h2).alias("host"), "img_fp")
    full = base.filter(F.col("hn") < _C8_FULL_MIRRORS).select(
        F.concat(F.lit("m"), h2).alias("host"), "img_fp"
    )
    partial = base.filter(
        (F.col("hn") == _C8_FULL_MIRRORS) & (F.col("c") % 2 == 0)
    ).select(F.lit("p03").alias("host"), "img_fp")
    return organic.unionByName(full).unionByName(partial).distinct()


_C8_SETS_SQL = f"""
    raw AS (
      SELECT p_partkey % {_C8_HOSTS} AS hn,
             p_partkey // {_C8_REPL} AS c,
             {_md5int_sql(f"'img:' || (p_partkey // {_C8_REPL})")} AS img_fp
      FROM part
    ),
    sets AS (
      SELECT DISTINCT host, img_fp FROM (
        SELECT 'h' || lpad(hn::VARCHAR, 2, '0') AS host, img_fp FROM raw
        UNION ALL
        SELECT 'm' || lpad(hn::VARCHAR, 2, '0') AS host, img_fp
        FROM raw WHERE hn < {_C8_FULL_MIRRORS}
        UNION ALL
        SELECT 'p03' AS host, img_fp
        FROM raw WHERE hn = {_C8_FULL_MIRRORS} AND c % 2 = 0
      )
    )
"""


@query(
    "c8_mirror_host_detection",
    oracle=f"""
    WITH {_C8_SETS_SQL},
    kept AS (
      SELECT host, img_fp FROM (
        SELECT host, img_fp,
               count(*) OVER (PARTITION BY img_fp) AS n_hosts
        FROM sets
      ) WHERE n_hosts <= {_C8_UBIQ_CAP}
    ),
    sizes AS (SELECT host, count(*)::BIGINT AS n FROM kept GROUP BY host),
    shared AS (
      SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS n_shared
      FROM kept a JOIN kept b ON a.img_fp = b.img_fp AND a.host < b.host
      GROUP BY a.host, b.host
    )
    SELECT host_a, host_b, n_shared,
           sa.n AS n_a, sb.n AS n_b,
           round(n_shared::DOUBLE / (sa.n + sb.n - n_shared) + 1e-9, 4) + 0.0
             AS jaccard,
           (5 * n_shared >= 4 * (sa.n + sb.n - n_shared)) AS is_mirror
    FROM shared
    JOIN sizes sa ON sa.host = host_a
    JOIN sizes sb ON sb.host = host_b
    WHERE n_shared >= {_C8_MIN_SHARED}
    """,
)
def c8_mirror_host_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard mirror detection over per-host served-image fingerprint
    sets: drop ubiquitous fingerprints (> cap hosts), self-join the
    remainder on fingerprint with host_a < host_b, and flag pairs whose
    Jaccard >= 0.8 via exact integer cross-multiplication. The planted
    m00-m02 full mirrors come out is_mirror=true, p03's half-copy
    lands near 0.5, organic pairs near 0.09."""
    sets = _c8_sets(spark, sf_dir)
    kept = (
        sets.withColumn("n_hosts", F.count("*").over(Window.partitionBy("img_fp")))
        .filter(F.col("n_hosts") <= _C8_UBIQ_CAP)
        .select("host", "img_fp")
        .cache()
    )
    sizes = kept.groupBy("host").agg(F.count("*").alias("n"))
    a = kept.alias("a")
    b = kept.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.img_fp") == F.col("b.img_fp"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _C8_MIN_SHARED)
    )
    sa = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_shared")
    return (
        shared.join(F.broadcast(sa), "host_a")
        .join(F.broadcast(sb), "host_b")
        .select(
            "host_a",
            "host_b",
            "n_shared",
            "n_a",
            "n_b",
            (r4(F.col("n_shared").cast("double") / union) + F.lit(0.0)).alias(
                "jaccard"
            ),
            (F.lit(5) * F.col("n_shared") >= F.lit(4) * union).alias("is_mirror"),
        )
    )


# ---------------------------------------------------------------------------
# c9 — sitemap reconciliation (declared vs fetched)
# ---------------------------------------------------------------------------

_C9_HOSTS = 12
_C9_DAYS = 60


@query(
    "c9_sitemap_reconcile",
    oracle=f"""
    WITH declared AS (
      SELECT p_partkey AS url_id,
             {_md5int_sql("'lm:' || p_partkey")} % {_C9_DAYS} AS lastmod_day,
             (p_partkey % 10 + 1)::BIGINT AS priority
      FROM part WHERE p_partkey % 3 <> 2
    ),
    fetched AS (
      SELECT p_partkey AS url_id,
             {_md5int_sql("'fd:' || p_partkey")} % {_C9_DAYS} AS fetch_day
      FROM part WHERE p_partkey % 4 <> 3
    ),
    merged AS (
      SELECT COALESCE(d.url_id, f.url_id) AS url_id,
             CASE
               WHEN d.url_id IS NULL THEN 'undeclared'
               WHEN f.url_id IS NULL THEN 'never_fetched'
               WHEN f.fetch_day >= d.lastmod_day THEN 'fresh'
               ELSE 'stale'
             END AS status,
             COALESCE(d.priority, 0)::BIGINT AS priority
      FROM declared d FULL OUTER JOIN fetched f ON d.url_id = f.url_id
    )
    SELECT url_id % {_C9_HOSTS} AS host, status,
           count(*)::BIGINT AS n_urls,
           sum(CASE WHEN status IN ('stale', 'never_fetched')
                    THEN priority ELSE 0 END)::BIGINT AS refetch_backlog
    FROM merged GROUP BY url_id % {_C9_HOSTS}, status
    """,
)
def c9_sitemap_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile the declared sitemap against the fetch log with one
    full-outer equi-join on the URL key, classify each URL, and roll
    up per (host, status) with the priority-weighted refetch backlog
    (stale + never_fetched carry their sitemap priority)."""
    k = F.col("p_partkey")
    part = load(spark, sf_dir, "part")
    declared = part.filter(k % 3 != 2).select(
        k.alias("url_id"),
        (F.pmod(md5int(F.concat(F.lit("lm:"), k.cast("string"))), F.lit(_C9_DAYS))).alias(
            "lastmod_day"
        ),
        (k % 10 + 1).cast("long").alias("priority"),
    )
    fetched = part.filter(k % 4 != 3).select(
        k.alias("url_id"),
        (F.pmod(md5int(F.concat(F.lit("fd:"), k.cast("string"))), F.lit(_C9_DAYS))).alias(
            "fetch_day"
        ),
    )
    merged = declared.join(fetched, "url_id", "full").select(
        F.col("url_id"),
        F.when(F.col("lastmod_day").isNull(), F.lit("undeclared"))
        .when(F.col("fetch_day").isNull(), F.lit("never_fetched"))
        .when(F.col("fetch_day") >= F.col("lastmod_day"), F.lit("fresh"))
        .otherwise(F.lit("stale"))
        .alias("status"),
        F.coalesce(F.col("priority"), F.lit(0)).cast("long").alias("priority"),
    )
    backlog = F.sum(
        F.when(F.col("status").isin("stale", "never_fetched"), F.col("priority")).otherwise(
            F.lit(0)
        )
    ).cast("long")
    return merged.groupBy(
        (F.col("url_id") % _C9_HOSTS).alias("host"), "status"
    ).agg(F.count("*").alias("n_urls"), backlog.alias("refetch_backlog"))


# ---------------------------------------------------------------------------
# c10 — largest-remainder crawl-budget apportionment
# ---------------------------------------------------------------------------

_C10_HOSTS = 50
_C10_BUDGET = 10_000


@query(
    "c10_crawl_budget_apportion",
    oracle=f"""
    WITH w AS (
      SELECT o_custkey % {_C10_HOSTS} AS host, count(*)::BIGINT AS weight
      FROM orders GROUP BY o_custkey % {_C10_HOSTS}
    ),
    q AS (
      SELECT host, weight,
             ({_C10_BUDGET} * weight) // (SELECT sum(weight) FROM w) AS q0,
             ({_C10_BUDGET} * weight) % (SELECT sum(weight) FROM w) AS rem
      FROM w
    ),
    r AS (
      SELECT host, weight, q0, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, host) AS rk,
             (SELECT {_C10_BUDGET} - sum(q0) FROM q) AS leftover
      FROM q
    )
    SELECT host, weight, q0::BIGINT AS floor_quota, rem::BIGINT AS remainder,
           (q0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT AS alloc
    FROM r
    """,
)
def c10_crawl_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a global page budget across hosts by weight with the
    largest-remainder method, entirely in BIGINT: floor quotas via
    truncating division, the leftover pages to the largest remainders
    (ties broken by host id). sum(alloc) == budget exactly. The
    |hosts|-row global window is constant-sized here; a 10^7-host
    universe routes the top-L through the salted two-phase machinery
    (see module docstring)."""
    w = (
        load(spark, sf_dir, "orders")
        .groupBy((F.col("o_custkey") % _C10_HOSTS).alias("host"))
        .agg(F.count("*").alias("weight"))
    )
    tot = w.agg(
        F.sum("weight").cast("long").alias("W")
    )
    q = (
        w.join(F.broadcast(tot))
        .select(
            "host",
            "weight",
            F.expr(f"({_C10_BUDGET} * weight) DIV W").alias("q0"),
            F.pmod(F.lit(_C10_BUDGET) * F.col("weight"), F.col("W")).alias("rem"),
        )
        .cache()  # feeds the leftover agg AND the ranked window
    )
    lo = q.agg((F.lit(_C10_BUDGET) - F.sum("q0")).cast("long").alias("leftover"))
    # pmod(host,1)==0 but is non-foldable, so the single-partition spec
    # survives optimization (lit(1) is constant-folded away and trips
    # the WindowExec no-partition warning); |hosts| rows, bounded
    win = Window.partitionBy(F.pmod(F.col("host"), F.lit(1))).orderBy(
        F.col("rem").desc(), F.col("host")
    )
    return (
        q.withColumn("rk", F.row_number().over(win))
        .join(F.broadcast(lo))
        .select(
            "host",
            "weight",
            F.col("q0").cast("long").alias("floor_quota"),
            F.col("rem").cast("long").alias("remainder"),
            (
                F.col("q0")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )


# ---------------------------------------------------------------------------
# c11 — spider-trap detection (depth-explosion flags)
# ---------------------------------------------------------------------------

_C11_HOSTS = 10
# cumulative permille-style thresholds over md5 % 100 draws:
# organic mass decays with depth; trap mass grows >= 1.5x per depth
_C11_ORGANIC = [40, 65, 80, 90, 95, 97, 99, 100]
_C11_TRAP = [1, 3, 6, 11, 19, 31, 51, 100]
_C11_MIN_COUNT = 4  # growth flags need count_d >= this (noise floor)
_C11_MIN_RUN = 3  # trap verdict: >= 3 consecutive growing depths


def _c11_depth_case(thresholds: list[int], u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {d}" for d, t in enumerate(thresholds[:-1])
    )
    return f"CASE {arms} ELSE {len(thresholds) - 1} END"


@query(
    "c11_spider_trap_detection",
    oracle=f"""
    WITH draws AS (
      SELECT p_partkey % {_C11_HOSTS} AS host,
             (p_partkey % {_C11_HOSTS}) % 5 = 3 AS is_planted,
             {_md5int_sql("'d:' || p_partkey")} % 100 AS u
      FROM part
    ),
    urls AS (
      SELECT host,
             CASE WHEN is_planted
                  THEN {_c11_depth_case(_C11_TRAP, "u")}
                  ELSE {_c11_depth_case(_C11_ORGANIC, "u")} END AS depth
      FROM draws
    ),
    counts AS (
      SELECT host, depth, count(*)::BIGINT AS n
      FROM urls GROUP BY host, depth
    ),
    flagged AS (
      SELECT host, depth, n,
             (lag(n) OVER (PARTITION BY host ORDER BY depth) IS NOT NULL
              AND depth - lag(depth) OVER (PARTITION BY host ORDER BY depth) = 1
              AND n >= {_C11_MIN_COUNT}
              AND 4 * n >= 5 * lag(n) OVER (PARTITION BY host ORDER BY depth))
               AS grows
      FROM counts
    ),
    runs AS (
      SELECT host, depth, n, grows,
             depth - ROW_NUMBER() OVER (PARTITION BY host, grows ORDER BY depth)
               AS run_id
      FROM flagged
    ),
    stats AS (
      SELECT host, sum(n)::BIGINT AS n_urls, max(depth)::BIGINT AS max_depth
      FROM counts GROUP BY host
    ),
    best AS (
      SELECT host, max(run_len)::BIGINT AS max_growth_run FROM (
        SELECT host, run_id, count(*)::BIGINT AS run_len
        FROM runs WHERE grows GROUP BY host, run_id
      ) GROUP BY host
    )
    SELECT s.host, n_urls, max_depth,
           COALESCE(max_growth_run, 0)::BIGINT AS max_growth_run,
           COALESCE(max_growth_run, 0) >= {_C11_MIN_RUN} AS is_trap
    FROM stats s LEFT JOIN best b ON b.host = s.host
    """,
)
def c11_spider_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag hosts whose per-depth URL counts GROW for >= 3 consecutive
    depths (>= 1.25x detector, integer cross-multiplication, with a
    count-noise floor — see module docstring for the 1.25-vs-1.5
    separation argument): per (host, depth) counts, a lagged growth
    flag, and gaps-and-islands over flagged depths. Planted trap hosts
    draw depth from an inverted mass function (host % 5 == 3); organic
    hosts decay with depth and never accumulate a 3-run."""
    k = F.col("p_partkey")
    host = (k % _C11_HOSTS).cast("long")
    u = F.pmod(md5int(F.concat(F.lit("d:"), k.cast("string"))), F.lit(100))
    draws = load(spark, sf_dir, "part").select(
        host.alias("host"),
        (host % 5 == 3).alias("is_planted"),
        u.alias("u"),
    )

    def depth_case(thresholds: list[int]):
        expr = F.lit(len(thresholds) - 1)
        for d in range(len(thresholds) - 2, -1, -1):
            expr = F.when(F.col("u") < thresholds[d], F.lit(d)).otherwise(expr)
        return expr

    urls = draws.select(
        "host",
        F.when(F.col("is_planted"), depth_case(_C11_TRAP))
        .otherwise(depth_case(_C11_ORGANIC))
        .alias("depth"),
    )
    # feeds both the growth-flag window chain and the per-host stats agg
    counts = urls.groupBy("host", "depth").agg(F.count("*").alias("n")).cache()
    byd = Window.partitionBy("host").orderBy("depth")
    flagged = counts.select(
        "host",
        "depth",
        "n",
        (
            F.lag("n").over(byd).isNotNull()
            & (F.col("depth") - F.lag("depth").over(byd) == 1)
            & (F.col("n") >= _C11_MIN_COUNT)
            & (F.lit(4) * F.col("n") >= F.lit(5) * F.lag("n").over(byd))
        ).alias("grows"),
    )
    runw = Window.partitionBy("host", "grows").orderBy("depth")
    runs = flagged.withColumn("run_id", F.col("depth") - F.row_number().over(runw))
    best = (
        runs.filter(F.col("grows"))
        .groupBy("host", "run_id")
        .agg(F.count("*").alias("run_len"))
        .groupBy("host")
        .agg(F.max("run_len").cast("long").alias("max_growth_run"))
    )
    stats = counts.groupBy("host").agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.max("depth").cast("long").alias("max_depth"),
    )
    return stats.join(best, "host", "left").select(
        "host",
        "n_urls",
        "max_depth",
        F.coalesce(F.col("max_growth_run"), F.lit(0)).cast("long").alias(
            "max_growth_run"
        ),
        (F.coalesce(F.col("max_growth_run"), F.lit(0)) >= _C11_MIN_RUN).alias(
            "is_trap"
        ),
    )


# ---------------------------------------------------------------------------
# c12 — shard-skew audit: hash sharding before/after hot-host salting
# ---------------------------------------------------------------------------
# The skew playbook made queryable: frontier traffic hash-sharded by
# host pools behind hot hosts (3 planted hosts carry ~60% of rows);
# the audit computes per-shard load under plain hash(host) sharding,
# then re-shards after SALTING every host too heavy for one shard
# (weight * S > total; lighter hosts stay put at n_salts = 1):
# n_salts = min(2 * ceil(weight * S / total), S) — the 2x headroom
# keeps each piece well under one shard's mean load — placed
# ROUND-ROBIN at (shard0 + j) % S (hashing the salts instead leaves
# birthday collisions between hot pieces: measured 3.12x max/mean vs
# 1.39x round-robin on the same weights). Each salt carries an exact
# integer share w DIV n + (1 if j < w % n), so salted loads sum to
# the original weight EXACTLY. Unsalted hosts keep their original
# shard — real salting never reshuffles the cold tail. This is the
# same mechanism the crawl engine applies to its frontier top-B
# selection (operators/frontier.py) and the banded dedup joins apply
# via bucket caps; here it is a first-class dual-oracled audit so the
# imbalance numbers themselves are driver-checked (sf0.01: max/mean
# 6.91 before, 1.39 after).

_C12_SHARDS = 32
_C12_HOT = 3  # planted hot hosts sharing ~60% of traffic
_C12_COLD = 500


def _c12_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = md5int(F.concat(F.lit("t:"), F.col("o_orderkey").cast("string")))
    host = F.when(
        F.pmod(u, F.lit(100)) < 60,
        F.concat(F.lit("hot"), F.pmod(u, F.lit(_C12_HOT)).cast("string")),
    ).otherwise(
        F.concat(F.lit("c"), F.pmod(u, F.lit(_C12_COLD)).cast("string"))
    )
    return (
        load(spark, sf_dir, "orders")
        .select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("w"))
    )


_C12_U = _md5int_sql("'t:' || o_orderkey")
_C12_WEIGHTS_SQL = f"""
    weights AS (
      SELECT CASE WHEN {_C12_U} % 100 < 60
                  THEN 'hot' || ({_C12_U} % {_C12_HOT})
                  ELSE 'c' || ({_C12_U} % {_C12_COLD}) END AS host,
             count(*)::BIGINT AS w
      FROM orders GROUP BY 1
    )
"""


@query(
    "c12_shard_skew_audit",
    oracle=f"""
    WITH {_C12_WEIGHTS_SQL},
    tot AS (SELECT sum(w)::BIGINT AS t FROM weights),
    salted AS (
      SELECT host, w,
             (CASE WHEN w * {_C12_SHARDS} > t
                   THEN least(2 * ((w * {_C12_SHARDS} + t - 1) // t),
                              {_C12_SHARDS})
                   ELSE 1 END)::BIGINT AS n_salts,
             {_md5int_sql("'s:' || host")} % {_C12_SHARDS} AS shard0
      FROM weights CROSS JOIN tot
    ),
    pieces AS (
      SELECT host, shard0, n_salts,
             unnest(generate_series(0, n_salts - 1)) AS j,
             w // n_salts AS base, w % n_salts AS extra
      FROM salted
    ),
    after_rows AS (
      SELECT (shard0 + j) % {_C12_SHARDS} AS shard,
             (base + CASE WHEN j < extra THEN 1 ELSE 0 END)::BIGINT AS piece
      FROM pieces
    ),
    before_load AS (
      SELECT shard0 AS shard, sum(w)::BIGINT AS load_before
      FROM salted GROUP BY shard0
    ),
    after_load AS (
      SELECT shard, sum(piece)::BIGINT AS load_after
      FROM after_rows GROUP BY shard
    )
    SELECT COALESCE(b.shard, a.shard) AS shard,
           COALESCE(load_before, 0)::BIGINT AS load_before,
           COALESCE(load_after, 0)::BIGINT AS load_after
    FROM before_load b FULL OUTER JOIN after_load a ON a.shard = b.shard
    """,
)
def c12_shard_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard load under hash(host) sharding vs after exact-share
    salting of hosts too heavy for one shard. Integer shares conserve
    every host's weight; unsalted hosts keep their original shard."""
    weights = _c12_weights(spark, sf_dir)
    tot = weights.agg(F.sum("w").cast("long").alias("t"))
    salted = (
        weights.join(F.broadcast(tot))
        .select(
            "host",
            "w",
            F.when(
                F.col("w") * _C12_SHARDS > F.col("t"),
                F.least(
                    F.lit(2).cast("long")
                    * F.expr(f"(w * {_C12_SHARDS} + t - 1) DIV t"),
                    F.lit(_C12_SHARDS).cast("long"),
                ),
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("n_salts"),
            F.pmod(
                md5int(F.concat(F.lit("s:"), F.col("host"))), F.lit(_C12_SHARDS)
            ).alias("shard0"),
        )
        .cache()  # feeds the before-load agg AND the salted explode
    )
    pieces = salted.select(
        "host",
        "shard0",
        "n_salts",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_salts") - 1)).alias(
            "j"
        ),
        F.expr("w DIV n_salts").alias("base"),
        F.pmod(F.col("w"), F.col("n_salts")).alias("extra"),
    )
    after_rows = pieces.select(
        F.pmod(F.col("shard0") + F.col("j"), F.lit(_C12_SHARDS)).alias("shard"),
        (
            F.col("base")
            + F.when(F.col("j") < F.col("extra"), 1).otherwise(0)
        )
        .cast("long")
        .alias("piece"),
    )
    before = salted.groupBy(F.col("shard0").alias("shard")).agg(
        F.sum("w").cast("long").alias("load_before")
    )
    after = after_rows.groupBy("shard").agg(
        F.sum("piece").cast("long").alias("load_after")
    )
    return (
        before.join(after, "shard", "full")
        .select(
            "shard",
            F.coalesce(F.col("load_before"), F.lit(0)).cast("long").alias(
                "load_before"
            ),
            F.coalesce(F.col("load_after"), F.lit(0)).cast("long").alias(
                "load_after"
            ),
        )
    )


# ---------------------------------------------------------------------------
# c13 — KMV distinct-cardinality sketch (frontier size estimation)
# ---------------------------------------------------------------------------
# Estimating per-host frontier cardinality WITHOUT a full distinct is
# the k-minimum-values sketch (Bar-Yossef et al., RANDOM 2002; Beyer
# et al., SIGMOD 2007): keep the k smallest hash values per host; the
# estimator is (k-1) * H / h_(k), with H the hash space size. Unlike
# HLL (whose implementations differ engine to engine and cannot be
# oracled), KMV is PURE integer arithmetic over the portable 60-bit
# md5 hash, so Spark and DuckDB produce bit-identical estimates. The
# audit emits the exact distinct count next to the estimate plus the
# signed relative error; hosts with fewer than k distinct values take
# the sketch-is-exact branch (the estimate IS the set size).
#
# Scale shape: one distinct on (host, h) then one per-host window for
# the k-th order statistic — at 10^10 URLs the sketch itself is
# mergeable state of k int64s per host (the engine-side shape; here
# the window form keeps the query dual-oracled); the exact count
# exists only because this is the AUDIT of the estimator.
#
# Hash space is the 60-bit md5 truncated to 52 bits (2^60/2^52 is an
# integer power so the modulo stays uniform): (k-1) * 2^60 overflows
# BIGINT (Spark ANSI throws), while (k-1) * 2^52 = 2.8e17 fits with
# headroom, keeping the whole estimator in exact 64-bit arithmetic.

_C13_HOSTS = 40
_C13_K = 64
_C13_SPACE = 1 << 52
# every 1553rd orderkey routes to a planted SPARSE host (~38 distinct
# at sf0.01 < k), so the sketch-is-exact branch is exercised at the
# driver gate's sf, not only at sf0.001
_C13_SPARSE_MOD = 1553
_C13_SPARSE_HOST = 999


@query(
    "c13_kmv_cardinality",
    oracle=f"""
    WITH obs AS (
      SELECT CASE WHEN l_orderkey % {_C13_SPARSE_MOD} = 0
                  THEN {_C13_SPARSE_HOST}
                  ELSE l_orderkey % {_C13_HOSTS} END AS host,
             {_md5int_sql("'u:' || l_orderkey")} % {_C13_SPACE} AS h
      FROM lineitem
    ),
    dedup AS (SELECT DISTINCT host, h FROM obs),
    ranked AS (
      SELECT host, h,
             ROW_NUMBER() OVER (PARTITION BY host ORDER BY h) AS rn
      FROM dedup
    ),
    exact AS (
      SELECT host, count(*)::BIGINT AS n_distinct FROM dedup GROUP BY host
    ),
    kth AS (
      SELECT host, h AS h_k FROM ranked WHERE rn = {_C13_K}
    )
    SELECT e.host, n_distinct,
           COALESCE({_C13_K - 1}::BIGINT * {_C13_SPACE} // h_k,
                    n_distinct) AS kmv_estimate,
           (h_k IS NULL) AS sketch_exact,
           round((COALESCE({_C13_K - 1}::BIGINT * {_C13_SPACE} // h_k,
                           n_distinct) - n_distinct)::DOUBLE
                 / n_distinct + 1e-9, 4) + 0.0 AS rel_err
    FROM exact e LEFT JOIN kth k ON k.host = e.host
    """,
)
def c13_kmv_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-URL cardinality: the KMV estimate
    (k-1)*2^52 DIV h_(k) from the k-th smallest 52-bit hash vs the
    exact count, with signed relative error. Exact integer arithmetic
    end-to-end, so both engines agree bit-for-bit; hosts with < k
    distinct hashes report the sketch-is-exact branch."""
    obs = load(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_orderkey") % _C13_SPARSE_MOD == 0, F.lit(_C13_SPARSE_HOST)
        )
        .otherwise(F.col("l_orderkey") % _C13_HOSTS)
        .cast("long")
        .alias("host"),
        F.pmod(
            md5int(F.concat(F.lit("u:"), F.col("l_orderkey").cast("string"))),
            F.lit(_C13_SPACE),
        ).alias("h"),
    )
    dedup = obs.distinct().cache()  # feeds the exact agg AND the window
    ranked = dedup.withColumn(
        "rn", F.row_number().over(Window.partitionBy("host").orderBy("h"))
    )
    exact = dedup.groupBy("host").agg(F.count("*").alias("n_distinct"))
    kth = ranked.filter(F.col("rn") == _C13_K).select(
        "host", F.col("h").alias("h_k")
    )
    est = F.expr(f"CAST({_C13_K - 1} AS BIGINT) * {_C13_SPACE} DIV h_k")
    kmv = F.coalesce(est, F.col("n_distinct"))
    return exact.join(kth, "host", "left").select(
        "host",
        "n_distinct",
        kmv.alias("kmv_estimate"),
        F.col("h_k").isNull().alias("sketch_exact"),
        (
            r4(
                (kmv - F.col("n_distinct")).cast("double")
                / F.col("n_distinct")
            )
            + F.lit(0.0)
        ).alias("rel_err"),
    )
