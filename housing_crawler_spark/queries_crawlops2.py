"""Crawl-tier scheduling/dedup operators, family 2 (round 6).

Published web-crawl shapes the reference executes implicitly (it
re-crawls the same portal forever, crawl_wggesucht.py:186-189,545-548)
but never as explicit queryable operators — at 10^10-URL frontier
scale each becomes a first-class batch job:

- **c4_dust_param_rules** — DUST rule mining ("Do Not Crawl It Twice",
  Bar-Yossef et al., WWW 2007), specialized to the query-parameter
  case every production crawler ships: a parameter is *strippable* for
  a host when every observed URL carrying it serves byte-identical
  content to its parameter-less twin. Mined from a (url, content_fp)
  crawl log via one keyed self-join + one aggregation; the planted log
  carries both content-neutral params (utm_source/sess/ref) and
  content-RELEVANT ones (color/page), so both verdicts are exercised.

- **c5_host_pagerank** — frontier prioritization by host authority:
  3 power iterations of damped PageRank (Page et al. 1999, d=0.85)
  over the weighted host link graph. All arithmetic is exact BIGINT
  (ranks in 1e-9 units, truncating division `DIV`//`//`) so the two
  engines agree bit-for-bit regardless of aggregation order — float
  PageRank sums are order-dependent and can never hash-match across
  engines. Spark side is the iterative shape (edges cached once,
  3 join+agg rounds); the oracle unrolls the same recurrence as CTEs.

- **c6_revisit_schedule** — freshness-driven recrawl cadence (Cho &
  Garcia-Molina, TODS 2003): per-URL change rate from an observation
  log → hot/warm/cold tier → revisit interval. Tier boundaries use
  integer cross-multiplication (n_changes*4 >= n_obs), never a float
  ratio, so the engines cannot disagree at the boundary.

- **c7_url_alias_components** — the composition step after c4's rule
  mining: fp-confirmed alias PAIRS (param-strip + host mirrors) form a
  graph whose transitive closure is the alias set; canonical-URL
  election runs on the d8 machinery (operators/graph.star_components)
  against the same recursive-CTE closure oracle d8/t7 use.

- **m18_watermark_filter** — the LAION-5B watermark gate (Schuhmann
  et al. 2022) as a deterministic stand-in detector: a flat overlay
  patch in the bottom-right corner (corner variance collapses while
  global variance stays high). One Arrow decode pass materializes the
  per-image stats (the m1/m11 mat-table contract — both engines read
  the same rows); watermarked siblings are planted in-stage through a
  real encode round-trip in the image's own format, so the gate is
  exercised non-vacuously in both directions (probe: planted corner
  var <= 1.4 after dctq re-encode, organic corner var >= 64).

Scale notes: c4 is one equi-join on (host, path) + one groupBy — both
shuffle on keys that are uniform by construction; c5's per-iteration
join is edges ⋈ ranks on src (ranks is |hosts| rows — broadcast-sized
at any real host universe); c6 is a single groupBy(url_id); m18's
codec stage inherits _image_table's repartition (the round-5
single-split lesson). No windows over unbounded frames, no driver
loops over collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .matpaths import mat_path
from .queries import load, query, r4
from .queries_ml import _md5int_sql, md5int

# ---------------------------------------------------------------------------
# c4 — DUST: per-host strippable-parameter mining
# ---------------------------------------------------------------------------

_C4_HOSTS = 20
_C4_MIN_SUPPORT = 5  # a rule needs >= 5 confirming pairs (DUST §4 support)

# (param, k-condition modulus, content-neutral?) — the synthetic crawl
# log: every part key k is one page fetched both bare and under these
# parameters; neutral params serve the bare page's fingerprint,
# relevant ones serve different content.
_C4_PARAMS = [
    ("utm_source", 1, True),
    ("sess", 2, True),
    ("ref", 5, True),
    ("color", 3, False),
    ("page", 4, False),
]


def _c4_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → synthetic (host, path, param, fp) crawl-log rows."""
    k = F.col("p_partkey")
    host = F.concat(F.lit("h"), F.lpad((k % _C4_HOSTS).cast("string"), 2, "0"))
    path = F.concat(F.lit("item/"), k.cast("string"))
    fp_base = md5int(F.concat(F.lit("c:"), k.cast("string")))
    base = load(spark, sf_dir, "part").select(
        k.alias("k"), host.alias("host"), path.alias("path"), fp_base.alias("fp")
    )
    variants = []
    for param, mod, neutral in _C4_PARAMS:
        v = base if mod == 1 else base.filter(F.col("k") % mod == 0)
        fp = (
            F.col("fp")
            if neutral
            else md5int(F.concat(F.lit("c:"), F.col("k").cast("string"), F.lit(f":{param}")))
        )
        variants.append(
            v.select("host", "path", F.lit(param).alias("param"), fp.alias("fp_v"))
        )
    out = variants[0]
    for v in variants[1:]:
        out = out.unionByName(v)
    return base.select("host", "path", "fp"), out


def _c4_log_sql() -> str:
    arms = []
    for param, mod, neutral in _C4_PARAMS:
        cond = "" if mod == 1 else f"WHERE p_partkey % {mod} = 0"
        fp = (
            _md5int_sql("'c:' || p_partkey")
            if neutral
            else _md5int_sql(f"'c:' || p_partkey || ':{param}'")
        )
        arms.append(
            f"SELECT 'h' || lpad((p_partkey % {_C4_HOSTS})::VARCHAR, 2, '0') AS host, "
            f"'item/' || p_partkey AS path, '{param}' AS param, {fp} AS fp_v "
            f"FROM part {cond}"
        )
    return " UNION ALL ".join(arms)


@query(
    "c4_dust_param_rules",
    oracle=f"""
    WITH base AS (
      SELECT 'h' || lpad((p_partkey % {_C4_HOSTS})::VARCHAR, 2, '0') AS host,
             'item/' || p_partkey AS path,
             {_md5int_sql("'c:' || p_partkey")} AS fp
      FROM part
    ),
    variants AS ({_c4_log_sql()}),
    pairs AS (
      SELECT v.host, v.param, (v.fp_v = b.fp) AS same
      FROM variants v JOIN base b USING (host, path)
    )
    SELECT host, param,
           count(*)::BIGINT AS n_pairs,
           sum(CASE WHEN same THEN 1 ELSE 0 END)::BIGINT AS n_equal,
           (count(*) >= {_C4_MIN_SUPPORT}
            AND count(*) = sum(CASE WHEN same THEN 1 ELSE 0 END)) AS strippable
    FROM pairs GROUP BY host, param
    """,
)
def c4_dust_param_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine per-(host, param) strippable-parameter rules from the
    synthetic crawl log: join each parameterized URL to its bare twin
    on (host, path), compare content fingerprints, and emit the rule
    verdict with its support. The neutral params (utm_source/sess/ref)
    come out strippable wherever support clears the floor; color/page
    never do."""
    base, variants = _c4_log(spark, sf_dir)
    pairs = variants.join(base, ["host", "path"]).select(
        "host", "param", (F.col("fp_v") == F.col("fp")).alias("same")
    )
    n_equal = F.sum(F.when(F.col("same"), 1).otherwise(0)).cast("long")
    return pairs.groupBy("host", "param").agg(
        F.count("*").alias("n_pairs"),
        n_equal.alias("n_equal"),
        (
            (F.count("*") >= _C4_MIN_SUPPORT)
            & (F.count("*") == F.sum(F.when(F.col("same"), 1).otherwise(0)))
        ).alias("strippable"),
    )


# ---------------------------------------------------------------------------
# c5 — host-authority PageRank (3 exact-integer power iterations)
# ---------------------------------------------------------------------------

_C5_HOSTS = 40
_C5_SCALE = 1_000_000_000  # rank unit = 1e-9 of one page's mass
_C5_ITERS = 3
# teleport term (1-d)*SCALE with d=0.85, in exact integer units
_C5_TELEPORT = (15 * _C5_SCALE) // 100


def _c5_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → weighted host link graph. dst is hash-drawn (NOT a
    residue function of src — any polynomial in k mod H collapses to
    one dst per src class); self-loops shift to the next host so every
    src keeps outdegree >= 1 (no dangling mass)."""
    k = F.col("p_partkey")
    src = (k % _C5_HOSTS).cast("long")
    draw = F.pmod(md5int(F.concat(F.lit("edge:"), k.cast("string"))), F.lit(_C5_HOSTS))
    dst = F.when(draw == src, (draw + 1) % _C5_HOSTS).otherwise(draw).cast("long")
    ew = (
        load(spark, sf_dir, "part")
        .select(src.alias("src"), dst.alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    wout = ew.groupBy("src").agg(F.sum("w").alias("wout"))
    return ew.join(wout, "src")


@query(
    "c5_host_pagerank",
    oracle=f"""
    WITH e0 AS (
      SELECT p_partkey % {_C5_HOSTS} AS src,
             {_md5int_sql("'edge:' || p_partkey")} % {_C5_HOSTS} AS draw
      FROM part
    ),
    e1 AS (
      SELECT src,
             CASE WHEN draw = src THEN (draw + 1) % {_C5_HOSTS} ELSE draw END AS dst
      FROM e0
    ),
    ew AS (SELECT src, dst, count(*)::BIGINT AS w FROM e1 GROUP BY src, dst),
    eo AS (
      SELECT src, dst, w,
             (SELECT sum(w) FROM ew i WHERE i.src = ew.src)::BIGINT AS wout
      FROM ew
    ),
    hosts AS (SELECT DISTINCT src AS host FROM ew),
    r0 AS (SELECT host, {_C5_SCALE}::BIGINT AS r FROM hosts),
    {", ".join(
        f'''i{n} AS (
          SELECT e.dst AS host, sum((r.r * e.w) // e.wout)::BIGINT AS inflow
          FROM eo e JOIN r{n - 1} r ON r.host = e.src GROUP BY e.dst
        ),
        r{n} AS (
          SELECT h.host,
                 ({_C5_TELEPORT} + (85 * COALESCE(i.inflow, 0)) // 100)::BIGINT AS r
          FROM hosts h LEFT JOIN i{n} i USING (host)
        )''' for n in range(1, _C5_ITERS + 1)
    )}
    SELECT host, r AS pagerank_x1e9 FROM r{_C5_ITERS}
    """,
)
def c5_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 damped power iterations over the weighted host graph, ranks
    held as exact BIGINT 1e-9 units (truncating division) so the
    result is aggregation-order-independent and hash-matches the
    unrolled-CTE oracle. Edges feed every iteration — cached once."""
    edges = _c5_edges(spark, sf_dir).cache()
    ranks = edges.select(F.col("src").alias("host")).distinct().select(
        "host", F.lit(_C5_SCALE).cast("long").alias("r")
    )
    hosts = ranks.select("host")
    for _ in range(_C5_ITERS):
        inflow = (
            edges.join(ranks, edges["src"] == ranks["host"])
            .select("dst", F.expr("(r * w) DIV wout").alias("part_flow"))
            .groupBy("dst")
            .agg(F.sum("part_flow").alias("inflow"))
            .withColumnRenamed("dst", "host")
        )
        ranks = hosts.join(inflow, "host", "left").select(
            "host",
            (
                F.lit(_C5_TELEPORT)
                + F.expr("(85 * COALESCE(inflow, CAST(0 AS BIGINT))) DIV 100")
            )
            .cast("long")
            .alias("r"),
        )
    return ranks.select("host", F.col("r").alias("pagerank_x1e9"))


# ---------------------------------------------------------------------------
# c6 — freshness-driven revisit scheduling
# ---------------------------------------------------------------------------

_C6_URLS = 300
# per-URL change propensity in [5, 64] percent, hash-drawn
_C6_RATE_MD5 = _md5int_sql(f"'rate:' || (user_id % {_C6_URLS})")
_C6_RATE_SQL = f"5 + {_C6_RATE_MD5} % 60"
_C6_CHG_MD5 = _md5int_sql("'chg:' || event_id")
_C6_CHG_SQL = f"{_C6_CHG_MD5} % 100"


@query(
    "c6_revisit_schedule",
    oracle=f"""
    WITH obs AS (
      SELECT user_id % {_C6_URLS} AS url_id,
             CASE WHEN ({_C6_CHG_SQL}) < ({_C6_RATE_SQL}) THEN 1 ELSE 0 END AS changed
      FROM events
    ),
    agg AS (
      SELECT url_id, count(*)::BIGINT AS n_obs,
             sum(changed)::BIGINT AS n_changes
      FROM obs GROUP BY url_id
    )
    SELECT url_id, n_obs, n_changes,
           round(n_changes::DOUBLE / n_obs + 1e-9, 4) + 0.0 AS change_rate,
           CASE WHEN n_changes * 4 >= n_obs THEN 'hot'
                WHEN n_changes * 10 >= n_obs THEN 'warm'
                ELSE 'cold' END AS tier,
           CASE WHEN n_changes * 4 >= n_obs THEN 1
                WHEN n_changes * 10 >= n_obs THEN 4
                ELSE 16 END AS revisit_every
    FROM agg
    """,
)
def c6_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate each URL's change rate from its observation log
    (events rows = fetches; a deterministic per-fetch coin under a
    hash-drawn per-URL propensity marks 'content changed') and assign
    the Cho/Garcia-Molina revisit tier. Boundaries are integer
    cross-multiplications; only the reported change_rate is a float
    (r4-rounded, +0.0 to kill signed zero)."""
    url_id = (F.col("user_id") % _C6_URLS).alias("url_id")
    rate = F.lit(5) + F.pmod(
        md5int(F.concat(F.lit("rate:"), (F.col("user_id") % _C6_URLS).cast("string"))),
        F.lit(60),
    )
    coin = F.pmod(
        md5int(F.concat(F.lit("chg:"), F.col("event_id").cast("string"))), F.lit(100)
    )
    obs = load(spark, sf_dir, "events").select(
        url_id, F.when(coin < rate, 1).otherwise(0).alias("changed")
    )
    agg = obs.groupBy("url_id").agg(
        F.count("*").alias("n_obs"), F.sum("changed").cast("long").alias("n_changes")
    )
    hot = F.col("n_changes") * 4 >= F.col("n_obs")
    warm = F.col("n_changes") * 10 >= F.col("n_obs")
    return agg.select(
        "url_id",
        "n_obs",
        "n_changes",
        (r4(F.col("n_changes").cast("double") / F.col("n_obs")) + F.lit(0.0)).alias(
            "change_rate"
        ),
        F.when(hot, "hot").when(warm, "warm").otherwise("cold").alias("tier"),
        F.when(hot, 1).when(warm, 4).otherwise(16).alias("revisit_every"),
    )


# ---------------------------------------------------------------------------
# c7 — URL-alias components: DUST edges × mirror edges → canonical URL
# ---------------------------------------------------------------------------
# The composition step after rule mining: individual fp-confirmed alias
# PAIRS (param-strip on the main host, host mirrors, param-strip on the
# mirror) form an undirected graph whose transitive closure is the real
# alias set — a mirror's ?utm variant reaches the main bare URL only
# through a 2-hop chain, which is why a crawler needs components, not
# pairs. Canonical = lexicographic min of the component (the main bare
# URL by construction). Runs on the d8 machinery (star_components,
# O(log n) rounds); the oracle is the same recursive-CTE min-label
# closure d8/t7 use, over VARCHAR node ids.

_C7_MIRROR_MOD = 2  # pages with k % 2 = 0 also exist on mirror host 'm'+host


def _c7_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fp-confirmed alias edges (u, v): param-strip edges on the main
    host (only content-neutral params survive the fp check), the
    mirror's bare page to the main bare page, and the mirror's utm
    variant to the mirror's bare page."""
    k = F.col("p_partkey")
    host = F.concat(F.lit("h"), F.lpad((k % _C4_HOSTS).cast("string"), 2, "0"))
    log = load(spark, sf_dir, "part").select(
        k.alias("k"),
        F.concat(F.lit("https://"), host, F.lit("/item/"), k.cast("string")).alias(
            "burl"
        ),
        F.concat(
            F.lit("https://m"), host, F.lit("/item/"), k.cast("string")
        ).alias("murl"),
        md5int(F.concat(F.lit("c:"), k.cast("string"))).alias("fp"),
    )
    edges = []
    for param, mod, neutral in _C4_PARAMS:
        v = log if mod == 1 else log.filter(F.col("k") % mod == 0)
        if not neutral:
            # content-relevant params keep the fp confirm — it never
            # passes, which is the point (and the oracle's closed form)
            fp_v = md5int(
                F.concat(F.lit("c:"), F.col("k").cast("string"), F.lit(f":{param}"))
            )
            v = v.filter(fp_v == F.col("fp"))
        edges.append(
            v.select(
                F.concat(F.col("burl"), F.lit(f"?{param}=1")).alias("u"),
                F.col("burl").alias("v"),
            )
        )
    mirrored = log.filter(F.col("k") % _C7_MIRROR_MOD == 0)
    edges.append(mirrored.select(F.col("murl").alias("u"), F.col("burl").alias("v")))
    edges.append(
        mirrored.select(
            F.concat(F.col("murl"), F.lit("?utm_source=1")).alias("u"),
            F.col("murl").alias("v"),
        )
    )
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


def _c7_edges_sql() -> str:
    arms = []
    for param, mod, neutral in _C4_PARAMS:
        if neutral:
            cond = "" if mod == 1 else f"WHERE k % {mod} = 0"
            arms.append(
                f"SELECT burl || '?{param}=1' AS u, burl AS v FROM log {cond}"
            )
        # content-relevant params never fp-match: no edge arm at all —
        # the Spark side keeps the filter to PROVE it (both reduce to
        # the same edge set; the oracle states the closed form)
    arms.append(
        f"SELECT murl AS u, burl AS v FROM log WHERE k % {_C7_MIRROR_MOD} = 0"
    )
    arms.append(
        f"SELECT murl || '?utm_source=1' AS u, murl AS v FROM log "
        f"WHERE k % {_C7_MIRROR_MOD} = 0"
    )
    return " UNION ALL ".join(arms)


@query(
    "c7_url_alias_components",
    oracle=f"""
    WITH RECURSIVE log AS (
      SELECT p_partkey AS k,
             'https://h' || lpad((p_partkey % {_C4_HOSTS})::VARCHAR, 2, '0')
               || '/item/' || p_partkey AS burl,
             'https://mh' || lpad((p_partkey % {_C4_HOSTS})::VARCHAR, 2, '0')
               || '/item/' || p_partkey AS murl
      FROM part
    ),
    edges AS ({_c7_edges_sql()}),
    nodes AS (
      SELECT DISTINCT url FROM (
        SELECT u AS url FROM edges UNION ALL SELECT v FROM edges
      )
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach AS (
      SELECT url, url AS label FROM nodes
      UNION
      SELECT e.u AS url, r.label FROM reach r JOIN sym e ON e.v = r.url
    )
    SELECT url, min(label) AS canonical_url FROM reach GROUP BY url
    """,
)
def c7_url_alias_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the fp-confirmed alias pairs: every URL in
    the alias graph labeled with its component's lexicographic-min
    canonical URL (the main host's bare page). Mirror ?utm variants
    reach it only via the 2-hop chain, so this exercises real
    propagation, not star collapse."""
    from .operators.graph import star_components

    comps = star_components(_c7_edges(spark, sf_dir), a="u", b="v")
    return comps.select(F.col("node").alias("url"), F.col("component").alias("canonical_url"))


# ---------------------------------------------------------------------------
# m18 — watermark-overlay image filter (LAION gate, deterministic twin)
# ---------------------------------------------------------------------------

_M18_MAT = mat_path("m18_wm")
_M18_PATCH = 16  # overlay patch edge (bottom-right corner)
_M18_LEVEL = 200  # overlay gray level
_M18_PLANT_MOD = 16  # ~1/16 of large-enough images get a planted sibling
_M18_MIN_DIM = 48  # plant only where the patch is a corner, not the image
_M18_CORNER_MAX_X1000 = 20_000  # corner var <= 20 → overlay-flat
_M18_GLOBAL_MIN_X1000 = 200_000  # global var >= 200 → not just a flat image


@query(
    "m18_watermark_filter",
    oracle=f"""
    SELECT image_id, w, h, corner_var_x1000, global_var_x1000,
           (corner_var_x1000 <= {_M18_CORNER_MAX_X1000}
            AND global_var_x1000 >= {_M18_GLOBAL_MIN_X1000}) AS flagged
    FROM read_parquet('{_M18_MAT}/*.parquet')
    """,
)
def m18_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark gate: decode once, measure bottom-right corner
    variance vs global variance; a flat corner on a non-flat image is
    the overlay signature. Watermarked siblings ('<id>-wm') are
    planted in-stage through a real encode/decode round-trip in the
    image's own format — the detector never sees the plant flag."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir).select("image_id", "bytes", "fmt")

    def wm_batches(it):
        import numpy as np
        import pandas as pd

        from .functions.hashing import xxhash64
        from .operators.images import decode, encode

        def stats(a):
            af = a.astype(np.float64)
            h, w = a.shape
            corner = af[-_M18_PATCH:, -_M18_PATCH:]
            return (
                int(round(1000.0 * float(corner.var()))),
                int(round(1000.0 * float(af.var()))),
                w,
                h,
            )

        for pdf in it:
            out = {
                "image_id": [],
                "w": [],
                "h": [],
                "corner_var_x1000": [],
                "global_var_x1000": [],
            }

            def emit(iid, cv, gv, w, h):
                out["image_id"].append(iid)
                out["w"].append(w)
                out["h"].append(h)
                out["corner_var_x1000"].append(cv)
                out["global_var_x1000"].append(gv)

            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                img, _ = decode(bytes(buf))
                cv, gv, w, h = stats(img)
                emit(iid, cv, gv, w, h)
                big = min(img.shape) >= _M18_MIN_DIM
                if big and (xxhash64(iid) & ((1 << 63) - 1)) % _M18_PLANT_MOD == 0:
                    wm = img.copy()
                    wm[-_M18_PATCH:, -_M18_PATCH:] = _M18_LEVEL
                    wm2, _ = decode(encode(wm, fmt))
                    cv, gv, w, h = stats(wm2)
                    emit(f"{iid}-wm", cv, gv, w, h)
            yield pd.DataFrame(out)

    feats = imgs.mapInPandas(
        wm_batches,
        "image_id string, w int, h int, corner_var_x1000 long, global_var_x1000 long",
    )
    feats.write.mode("overwrite").parquet(_M18_MAT)
    mat = spark.read.parquet(_M18_MAT)
    return mat.select(
        "image_id",
        "w",
        "h",
        "corner_var_x1000",
        "global_var_x1000",
        (
            (F.col("corner_var_x1000") <= _M18_CORNER_MAX_X1000)
            & (F.col("global_var_x1000") >= _M18_GLOBAL_MIN_X1000)
        ).alias("flagged"),
    )
