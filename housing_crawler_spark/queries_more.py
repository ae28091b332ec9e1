"""Long-tail SURVEY §2 inventory: the remaining small operator shapes
(O2, U3, A4, A10, W4, F5, S8-as-join, rollup, exact percentiles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import load, query


@query(
    "o2_latest_by_key",
    oracle="""
    SELECT event_id, ts FROM events ORDER BY ts DESC, event_id LIMIT 1
    """,
)
def o2_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-by-sorted-key (SURVEY O2; the reference picks the newest
    model by sorted filename, utils.py:1032-1036)."""
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), "event_id")
        .limit(1)
        .select("event_id", "ts")
    )


@query(
    "u3_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (SURVEY U3; app.py:916 removes the probe ad)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o).distinct()


@query(
    "a4_mean_per_time_bucket",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           round((avg(value)) + 1e-9, 4) AS mean_value, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def a4_mean_per_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per (time bucket, category) (SURVEY A4; the price-evolution
    line, app.py:303,310)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.round((F.avg("value")) + F.lit(1e-9), 4).alias("mean_value"), F.count("*").alias("n"))


@query(
    "a10_rowwise_mean",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(((l_quantity + l_discount * 100 + l_tax * 100) / 3) + 1e-9, 4)
           AS rowwise_mean
    FROM lineitem
    """,
)
def a10_rowwise_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise mean across columns (SURVEY A10; mean(axis=1) of
    per-type prices, app.py:684) — plain column arithmetic, no
    aggregation at all."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(((F.col("l_quantity") + F.col("l_discount") * 100 + F.col("l_tax") * 100)
            / 3) + F.lit(1e-9), 4).alias("rowwise_mean"),
    )


@query(
    "w4_rank_groups_by_mean",
    oracle="""
    SELECT c_mktsegment, mean_bal,
           rank() OVER (ORDER BY mean_bal DESC) AS seg_rank
    FROM (
      SELECT c_mktsegment, round((avg(c_acctbal)) + 1e-9, 4) AS mean_bal
      FROM customer GROUP BY c_mktsegment
    )
    """,
)
def w4_rank_groups_by_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups ordered/ranked by their aggregate mean (SURVEY W4;
    boxplot factor ordering, app.py:586-594)."""
    c = load(spark, sf_dir, "customer")
    agg = c.groupBy("c_mktsegment").agg(
        F.round((F.avg("c_acctbal")) + F.lit(1e-9), 4).alias("mean_bal")
    )
    return agg.withColumn(
        "seg_rank",
        F.rank().over(Window.partitionBy(F.lit(1)).orderBy(F.desc("mean_bal"))),
    )  # |segments| rows


@query(
    "f5_bbox_null_outside",
    oracle="""
    SELECT c_custkey,
           CASE WHEN ((c_custkey % 100) / 10.0) BETWEEN 2.0 AND 8.0
                THEN (c_custkey % 100) / 10.0 END AS lat_valid,
           CASE WHEN (((c_custkey // 100) % 100) / 10.0) BETWEEN 1.0 AND 9.0
                THEN ((c_custkey // 100) % 100) / 10.0 END AS lon_valid
    FROM customer
    """,
)
def f5_bbox_null_outside(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding-box validation: out-of-box coordinates become NULL, rows
    are kept (SURVEY F5; the Germany bbox rule,
    ads_table_processing.py:352-356)."""
    c = load(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 100) / 10.0
    lon = ((F.col("c_custkey") / 100).cast("long") % 100) / 10.0
    return c.select(
        "c_custkey",
        F.when(lat.between(2.0, 8.0), lat).alias("lat_valid"),
        F.when(lon.between(1.0, 9.0), lon).alias("lon_valid"),
    )


@query(
    "g1_geocode_fallback_join",
    oracle="""
    SELECT c.c_custkey,
           coalesce(g.lat, 0.0) AS lat, coalesce(g.lon, 0.0) AS lon,
           (g.lat IS NULL) AS geocode_failed
    FROM customer c
    LEFT JOIN (
      SELECT n_nationkey, round((n_nationkey * 3.7) + 1e-9, 4) AS lat,
             round((n_nationkey * 7.1) + 1e-9, 4) AS lon
      FROM nation WHERE n_nationkey % 5 != 0
    ) g ON c.c_nationkey = g.n_nationkey
    """,
)
def g1_geocode_fallback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocoding as a precomputed dim-table broadcast join with the
    reference's (0,0) failure sentinel (SURVEY S8;
    geocoding_addresses.py:27-115 — live Nominatim + 900 s backoff
    becomes a lookup join; misses keep the sentinel)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 5 != 0)
    geo = n.select(
        "n_nationkey",
        F.round((F.col("n_nationkey") * 3.7) + F.lit(1e-9), 4).alias("lat"),
        F.round((F.col("n_nationkey") * 7.1) + F.lit(1e-9), 4).alias("lon"),
    )
    return c.join(F.broadcast(geo), c.c_nationkey == geo.n_nationkey, "left").select(
        "c_custkey",
        F.coalesce("lat", F.lit(0.0)).alias("lat"),
        F.coalesce("lon", F.lit(0.0)).alias("lon"),
        F.col("lat").isNull().alias("geocode_failed"),
    )


@query(
    "r1_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice) + abs(sum(o_totalprice)) * 1e-11 + 1e-9, 4) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def r1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP consolidation of the reference's separate per-level
    groupbys (SURVEY §2.4 note: city+type and zip+type charts are
    separate groupbys — one rollup computes all levels in one pass)."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum("o_totalprice")
            + F.abs(F.sum("o_totalprice")) * F.lit(1e-11)
            + F.lit(1e-9),
            4,
        ).alias("total"),
    )


@query(
    "p1_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           round((quantile_cont(l_extendedprice, 0.5)) + 1e-9, 4) AS p50,
           round((quantile_cont(l_extendedprice, 0.9)) + 1e-9, 4) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def p1_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (the analytics layer's
    distribution summaries; Spark `percentile` == DuckDB
    `quantile_cont`)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round((F.percentile("l_extendedprice", F.lit(0.5))) + F.lit(1e-9), 4).alias("p50"),
        F.round((F.percentile("l_extendedprice", F.lit(0.9))) + F.lit(1e-9), 4).alias("p90"),
    )


# synthetic robots.txt blobs (same construction both engines): the *
# block carries host-dependent Disallow/Crawl-delay; a decoy agent
# block before it must NOT be picked up
_ROBOTS_TXT_SQL = """
      SELECT concat('host-', s_suppkey, '.example') AS host,
             concat(
               'User-agent: badbot', chr(10), 'Disallow: /', chr(10), chr(10),
               'User-agent: *', chr(10),
               CASE WHEN s_suppkey % 3 = 0
                    THEN concat('Disallow: /private', chr(10))
                    ELSE '' END,
               CASE WHEN s_suppkey % 2 = 0
                    THEN concat('Crawl-delay: ', 3 + s_suppkey % 7, chr(10))
                    ELSE '' END,
               'Allow: /'
             ) AS robots_txt
      FROM supplier
"""


@query(
    "c2_robots_parse",
    oracle=f"""
    WITH r AS ({_ROBOTS_TXT_SQL}),
    blk AS (
      SELECT host,
             regexp_extract(robots_txt,
               '(?s)User-agent: \\*\\n(.*?)(\\nUser-agent:|$)', 1) AS b
      FROM r
    )
    SELECT host,
           regexp_extract(b, 'Disallow: *([^\\n]*)', 1) AS disallow_prefix,
           coalesce(CAST(nullif(regexp_extract(b, 'Crawl-delay: *([0-9]+)', 1), '') AS INT), 1)
             AS crawl_delay_s
    FROM blk
    """,
)
def c2_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt TEXT → per-host gate rules (functions/robots.py):
    extract the `User-agent: *` block (skipping decoy agent blocks),
    its first Disallow prefix and Crawl-delay — all regexp exprs, the
    exact rows operators/frontier.robots_gate + with_budgets consume."""
    from .functions.robots import parse_robots

    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    nl = F.lit("\n")
    txt = F.concat(
        F.lit("User-agent: badbot\nDisallow: /\n\n"),
        F.lit("User-agent: *"), nl,
        F.when(k % 3 == 0, F.concat(F.lit("Disallow: /private"), nl)).otherwise(""),
        F.when(k % 2 == 0, F.concat(F.lit("Crawl-delay: "), (3 + k % 7).cast("string"), nl)).otherwise(""),
        F.lit("Allow: /"),
    )
    raw = s.select(
        F.concat(F.lit("host-"), k.cast("string"), F.lit(".example")).alias("host"),
        txt.alias("robots_txt"),
    )
    return parse_robots(raw)
