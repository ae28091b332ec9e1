"""Remaining SURVEY §2 operator families as verified queries: the
reference's dashboard statistics (A-series), time bucketing (W2/W3),
the grid spatial join (J3), plausibility filters (F6), and the engine's
URL canonicalization cross-checked against an independent SQL oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.urls import canonicalize_url
from .queries import load, query

# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_count_per_group",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus, o_orderpriority
    """,
)
def a1_count_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count per (status, priority) — the reference's ads-per-region bars
    (SURVEY A1; app.py:191,209)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "a5_multi_agg_sorted",
    oracle="""
    SELECT c_nationkey, round((avg(c_acctbal)) + 1e-9, 4) AS mean_bal, count(*) AS n
    FROM customer GROUP BY c_nationkey
    ORDER BY mean_bal DESC, c_nationkey
    """,
)
def a5_multi_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate dict + sort desc (SURVEY A5; app.py:586-588)."""
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.round((F.avg("c_acctbal")) + F.lit(1e-9), 4).alias("mean_bal"), F.count("*").alias("n"))
        .orderBy(F.desc("mean_bal"), "c_nationkey")
    )


@query(
    "a9_standardize",
    oracle="""
    SELECT c_custkey,
           round(((c_acctbal - (SELECT avg(c_acctbal) FROM customer))
                 / (SELECT stddev_samp(c_acctbal) FROM customer)) + 1e-9, 4) AS z
    FROM customer
    """,
)
def a9_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global standardization (x−μ)/σ (SURVEY A9; utils.py:970-976):
    one tiny aggregate broadcast against the table — not a window over
    an unpartitioned frame (which would funnel everything through one
    task)."""
    c = load(spark, sf_dir, "customer")
    stats = c.agg(
        F.avg("c_acctbal").alias("mu"), F.stddev_samp("c_acctbal").alias("sigma")
    )
    return c.crossJoin(F.broadcast(stats)).select(
        "c_custkey",
        F.round(((F.col("c_acctbal") - F.col("mu")) / F.col("sigma")) + F.lit(1e-9), 4).alias("z"),
    )


@query(
    "a11_threshold_bands",
    oracle="""
    SELECT l_returnflag,
           round((avg(CASE WHEN abs(l_extendedprice - grp_mean) <= 1000 THEN 1 ELSE 0 END)) + 1e-9, 4) AS within_1000,
           round((avg(CASE WHEN abs(l_extendedprice - grp_mean) <= 5000 THEN 1 ELSE 0 END)) + 1e-9, 4) AS within_5000,
           round((avg(CASE WHEN abs(l_extendedprice - grp_mean) <= 20000 THEN 1 ELSE 0 END)) + 1e-9, 4) AS within_20000
    FROM (
      SELECT l_returnflag, l_extendedprice,
             avg(l_extendedprice) OVER (PARTITION BY l_returnflag) AS grp_mean
      FROM lineitem
    )
    GROUP BY l_returnflag
    """,
)
def a11_threshold_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-banded residual fractions via conditional aggregation
    (SURVEY A11 + J6 — the reference's index-aligned merge of per-band
    counts, app.py:449-514, collapses into avg(when(...)) so the join
    disappears)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    li = li.withColumn("grp_mean", F.avg("l_extendedprice").over(w))
    resid = F.abs(F.col("l_extendedprice") - F.col("grp_mean"))
    return li.groupBy("l_returnflag").agg(
        *[
            F.round((F.avg(F.when(resid <= t, 1).otherwise(0))) + F.lit(1e-9), 4).alias(f"within_{t}")
            for t in (1000, 5000, 20000)
        ]
    )


@query(
    "a12_ttest_ingredients",
    oracle="""
    SELECT n1, n2, round((m1) + 1e-9, 4) AS mean_r, round((m2) + 1e-9, 4) AS mean_other,
           round(((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) + 1e-9, 4) AS t_stat
    FROM (
      SELECT count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n1,
             count(CASE WHEN l_returnflag != 'R' THEN 1 END) AS n2,
             avg(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS m1,
             avg(CASE WHEN l_returnflag != 'R' THEN l_quantity END) AS m2,
             var_samp(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS v1,
             var_samp(CASE WHEN l_returnflag != 'R' THEN l_quantity END) AS v2
      FROM lineitem
    )
    """,
)
def a12_ttest_ingredients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t-statistic from one conditional-aggregation pass (SURVEY
    A12; the reference calls scipy.ttest_ind, app.py:966-979 — here the
    statistic is a closed-form expression over n/mean/var per side)."""
    li = load(spark, sf_dir, "lineitem")
    is_r = F.col("l_returnflag") == "R"
    agg = li.agg(
        F.count(F.when(is_r, 1)).alias("n1"),
        F.count(F.when(~is_r, 1)).alias("n2"),
        F.avg(F.when(is_r, F.col("l_quantity"))).alias("m1"),
        F.avg(F.when(~is_r, F.col("l_quantity"))).alias("m2"),
        F.var_samp(F.when(is_r, F.col("l_quantity"))).alias("v1"),
        F.var_samp(F.when(~is_r, F.col("l_quantity"))).alias("v2"),
    )
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    )
    return agg.select(
        "n1",
        "n2",
        F.round(F.col("m1") + F.lit(1e-9), 4).alias("mean_r"),
        F.round(F.col("m2") + F.lit(1e-9), 4).alias("mean_other"),
        F.round((t) + F.lit(1e-9), 4).alias("t_stat"),
    )


@query(
    "a13_ols_slope",
    oracle="""
    SELECT round((sum(l_quantity * l_extendedprice) / sum(l_quantity * l_quantity)) + 1e-9, 4)
           AS slope
    FROM lineitem
    """,
)
def a13_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS-through-origin slope Σxy/Σx² as a pure aggregate (SURVEY A13;
    app.py:1013-1018)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.round((F.sum(F.col("l_quantity") * F.col("l_extendedprice"))
            / F.sum(F.col("l_quantity") * F.col("l_quantity"))) + F.lit(1e-9), 4).alias("slope")
    )


@query(
    "a14_latest_complete_week",
    oracle="""
    SELECT wk, n FROM (
      SELECT wk, n, dense_rank() OVER (ORDER BY wk DESC) AS rk
      FROM (SELECT weekofyear(ts) AS wk, count(*) AS n FROM events GROUP BY 1)
    ) WHERE rk = 2
    """,
)
def a14_latest_complete_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-but-one ISO week (SURVEY A14/W3; the reference's
    sorted(set(week))[-2] for "last complete week",
    train_model_weeks.py:46)."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(F.weekofyear("ts").alias("wk")).agg(F.count("*").alias("n"))
    w = Window.partitionBy(F.lit(1)).orderBy(F.desc("wk"))  # |weeks| rows
    return (
        weekly.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") == 2)
        .select("wk", "n")
    )


@query(
    "a15_percentile_of_value",
    oracle="""
    SELECT o_orderpriority,
           round((avg(CASE WHEN o_totalprice < 150000 THEN 1 ELSE 0 END)) + 1e-9, 4)
           AS frac_cheaper,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def a15_percentile_of_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-of-probe-value per scope (SURVEY A15; the reference's
    'your ad is cheaper than X% of the city', app.py:939-957)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round((F.avg(F.when(F.col("o_totalprice") < 150000, 1).otherwise(0))) + F.lit(1e-9), 4).alias(
            "frac_cheaper"
        ),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.5 time bucketing
# ---------------------------------------------------------------------------


@query(
    "w2_time_bucket",
    oracle="""
    SELECT (date_diff('day', DATE '2024-01-01', ts) // 3) AS bucket_3d,
           count(*) AS n, round((avg(value)) + 1e-9, 4) AS mean_value
    FROM events GROUP BY 1
    """,
)
def w2_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-origin 3-day time buckets (SURVEY W2; the reference's
    last-grid-date-≤-published_on assignment, app.py:288-293)."""
    ev = load(spark, sf_dir, "events")
    bucket = F.floor(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")) / 3
    )
    return ev.groupBy(bucket.alias("bucket_3d")).agg(
        F.count("*").alias("n"), F.round((F.avg("value")) + F.lit(1e-9), 4).alias("mean_value")
    )


# ---------------------------------------------------------------------------
# §2.3 grid spatial join + §2.2 plausibility filter
# ---------------------------------------------------------------------------


@query(
    "j3_grid_spatial_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 100) / 10.0        AS lat,
             ((c_custkey // 100) % 100) / 10.0 AS lon
      FROM customer
    ),
    grid AS (
      SELECT (s_suppkey % 10) AS cell_lat, ((s_suppkey * 7) % 10) AS cell_lon,
             count(*) AS n_features, CAST(sum(s_suppkey) AS BIGINT) AS feat_sum
      FROM supplier GROUP BY 1, 2
    )
    SELECT p.c_custkey,
           CAST(floor(p.lat) AS BIGINT) AS cell_lat,
           CAST(floor(p.lon) AS BIGINT) AS cell_lon,
           g.n_features, g.feat_sum
    FROM pts p LEFT JOIN grid g
      ON CAST(floor(p.lat) AS BIGINT) = g.cell_lat
     AND CAST(floor(p.lon) AS BIGINT) = g.cell_lon
    """,
)
def j3_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-cell spatial join as a derived-grid-key equi join against
    a broadcast cell table (SURVEY J3; the reference's gpd.sjoin of ads ×
    200 m grid, ads_table_processing.py:659-671 — cells are axis-aligned
    so floor-key equality replaces geometry, no Sedona needed)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 100) / 10.0).alias("lat"),
        (((F.col("c_custkey") / 100).cast("long") % 100) / 10.0).alias("lon"),
    )
    s = load(spark, sf_dir, "supplier")
    grid = s.groupBy(
        (F.col("s_suppkey") % 10).alias("cell_lat"),
        ((F.col("s_suppkey") * 7) % 10).alias("cell_lon"),
    ).agg(F.count("*").alias("n_features"), F.sum("s_suppkey").alias("feat_sum"))
    pts = c.select(
        "c_custkey", F.floor("lat").alias("cell_lat"), F.floor("lon").alias("cell_lon")
    )
    return pts.join(F.broadcast(grid), ["cell_lat", "cell_lon"], "left").select(
        "c_custkey", "cell_lat", "cell_lon", "n_features", "feat_sum"
    )


@query(
    "f6_plausibility_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE length(p_name) BETWEEN 6 AND 40
      AND p_size BETWEEN 5 AND 45
      AND p_brand NOT IN ('Brand#0', 'Brand#99')
      AND p_type LIKE '%E%'
      AND NOT starts_with(p_name, 'test')
    """,
)
def f6_plausibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plausibility predicates: length window, isin-blacklist, LIKE,
    prefix (SURVEY F6; the reference's zip-code sanity rules,
    app.py:194-196)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.length("p_name").between(6, 40)
        & F.col("p_size").between(5, 45)
        & ~F.col("p_brand").isin("Brand#0", "Brand#99")
        & F.col("p_type").like("%E%")
        & ~F.col("p_name").startswith("test")
    ).select("p_partkey", "p_name", "p_brand", "p_size")


# ---------------------------------------------------------------------------
# Engine URL canonicalization vs an independent SQL oracle
# ---------------------------------------------------------------------------

_DIRTY_URL_SQL = """
      SELECT p_partkey,
             CASE p_partkey % 4
               WHEN 0 THEN 'HTTPS://HOST-' || lpad((p_partkey % 20)::VARCHAR, 4, '0')
                         || '.EXAMPLE/ad/' || p_partkey || '?utm_source=x&page=2'
               WHEN 1 THEN 'https://host-' || lpad((p_partkey % 20)::VARCHAR, 4, '0')
                         || '.example/ad/' || p_partkey || '/'
               WHEN 2 THEN 'https://host-' || lpad((p_partkey % 20)::VARCHAR, 4, '0')
                         || '.example:443/ad/' || p_partkey || '#frag'
               ELSE 'https://host-' || lpad((p_partkey % 20)::VARCHAR, 4, '0')
                         || '.example/ad/' || p_partkey || '?b=2&a=1&ref=z'
             END AS url
      FROM part
"""


@query(
    "c1_canonicalize_urls",
    oracle=f"""
    WITH raw AS ({_DIRTY_URL_SQL}),
    parts AS (
      SELECT p_partkey,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
             regexp_extract(regexp_replace(url, '#.*$', ''),
                            '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1) AS path,
             CASE WHEN contains(regexp_replace(url, '#.*$', ''), '?')
                  THEN regexp_extract(regexp_replace(url, '#.*$', ''), '\\?(.*)$', 1)
             END AS qs
      FROM raw
    )
    SELECT p_partkey,
           scheme || '://' ||
           (CASE WHEN scheme = 'https' AND ends_with(hostport, ':443')
                 THEN regexp_replace(hostport, ':443$', '')
                 WHEN scheme = 'http' AND ends_with(hostport, ':80')
                 THEN regexp_replace(hostport, ':80$', '')
                 ELSE hostport END) ||
           (CASE WHEN path = '' THEN '/'
                 WHEN length(path) > 1 AND ends_with(path, '/')
                 THEN regexp_replace(path, '/$', '')
                 ELSE path END) ||
           (CASE WHEN qs IS NOT NULL AND len(list_filter(string_split(qs, '&'),
                     p -> length(p) > 0 AND NOT starts_with(p, 'utm_')
                          AND NOT starts_with(p, 'ref=')
                          AND NOT starts_with(p, 'fbclid=')
                          AND NOT starts_with(p, 'gclid=')
                          AND NOT starts_with(p, 'asset_id='))) > 0
                 THEN '?' || array_to_string(list_sort(list_filter(string_split(qs, '&'),
                     p -> length(p) > 0 AND NOT starts_with(p, 'utm_')
                          AND NOT starts_with(p, 'ref=')
                          AND NOT starts_with(p, 'fbclid=')
                          AND NOT starts_with(p, 'gclid=')
                          AND NOT starts_with(p, 'asset_id='))), '&')
                 ELSE '' END) AS canonical_url
    FROM parts
    """,
)
def c1_canonicalize_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's URL canonicalization (functions/urls.py — the seen-set
    key of the whole crawl) cross-checked against an independently written
    DuckDB implementation of the same spec."""
    p = load(spark, sf_dir, "part").select("p_partkey")
    host = F.lpad((F.col("p_partkey") % 20).cast("string"), 4, "0")
    k = F.col("p_partkey")
    url = (
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("HTTPS://HOST-"), host, F.lit(".EXAMPLE/ad/"), k, F.lit("?utm_source=x&page=2")
            ),
        )
        .when(
            k % 4 == 1,
            F.concat(F.lit("https://host-"), host, F.lit(".example/ad/"), k, F.lit("/")),
        )
        .when(
            k % 4 == 2,
            F.concat(
                F.lit("https://host-"), host, F.lit(".example:443/ad/"), k, F.lit("#frag")
            ),
        )
        .otherwise(
            F.concat(F.lit("https://host-"), host, F.lit(".example/ad/"), k, F.lit("?b=2&a=1&ref=z"))
        )
    )
    return p.select("p_partkey", canonicalize_url(url).alias("canonical_url"))
