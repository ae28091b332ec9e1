"""Query registry: the engine's analytic query surface.

Every operator family from SURVEY.md §2 (the reference's operator
inventory, cited by file:line in each docstring) is re-expressed here as
a *native* Spark DataFrame plan over the driver-provided testdata tables
(region nation customer supplier part orders lineitem events documents
embeddings). Each entry carries an ANSI-SQL oracle that DuckDB executes
on the same parquet files; the pair must agree on row count, schema
(column names) and an order-insensitive value hash.

Conventions that make the oracle comparison exact:
- every float-valued output column is rounded on BOTH sides through the
  ``r4``/``rsum2`` helpers, which add a tiny epsilon before rounding.
  The epsilon matters: Spark rounds doubles via BigDecimal of the
  shortest decimal string while DuckDB rounds the binary value, so a
  value that is a decimal midpoint (x.xxxx5 — common when inputs have
  2 decimals) flips direction between engines. Shifting both by
  +1e-9 (≫ engine FP noise, ≪ the rounding quantum) makes the
  decision identical; big SUMs round at 2 decimals with a relative
  epsilon since their FP noise scales with magnitude;
- every SUM over integers is cast to BIGINT in SQL (DuckDB widens to
  HUGEINT, Spark stays long);
- every computed column is aliased identically on both sides;
- session timezone is pinned to UTC (see session.py).

No per-row Python anywhere in this module — pure Catalyst plans.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def r4(c) -> "F.Column":
    """Cross-engine-stable 4-decimal rounding (see module docstring).
    SQL twin: round(X + 1e-9, 4)."""
    return F.round(c + F.lit(1e-9), 4)


def _rsum4(c) -> "F.Column":
    """Cross-engine-stable rounding for large SUMs (relative epsilon —
    FP noise of a big sum scales with its magnitude, so the shift must
    too). SQL twin: round(X + abs(X) * 1e-11 + 1e-9, 4)."""
    return F.round(c + F.abs(c) * F.lit(1e-11) + F.lit(1e-9), 4)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle)

        @functools.wraps(fn)
        def wrapper(*a, **k):
            return fn(*a, **k)

        return wrapper

    return deco


# ---------------------------------------------------------------------------
# Flagship / TPC-H-style plans (the reference's dashboard groupbys at scale)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity) + abs(sum(l_quantity)) * 1e-11 + 1e-9, 4)
             AS sum_qty,
           round(sum(l_extendedprice) + abs(sum(l_extendedprice)) * 1e-11 + 1e-9, 4)
             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount))
                 + abs(sum(l_extendedprice * (1 - l_discount))) * 1e-11 + 1e-9, 4)
             AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 + abs(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 1e-11 + 1e-9, 4)
             AS sum_charge,
           round((avg(l_quantity)) + 1e-9, 4)                                        AS avg_qty,
           round((avg(l_extendedprice)) + 1e-9, 4)                                   AS avg_price,
           round((avg(l_discount)) + 1e-9, 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: multi-aggregate groupBy (SURVEY §2.4 A5/A6 pattern; the
    reference's dashboard price-ranking groupbys, app.py:586-588,652-666).
    Single shuffle on the grouping keys with map-side partial aggregation;
    the shipdate filter and 5-column projection push down to the parquet
    scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _rsum4(F.sum("l_quantity")).alias("sum_qty"),
            _rsum4(F.sum("l_extendedprice")).alias("sum_base_price"),
            _rsum4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_price"),
            _rsum4(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            F.round((F.avg("l_quantity")) + F.lit(1e-9), 4).alias("avg_qty"),
            F.round((F.avg("l_extendedprice")) + F.lit(1e-9), 4).alias("avg_price"),
            F.round((F.avg("l_discount")) + F.lit(1e-9), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o.o_orderkey,
           round((sum(l.l_extendedprice * (1 - l.l_discount))) + abs(sum(l.l_extendedprice * (1 - l.l_discount))) * 1e-11 + 1e-9, 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join → agg → top-k (SURVEY §2.3 J4 + §2.6 O1/O4). customer is the
    small dimension: broadcast it so only the fact tables shuffle."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "inner")),
            li.l_orderkey == o.o_orderkey,
            "inner",
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _rsum4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount))
                 + abs(sum(l.l_extendedprice * (1 - l.l_discount))) * 1e-11 + 1e-9, 4)
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join with dims broadcast; only the two fact
    tables shuffle (on their join keys)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey))
        .join(
            F.broadcast(dims),
            (li.l_suppkey == dims.s_suppkey) & (c.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            _rsum4(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount)
                 + abs(sum(l_extendedprice * l_discount)) * 1e-11 + 1e-9, 4)
             AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches
    the parquet scan, no shuffle beyond the final single-row reduce."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _rsum4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "f2_equality_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, round((o_totalprice) + 1e-9, 4) AS o_totalprice_r
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def f2_equality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter + narrow projection (SURVEY F1/F2; reference
    crawl_wggesucht.py:177, app.py:143-145). Both the predicate and the
    3-column projection reach the parquet scan (PushedFilters/ReadSchema)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") + F.lit(1e-9), 4).alias("o_totalprice_r"),
        )
    )


@query(
    "f3_date_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 23:59:59'
    """,
)
def f3_date_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-window filter (SURVEY F3; app.py:147-170 filter_original_data).
    At scale this predicate is the partition-pruning key on a
    month-partitioned table."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 23:59:59").cast("timestamp"),
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "f4_sanity_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           round((l_quantity) + 1e-9, 4) AS qty, round((l_extendedprice) + 1e-9, 4) AS price
    FROM lineitem
    WHERE CASE
            WHEN l_returnflag = 'R' THEN l_quantity BETWEEN 5 AND 45
                                         AND l_extendedprice BETWEEN 1000 AND 80000
            ELSE l_quantity BETWEEN 1 AND 50
                 AND l_extendedprice BETWEEN 900 AND 95000
          END
    """,
)
def f4_sanity_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category sanity windows (SURVEY F4; the reference's per-offer-type
    price/size 'keep' rules, ads_table_processing.py:260-281) as one
    branching predicate — a single codegen'd filter, no UDF."""
    li = load(spark, sf_dir, "lineitem")
    keep = F.when(
        F.col("l_returnflag") == "R",
        F.col("l_quantity").between(5, 45) & F.col("l_extendedprice").between(1000, 80000),
    ).otherwise(
        F.col("l_quantity").between(1, 50) & F.col("l_extendedprice").between(900, 95000)
    )
    return li.filter(keep).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.col("l_quantity") + F.lit(1e-9), 4).alias("qty"),
        F.round(F.col("l_extendedprice") + F.lit(1e-9), 4).alias("price"),
    )


@query(
    "f7_min_support_filter",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT event_id, user_id, event_type,
             count(*) OVER (PARTITION BY user_id) AS n_user
      FROM events
    ) WHERE n_user >= 5
    """,
)
def f7_min_support_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-support filter (SURVEY F7; app.py:199-206 value_counts+isin):
    keep rows whose group has >= k members, as a windowed count — one
    shuffle, no self-join."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("n_user", F.count("*").over(w))
        .filter(F.col("n_user") >= 5)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "f9_fraction_cap_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((l_discount / nullif(l_tax, 0)) + 1e-9, 4) AS ratio
    FROM lineitem
    WHERE (l_discount / nullif(l_tax, 0)) <= 0.7
       OR (l_discount / nullif(l_tax, 0)) IS NULL
    """,
)
def f9_fraction_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-cap filter keeping nulls (SURVEY F9;
    ads_table_processing.py:626-628 room/flat-size fraction rule)."""
    li = load(spark, sf_dir, "lineitem")
    ratio = F.col("l_discount") / F.nullif(F.col("l_tax"), F.lit(0))
    return li.filter((ratio <= 0.7) | ratio.isNull()).select(
        "l_orderkey", "l_linenumber", F.round((ratio) + F.lit(1e-9), 4).alias("ratio")
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@query(
    "j1_seen_anti_join",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0
    )
    """,
)
def j1_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — the crawl-correctness seen-set membership test (SURVEY
    J1/F10; reference linear-scan membership crawl_wggesucht.py:297-299).
    The 'seen' side is broadcast when small; at 10^10 scale the engine
    shards it behind a bloom pre-filter (operators/frontier.py) with this
    exact anti-join as the correctness backstop."""
    o = load(spark, sf_dir, "orders")
    seen = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select("c_custkey")
    return o.join(
        F.broadcast(seen), o.o_custkey == seen.c_custkey, "left_anti"
    ).select("o_orderkey", "o_custkey")


@query(
    "j4_chained_left_join",
    oracle="""
    SELECT n.n_name, r.r_name, count(c.c_custkey) AS n_customers,
           round((avg(c.c_acctbal)) + 1e-9, 4) AS avg_bal
    FROM nation n
    LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, r.r_name
    ORDER BY n.n_name
    """,
)
def j4_chained_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained left equi-joins on dimension keys (SURVEY J4;
    app.py:677-680). Both dims broadcast — zero shuffles for the joins,
    one for the aggregation."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    c = load(spark, sf_dir, "customer")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name", "r_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round((F.avg("c_acctbal")) + F.lit(1e-9), 4).alias("avg_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "j5_stat_merge",
    oracle="""
    SELECT c_nationkey,
           round((avg(c_acctbal)) + 1e-9, 4)         AS mean_bal,
           round((stddev_samp(c_acctbal)) + 1e-9, 4) AS std_bal,
           count(*)                          AS n
    FROM customer GROUP BY c_nationkey
    """,
)
def j5_stat_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mean ⋈ std ⋈ count collapsed into ONE aggregation (SURVEY J5;
    the reference does three separate groupbys then two merges,
    app.py:652-666 — the join disappears in a columnar plan)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.round((F.avg("c_acctbal")) + F.lit(1e-9), 4).alias("mean_bal"),
        F.round((F.stddev_samp("c_acctbal")) + F.lit(1e-9), 4).alias("std_bal"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@query(
    "a3_daily_total_grand_mean",
    oracle="""
    SELECT round((avg(n_day)) + 1e-9, 4) AS mean_daily_events
    FROM (
      SELECT date_trunc('day', ts) AS d, count(*) AS n_day
      FROM events GROUP BY 1
    )
    """,
)
def a3_daily_total_grand_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation: per-day counts then grand mean (SURVEY A2/A3;
    app.py:345-348)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("n_day")
    )
    return daily.agg(F.round((F.avg("n_day")) + F.lit(1e-9), 4).alias("mean_daily_events"))


@query(
    "a7_hour_grid",
    oracle="""
    SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def a7_hour_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day-of-week × hour) count grid (SURVEY A7; the reference's polar
    publication-hour chart, app.py:517). Spark dayofweek is 1=Sunday;
    DuckDB's is 0=Sunday, hence the +1 in the oracle."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hr")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# §2.5 Window functions
# ---------------------------------------------------------------------------


@query(
    "w1_priority_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey, rn
    FROM (
      SELECT l_orderkey, l_linenumber, l_suppkey,
             row_number() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 20
    """,
)
def w1_priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number over (partition, total order) — the shape of the crawl
    frontier's per-host priority queue (SURVEY W1; the reference's
    city→page→DOM-card nested loop order, crawl_wggesucht.py:538-543,262,
    282-285). Total tie-break keys make it deterministic under
    parallelism."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "rn")
    )


@query(
    "w5_first_seen_dedup",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey
    FROM (
      SELECT l_orderkey, l_linenumber, l_partkey,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def w5_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-wins dedup (SURVEY W5/J2; the reference's
    drop_duplicates(keep='first') upsert, crawl_wggesucht.py:186-189) as a
    rank-1 window — the distributed form of the crawler's monthly-CSV
    merge. The ordering key covers every output column so the surviving
    row is deterministic under parallelism even when (orderkey,
    linenumber) has duplicates."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


# ---------------------------------------------------------------------------
# §2.6 / §2.7 Sorts, top-k, set ops
# ---------------------------------------------------------------------------


@query(
    "o1_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round((c_acctbal) + 1e-9, 4) AS bal
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 3
    """,
)
def o1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (SURVEY O1/O4; app.py:210 head(25) pattern) via
    window rank — partial top-k runs map-side before the shuffle."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", F.round(F.col("c_acctbal") + F.lit(1e-9), 4).alias("bal"))
    )


@query(
    "u1_union_reconcile",
    oracle="""
    SELECT s_suppkey AS entity_key, s_name AS entity_name,
           round((s_acctbal) + 1e-9, 4) AS bal, 'supplier' AS side
    FROM supplier
    UNION ALL
    SELECT c_custkey AS entity_key, c_name AS entity_name,
           NULL AS bal, 'customer' AS side
    FROM customer
    """,
)
def u1_union_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union with schema reconciliation — missing columns null-filled
    (SURVEY U1/U2; the reference's NaN-fill concat,
    crawl_wggesucht.py:180-185) via unionByName(allowMissingColumns)."""
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.round(F.col("s_acctbal") + F.lit(1e-9), 4).alias("bal"),
        F.lit("supplier").alias("side"),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("long").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("side"),
    )
    return s.unionByName(c, allowMissingColumns=True)
