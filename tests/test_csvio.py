"""CSV round trip (SURVEY S1 — the reference's native format): the
raw-ads table, with its comma-bearing German labels, umlauts, and
nulls, must survive parquet → CSV → explicit-schema read losslessly."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.queries_etl_pipeline import _raw_ads_df
from housing_crawler_spark.sources.csvio import read_ads_csv, write_ads_csv


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip_lossless(spark, sf_smoke, tmp_path):
    ads = _raw_ads_df(spark, sf_smoke)
    path = str(tmp_path / "ads_csv")
    write_ads_csv(ads, path)
    back = read_ads_csv(spark, path, ads.schema)
    assert back.schema == ads.schema
    assert _rows(back) == _rows(ads)


def test_csv_roundtrip_adversarial_values(spark, tmp_path):
    """The cells that break naive CSV: embedded commas, double quotes,
    newlines-in-values are NOT in the reference's domain (its parser
    would choke too) but commas/quotes/umlauts/null-vs-empty are."""
    src = spark.createDataFrame(
        [
            (1, "Kabel, Satellit", "Düsseldorf", None),
            (2, 'he said "ok"', "", 3.5),
            (3, None, "Tübingen, Süd", -0.0),
        ],
        "id int, label string, city string, x double",
    )
    path = str(tmp_path / "adv_csv")
    write_ads_csv(src, path, coalesce=1)
    back = read_ads_csv(spark, path, src.schema)
    got = {r["id"]: r for r in back.collect()}
    assert got[1]["label"] == "Kabel, Satellit" and got[1]["x"] is None
    assert got[2]["label"] == 'he said "ok"' and got[2]["city"] == ""
    assert got[3]["label"] is None and got[3]["city"] == "Tübingen, Süd"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The documented 10^10 upgrade path for the known-set anti-join
    (crawl.py compaction note): hash-bucketed tables joined on the
    bucket key need NO shuffle on either side. Plan-level proof that
    the co-located join the design relies on actually materializes."""
    # warehouse.dir is a static conf (session already running) — the
    # tables land in the session warehouse and are dropped in finally
    n_buckets = 8
    left = spark.range(0, 10_000).select(
        F.col("id").alias("url_hash"), (F.col("id") % 97).alias("payload")
    )
    right = spark.range(0, 2_000).select(
        (F.col("id") * 5).alias("url_hash"), F.lit(1).alias("seen")
    )
    for name, df in (("t_known_b", left), ("t_links_b", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, "url_hash")
            .sortBy("url_hash")
            .format("parquet")
            .saveAsTable(name)
        )
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_links_b").join(
            spark.table("t_known_b"), "url_hash", "left_anti"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 2_000 - len({i * 5 for i in range(2_000) if i * 5 < 10_000})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        for name in ("t_known_b", "t_links_b"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
