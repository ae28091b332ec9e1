"""S3/S4: partitioned writes + partition-pruned reads (the reference's
{YYYYMM}_{city} filename scheme done properly)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_month_partition_pruning(spark, sf_smoke, tmp_path):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    out = str(tmp_path / "events_by_day")
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    pruned = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = pruned._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters: [isnotnull(day" in plan
    full = spark.read.parquet(out).count()
    part = pruned.count()
    assert 0 < part < full
    # pruned scan reads exactly the one partition's rows
    expected = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
        .count()
    )
    assert part == expected
