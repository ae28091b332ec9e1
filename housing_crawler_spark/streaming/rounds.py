"""Structured Streaming facade over the engine's event semantics.

The reference is a hand-rolled single-threaded micro-batch loop
(SURVEY §2.9; crawl_wggesucht.py:497-549). The crawl engine proper keeps
the deterministic driver-side round loop (rounds are the checkpoint and
parity unit — see crawl.py), but the *analytics* stream over fetch
events maps naturally onto Structured Streaming: this module provides
the windowed-aggregation and sessionization plans used both in batch
(over the fetch_log / events tables) and as ``readStream`` queries.

The same plan builders run in both modes — pass a batch DataFrame or a
streaming one; only the sink differs (test_streaming.py drives the
streaming path through a memory sink with processAllAvailable)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with late-data
    tolerance. In streaming mode the watermark bounds state; in batch
    mode it is a no-op on correctness."""
    # parquet may surface TIMESTAMP_NTZ; watermarks require TIMESTAMP
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Per-user session windows (gap-based). Streaming uses the native
    ``session_window``; the same call works in batch."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, gap) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
