"""Structured Streaming: the same plan builders produce identical results
in streaming (memory sink, processAllAvailable) and batch mode."""

from __future__ import annotations

from housing_crawler_spark.streaming.rounds import sessionize, windowed_event_counts


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_windowed_counts_stream_equals_batch(spark, sf_smoke, tmp_path):
    import shutil

    src_dir = tmp_path / "events_stream"
    src_dir.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", src_dir / "events.parquet")

    batch = spark.read.parquet(f"{sf_smoke}/events.parquet")
    expected = _canon(windowed_event_counts(batch).collect())

    stream = spark.readStream.schema(batch.schema).parquet(str(src_dir))
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = _canon(spark.sql("SELECT * FROM win_counts").collect())
    finally:
        q.stop()
    assert got == expected and len(got) > 0


def test_sessionize_batch(spark, sf_smoke):
    batch = spark.read.parquet(f"{sf_smoke}/events.parquet")
    sess = sessionize(batch, gap="30 minutes").collect()
    assert len(sess) > 0
    for r in sess:
        assert r["sess_end"] >= r["sess_start"]
        assert r["n_events"] >= 1
