"""The pure-Python XXH64 twin must agree with Spark's F.xxhash64 —
the simulator's url_hash/image_id keys depend on it bit-for-bit.

Covers every tail-length class of the algorithm: empty, <4, exactly 4,
<8, exactly 8, <32, exactly 32, >32 bytes, plus multi-byte UTF-8 and
random strings (seeded, deterministic)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from housing_crawler_spark.functions.hashing import xxhash64


def _spark_hashes(spark, values: list[str]) -> list[int]:
    # NB: F.xxhash64 takes COLUMNS, not a seed — extra args are hashed
    # in sequence (each result seeding the next). The fixed seed is 42.
    df = spark.createDataFrame([(v,) for v in values], "s string")
    rows = df.select(F.xxhash64(F.col("s")).alias("h")).collect()
    return [r["h"] for r in rows]


def test_xxhash64_matches_spark(spark):
    rng = random.Random(0xC0FFEE)
    fixed = [
        "",
        "a",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "x" * 100,
        "https://www.wg-gesucht.de/wg-zimmer-in-Berlin.123.html?a=1",
        "über-straße-ß-ä-ö-ü",  # 2-byte UTF-8
        "日本語テキスト",  # 3-byte UTF-8
        "emoji 🏠🔑 tail",  # 4-byte UTF-8
    ]
    alphabet = "abcXYZ0189äöüß日🏠 /:?=."
    randoms = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(120)
    ]
    values = fixed + randoms
    got_spark = _spark_hashes(spark, values)
    for v, h in zip(values, got_spark):
        assert xxhash64(v) == h, (v, xxhash64(v), h)


def test_xxhash64_two_column_chain(spark):
    """Spark chains multi-column xxhash64 by seeding each column's hash
    with the previous result — the twin must reproduce that too."""
    pairs = [("url-a", "img-1"), ("", "x" * 33), ("ßä", "")]
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(F.xxhash64(F.col("a"), F.col("b")).alias("h")).collect()
    for (a, b), r in zip(pairs, rows):
        assert xxhash64(b, seed=xxhash64(a) & ((1 << 64) - 1)) == r["h"], (a, b)
