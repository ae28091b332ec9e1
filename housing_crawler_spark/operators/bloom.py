"""Sharded bloom filter over the URL-seen set.

PySpark doesn't expose ``DataFrameStatFunctions.bloomFilter`` objects we
could ship around, so the engine builds its own shards as plain rows
``(shard_id, n_shards, n_bits, n_hashes, bitset)`` — one shard per
``pmod(url_hash, n_shards)`` bucket — via ``applyInPandas``
(Arrow-batched numpy bit twiddling, no per-row Python).

Scale design (docs/SCALE_DESIGN.md): at 10^10 URLs the bloom is ~12.5 GB
of bits across shards, far too big to collect or broadcast. ``probe``
therefore CO-PARTITIONS: candidates shuffle once by
``pmod(url_hash, n_shards)`` and cogroup with the shard rows, so each
task touches exactly one shard's bitset (~12 MB) and nothing ever
passes through the driver. A ``sub_splits`` fan-out key keeps task
parallelism above the shard count without duplicating work (each
(shard, sub) task still reads one bitset).

The shard count is threaded EXPLICITLY from build to probe (stored in
every shard row): inferring it from ``max(shard_id)+1`` would misroute
every probe whenever the highest buckets happen to be empty — silently
voiding the zero-false-negative guarantee (test_bloom.py pins this).

Shards built with an explicit ``n_bits`` are OR-mergeable: per-round
known deltas rebuild only the shards they touch (``or_shards``) instead
of re-hashing the full known set — the incremental maintenance the
engine uses once the bloom activates.

The exact ``left_anti`` join against the seen table remains the
correctness backstop, keyed on the canonical URL itself (not just its
64-bit hash — at 10^10 URLs, xxhash64 birthday collisions ~n²/2^65 would
otherwise silently drop a handful of distinct new URLs). The bloom is
*only* a work-pruning pre-filter: zero false negatives by construction,
false positives just cost extra join work.

Double hashing (Kirsch-Mitzenmacher, public result): bit_i =
(h1 + i*h2) mod m with h1 = url_hash, h2 = odd mix of h1 — k probes
from one stored 64-bit key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOOM_SCHEMA = "shard_id int, n_shards int, n_bits long, n_hashes int, bitset binary"


def _positions(hashes: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(n, k) bit positions from int64 url hashes (vectorized)."""
    h1 = hashes.astype(np.uint64)
    h2 = ((h1 >> np.uint64(33)) ^ h1) * np.uint64(0xFF51AFD7ED558CCD) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def build_shards(
    seen: DataFrame,
    n_shards: int = 8,
    bits_per_key: int = 10,
    n_hashes: int = 4,
    min_bits: int = 1 << 12,
    n_bits: int | None = None,
) -> DataFrame:
    """seen(url_hash long) → one bitset row per non-empty shard.

    With explicit ``n_bits`` every shard gets the same fixed width
    (required for OR-merging incremental deltas); otherwise each shard
    sizes itself from its own key count (one-shot builds)."""

    def one_shard(key, pdf: pd.DataFrame):
        n = len(pdf)
        if n_bits is not None:
            bits = int(n_bits)
        else:
            bits = max(min_bits, 1 << int(np.ceil(np.log2(max(1, n * bits_per_key)))))
        arr = np.zeros(bits // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(np.int64), bits, n_hashes)
        np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_shards": [n_shards],
                "n_bits": [bits],
                "n_hashes": [n_hashes],
                "bitset": [arr.tobytes()],
            }
        )

    keyed = seen.withColumn("shard_id", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
    return keyed.groupBy("shard_id").applyInPandas(one_shard, BLOOM_SCHEMA)


def or_shards(current: DataFrame, delta: DataFrame) -> DataFrame:
    """OR ``delta`` shard rows into ``current``, touching ONLY the shard
    ids present in ``delta`` (incremental maintenance: untouched shards
    are not read, not rewritten, not returned). Both sides must carry
    identical (n_shards, n_bits, n_hashes) — i.e. be built with the same
    explicit geometry."""

    def merge(key, pdf: pd.DataFrame):
        first = pdf.iloc[0]
        geo = pdf[["n_shards", "n_bits", "n_hashes"]].drop_duplicates()
        assert len(geo) == 1, f"shard {key}: mixed bloom geometry {geo.values}"
        acc = np.zeros(int(first["n_bits"]) // 8, dtype=np.uint8)
        for b in pdf["bitset"]:
            acc |= np.frombuffer(b, np.uint8)
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_shards": [int(first["n_shards"])],
                "n_bits": [int(first["n_bits"])],
                "n_hashes": [int(first["n_hashes"])],
                "bitset": [acc.tobytes()],
            }
        )

    dirty_ids = delta.select("shard_id").distinct()
    touched = current.join(F.broadcast(dirty_ids), "shard_id", "left_semi")
    return touched.unionByName(delta).groupBy("shard_id").applyInPandas(merge, BLOOM_SCHEMA)


def probe(
    spark: SparkSession,
    candidates: DataFrame,
    shards: DataFrame,
    hash_col: str = "url_hash",
    out_col: str = "maybe_seen",
    n_shards: int | None = None,
    sub_splits: int = 4,
) -> DataFrame:
    """Add ``maybe_seen`` to candidates. False ⇒ definitely not in seen.

    Distributed, co-partitioned: candidates shuffle once by shard id and
    cogroup with the shard rows — no driver collect, no broadcast of the
    shard table; each task touches only its own shard's bitset.

    ``n_shards`` MUST equal the build-time shard count; pass it (the
    engine knows its config) or it is read from the shard rows
    themselves (one 1-row aggregate job) — never inferred from which
    shard ids happen to be present."""
    if n_shards is None:
        row = shards.select(F.max("n_shards").alias("n")).first()
        n_shards = int(row["n"]) if row and row["n"] is not None else 1

    sid = F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")
    sub = F.pmod(F.shiftrightunsigned(F.col(hash_col), 13), F.lit(sub_splits)).cast("int")
    cand = candidates.withColumn("__sid", sid).withColumn("__sub", sub)
    subs = spark.range(sub_splits).select(F.col("id").cast("int").alias("__sub"))
    sh = shards.select("shard_id", "n_bits", "n_hashes", "bitset").crossJoin(
        F.broadcast(subs)
    )

    out_fields = list(candidates.schema.fields) + [
        T.StructField(out_col, T.BooleanType(), False)
    ]
    out_schema = T.StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def probe_group(key, cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame):
        res = cand_pdf.drop(columns=["__sid", "__sub"])
        if shard_pdf.empty:
            # no shard row ⇒ the build saw no keys in this bucket ⇒
            # definitely new (empty buckets emit no row by design)
            return res.assign(**{out_col: False})[out_cols]
        arr = np.frombuffer(shard_pdf["bitset"].iloc[0], np.uint8)
        n_bits = int(shard_pdf["n_bits"].iloc[0])
        k = int(shard_pdf["n_hashes"].iloc[0])
        hv = res[hash_col].to_numpy(np.int64)
        pos = _positions(hv, n_bits, k)
        bits = (arr[pos >> 3] >> (pos & 7)) & 1
        return res.assign(**{out_col: bits.all(axis=1)})[out_cols]

    return (
        cand.groupBy("__sid", "__sub")
        .cogroup(sh.groupBy("shard_id", "__sub"))
        .applyInPandas(probe_group, out_schema)
    )


def anti_join_seen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None,
    hash_col: str = "url_hash",
    url_col: str = "canonical_url",
    n_shards: int | None = None,
) -> DataFrame:
    """EXACT candidates-not-in-seen, bloom-accelerated when shards given.

    definitely-new rows skip the shuffle entirely; only the maybe-seen
    minority pays the exact anti-join (SURVEY §2.3 J1 at scale). The
    exact join keys on the canonical URL string when both sides carry it
    (plus the hash, which co-partitions the shuffle cheaply), so a
    64-bit hash collision can never drop a distinct URL."""
    if url_col in candidates.columns and url_col in seen.columns:
        keys = [hash_col, url_col]
    else:
        keys = [hash_col]
    if shards is None:
        return candidates.join(seen.select(*keys), keys, "left_anti")
    probed = probe(spark, candidates, shards, hash_col=hash_col, n_shards=n_shards)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    return fresh.unionByName(maybe.join(seen.select(*keys), keys, "left_anti"))
