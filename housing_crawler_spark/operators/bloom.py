"""Sharded bloom filter over the URL-seen set.

PySpark doesn't expose ``DataFrameStatFunctions.bloomFilter`` objects we
could ship around, so the engine builds its own shards as plain rows
``(shard_id:int, bitset:binary)`` — one shard per ``pmod(url_hash,
n_shards)`` bucket — via ``applyInPandas`` (Arrow-batched numpy bit
twiddling, no per-row Python). At 10^10 URLs the shards are the only
state small enough to broadcast; the exact ``left_anti`` join against
the (bucketed) seen table remains the correctness backstop, so the bloom
is *only* a work-pruning pre-filter: zero false negatives by
construction (test_bloom.py), false positives just cost extra join work.

Double hashing (Kirsch-Mitzenmacher, public result): bit_i =
(h1 + i*h2) mod m with h1 = url_hash, h2 = odd mix of h1 — k probes
from one stored 64-bit key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SCHEMA = "shard_id int, n_bits long, n_hashes int, bitset binary"


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
) -> DataFrame:
    """seen(url_hash long) → one bitset row per shard."""

    def one_shard(key, pdf: pd.DataFrame):
        n = len(pdf)
        n_bits = max(min_bits, 1 << int(np.ceil(np.log2(max(1, n * bits_per_key)))))
        arr = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(np.int64), n_bits, n_hashes)
        np.bitwise_or.at(arr, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {
                "shard_id": [int(key[0])],
                "n_bits": [n_bits],
                "n_hashes": [n_hashes],
                "bitset": [arr.tobytes()],
            }
        )

    keyed = seen.withColumn("shard_id", F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
    return keyed.groupBy("shard_id").applyInPandas(one_shard, BLOOM_SCHEMA)


def probe(
    spark: SparkSession,
    candidates: DataFrame,
    shards: DataFrame,
    hash_col: str = "url_hash",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Add ``maybe_seen`` to candidates. False ⇒ definitely not in seen."""
    rows = shards.collect()
    n_shards = max((r["shard_id"] for r in rows), default=0) + 1
    table = {
        r["shard_id"]: (np.frombuffer(r["bitset"], np.uint8), r["n_bits"], r["n_hashes"])
        for r in rows
    }
    bc = spark.sparkContext.broadcast(table)

    def probe_batches(it):
        shard_map = bc.value
        for pdf in it:
            hv = pdf[hash_col].to_numpy(np.int64)
            out = np.zeros(len(pdf), dtype=bool)
            if shard_map:
                sid = (hv % n_shards + n_shards) % n_shards
                for s, (arr, n_bits, k) in shard_map.items():
                    m = sid == s
                    if not m.any():
                        continue
                    pos = _positions(hv[m], n_bits, k)
                    bits = (arr[pos >> 3] >> (pos & 7)) & 1
                    out[m] = bits.all(axis=1)
            yield pdf.assign(**{out_col: out})

    # build a FRESH StructType: StructType.add mutates the DataFrame's
    # cached schema object in place, which corrupts later analysis
    from pyspark.sql import types as T

    schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField(out_col, T.BooleanType(), False)]
    )
    return candidates.mapInPandas(probe_batches, schema)


def anti_join_seen(
    spark: SparkSession,
    candidates: DataFrame,
    seen: DataFrame,
    shards: DataFrame | None,
    hash_col: str = "url_hash",
) -> DataFrame:
    """EXACT candidates-not-in-seen, bloom-accelerated when shards given.

    definitely-new rows skip the shuffle entirely; only the maybe-seen
    minority pays the exact anti-join (SURVEY §2.3 J1 at scale)."""
    if shards is None:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    probed = probe(spark, candidates, shards, hash_col=hash_col)
    fresh = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    return fresh.unionByName(maybe.join(seen.select(hash_col), hash_col, "left_anti"))
