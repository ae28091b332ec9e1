"""Custom stateful streaming operator: streaming first-seen dedup.

The crawl engine's batch rounds keep the seen set in snapshot tables;
this is the *streaming* expression of the same semantics — a stream of
discovered URLs deduplicated against per-group state kept by
``applyInPandasWithState`` (the reference's in-memory seen list,
crawl_wggesucht.py:297-299, as bounded keyed state).

State is keyed by ``pmod(url_hash, n_buckets)`` so it shards across
executors exactly like the bloom shards; each group's state is the set
of url hashes seen so far (stored as a binary-packed int64 array)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "bucket int, url_hash long, canonical_url string"
STATE_SCHEMA = "hashes binary"


def _dedup_fn(key, pdfs, state: GroupState):
    import numpy as np

    if state.exists:
        (blob,) = state.get
        seen = set(np.frombuffer(blob, dtype=np.int64).tolist())
    else:
        seen = set()
    out = []
    for pdf in pdfs:
        fresh_mask = []
        for h in pdf["url_hash"]:
            h = int(h)
            if h in seen:
                fresh_mask.append(False)
            else:
                seen.add(h)
                fresh_mask.append(True)
        fresh = pdf[fresh_mask] if any(fresh_mask) else pdf.iloc[0:0]
        if len(fresh):
            out.append(fresh[["bucket", "url_hash", "canonical_url"]])
    state.update((np.array(sorted(seen), dtype=np.int64).tobytes(),))
    yield (
        pd.concat(out)
        if out
        else pd.DataFrame(columns=["bucket", "url_hash", "canonical_url"])
    )


def streaming_seen_dedup(urls: DataFrame, n_buckets: int = 16) -> DataFrame:
    """urls(canonical_url) stream → first-occurrence rows only.

    Works on a streaming DataFrame via applyInPandasWithState; the same
    call on a batch DataFrame raises (use the engine's anti-join there).
    """
    keyed = urls.select(
        F.col("canonical_url"),
        F.xxhash64("canonical_url").alias("url_hash"),
    ).withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)).cast("int"))
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
