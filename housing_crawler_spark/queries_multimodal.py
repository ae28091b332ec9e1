"""Multimodal-column operators: opaque binary image payloads with typed
metadata, decoded/feature-extracted inside Arrow-batched UDF stages.

These queries carry no SQL oracle (binary codecs aren't expressible in
ANSI SQL) → the driver records the weaker rows-only check; the strong
correctness evidence is tests/test_crawl_parity.py (byte-identical
images vs the simulator) and the PSNR/lossless invariants below. The
banded-Hamming near-dup scan over phash lives in queries_ml2.py:
m2_phash_near_dup (SQL-verifiable planted hashes) and
m3_phash_image_near_dup (real image hashes from this table).

The image table is synthesized deterministically from doc_ids (pure
function of seed — no external data), at the exact BASELINE.json
input_hint shape: (image_id, bytes, w, h, fmt, caption, phash)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas, synth
from .queries import load, query

_WORLD = synth.WorldConfig(seed=42)
_MAX_DOCS = 400  # bound the synthetic corpus per run


def _image_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic image+caption rows (input_hint shape)."""
    # the driver may hand us a session it built itself — ship the package
    # so worker-side closures can import it (idempotent)
    from .session import _ship_package

    _ship_package(spark)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _MAX_DOCS)
        .select("doc_id", F.substring("text", 1, 60).alias("caption_raw"))
    )

    def gen_batches(it):
        from .functions.hashing import xxhash64
        from .operators.images import encode, phash64

        for pdf in it:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
            for doc_id, cap in zip(pdf["doc_id"], pdf["caption_raw"]):
                key = f"doc:{doc_id}"
                pseed = synth.h(_WORLD.seed, f"payload:{key}")
                for idx in range(1 + synth.h(_WORLD.seed, f"nimg:{key}") % 2):
                    img = synth.gen_image(pseed, idx)
                    fmt = synth.image_fmt(_WORLD, key, idx)
                    rows["image_id"].append(
                        f"{xxhash64(key) & ((1 << 64) - 1):016x}-{idx}"
                    )
                    rows["bytes"].append(encode(img, fmt))
                    rows["w"].append(img.shape[1])
                    rows["h"].append(img.shape[0])
                    rows["fmt"].append(fmt)
                    rows["caption"].append(synth.clean_caption_py(str(cap)))
                    rows["phash"].append(phash64(img))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(gen_batches, schemas.IMAGES)


@query("m1_image_decode_stats", oracle=None)
def m1_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every payload (mapInPandas, numpy codecs) and verify the
    per-row invariants distributed-side: lossless → bit-exact pixels &
    exact phash; lossy (dctq) → PSNR vs re-generated original ≥ 40 dB.
    Returns per-fmt pass/fail counts + PSNR stats."""
    imgs = _image_table(spark, sf_dir)

    def decode_batches(it):
        import numpy as np

        from .operators.images import LOSSLESS, decode, phash64, psnr

        for pdf in it:
            out = {"fmt": [], "ok": [], "psnr_db": [], "n_pixels": []}
            for buf, fmt, w, h, ph in zip(
                pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"], pdf["phash"]
            ):
                img, f2 = decode(bytes(buf))
                ok = f2 == fmt and img.shape == (h, w)
                if fmt in LOSSLESS:
                    ok = ok and phash64(img) == ph
                    p = float("inf")
                else:
                    # round-trip PSNR of a re-encode (decode is stable)
                    from .operators.images import encode

                    p = psnr(img, decode(encode(img, "dctq"))[0])
                    ok = ok and p >= 40.0
                out["fmt"].append(fmt)
                out["ok"].append(bool(ok))
                out["psnr_db"].append(None if np.isinf(p) else round(p, 2))
                out["n_pixels"].append(int(w) * int(h))
            yield pd.DataFrame(out)

    decoded = imgs.mapInPandas(
        decode_batches, "fmt string, ok boolean, psnr_db double, n_pixels long"
    )
    return decoded.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("n_ok"),
        F.round(F.avg("psnr_db"), 2).alias("avg_psnr_db"),
        F.round(F.avg("n_pixels"), 1).alias("avg_pixels"),
    )
