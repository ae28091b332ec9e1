"""Round-6 curation operators (session 3): train/val split-leakage
audit (j10), OCR text-density image filter (m11), and video
frame-sampling with scene-cut detection (m12).

New module on purpose — query fingerprints are module-level
(all_queries.py), so adding these to queries_ml/queries_multimodal
would have re-fronted every query in those files through the 50-slot
driver gate (the hygiene policy in all_queries.py).

j10 — the held-out-leakage audit every training-data pipeline needs
before a model eval can be trusted (the fuzzy counterpart of t8's
exact n-gram decontamination): deterministically hash-split the corpus
90/10 into train/val, find near-duplicate pairs that CROSS the split
via MinHash-LSH bands (reusing d2/d3's signature scheme verbatim), and
confirm candidates with exact 3-gram Jaccard. A val doc with a
high-Jaccard train twin is leaked — its eval loss is memorization, not
generalization. Banding train×val sides directly (instead of
enumerating all pairs then filtering) keeps the join output to the
cross-split candidates only.

m11 — the LAION/DataComp text-in-image pre-filter: images whose area
is mostly rendered text (screenshots, memes, scanned documents) teach
an image-text model OCR instead of vision, so curation drops images
whose OCR-detected text area exceeds a threshold. The detector here is
a deterministic pixel heuristic standing in for the OCR model —
printed text lines are rows dominated by dense horizontal intensity
transitions, so a row whose high-gradient fraction exceeds 25% counts
as a text row — while the Spark shape (opaque binary column → Arrow
decode stage → materialized per-image verdicts → dual-engine funnel)
is the real pipeline. Same mat-table contract as m1/m10
(matpaths.py): the oracle reads the stage output this process wrote.

m12 — the multimodal video-plumbing shape: videos are opaque binary
columns (a length-prefixed frame container over the repo's dctq
codec), frame-sampling decodes every STRIDE-th frame only, and
per-frame fingerprints drive scene-cut detection (consecutive-frame
phash Hamming distance over a per-clip window). Two Arrow stages —
build clips, then sample them — with the binary column materialized
between, so the container parse is exercised against parquet-
round-tripped bytes, not in-memory ones. The mp4/h264 decode of a real
pipeline is the plug-in point (operators/media.py documents the
NotImplementedError policy); the container/stride/fingerprint plumbing
here is what Spark contributes at 100 TB.

100 TB shape:
- j10: signature build is one md5 pass per distinct gram (zero
  shuffle), the band joins shuffle on band keys only, and the Jaccard
  confirm touches candidate pairs, not the corpus square. Pair
  enumeration within a band bucket is still quadratic in bucket size —
  at production scale the d7 star-to-representative trick (link each
  doc to its bucket min, not all pairs) bounds that, exactly as d3's
  docstring notes; the audit here keeps pairs because the REPORT is
  pair-level.
- m11/m12: embarrassingly parallel Arrow stages repartitioned off the
  few-split source (the round-5 lesson); one row in → k rows out, no
  shuffle until the final keyed window (m12: per clip_id).

Reference parity: the reference has no image/video curation; this
family exists for the training-data-pipeline mandate (SURVEY §2.11).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .matpaths import mat_path
from .queries import load, query, r4
from .queries_ml import (
    _DUPED_SQL,
    _GH_SQL,
    _N_MINHASH,
    _duped,
    _gram_hashes,
    _md5int_sql,
    _minhash_col,
    _minhash_sql,
    md5int,
    norm_text,
)

# ---------------------------------------------------------------------------
# j10 — split-leakage audit
# ---------------------------------------------------------------------------

_J10_TRAIN_BUCKETS = 8  # of 10: 80/20 split
_J10_JMIN = 0.8  # exact-Jaccard confirm threshold (planted twins = 1.0)

# the split must be a pure function of the doc id so both engines (and
# any re-run) assign identically: bucket = md5("split:" || doc_id) % 10
_J10_SPLIT_HASH = _md5int_sql("'split:' || doc_id")
_J10_SPLIT_SQL = f"({_J10_SPLIT_HASH} % 10) < {_J10_TRAIN_BUCKETS}"


def _j10_split_col() -> F.Column:
    return (
        F.pmod(
            md5int(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            F.lit(10),
        )
        < _J10_TRAIN_BUCKETS
    )


@query(
    "j10_split_leakage_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, gh, {_J10_SPLIT_SQL} AS is_train,
             {", ".join(f"{_minhash_sql(k)} AS mh_{k}" for k in range(_N_MINHASH))}
      FROM (SELECT doc_id, {_GH_SQL} AS gh FROM ({_DUPED_SQL}))
    ),
    tr AS (SELECT * FROM base WHERE is_train),
    va AS (SELECT * FROM base WHERE NOT is_train),
    cand AS (
      SELECT DISTINCT train_doc, val_doc FROM (
        SELECT t.doc_id AS train_doc, v.doc_id AS val_doc,
               t.gh AS gt, v.gh AS gv
        FROM tr t JOIN va v ON t.mh_0 = v.mh_0 AND t.mh_1 = v.mh_1
        UNION ALL
        SELECT t.doc_id, v.doc_id, t.gh, v.gh
        FROM tr t JOIN va v ON t.mh_2 = v.mh_2 AND t.mh_3 = v.mh_3
      )
    ),
    jac AS (
      SELECT c.val_doc, c.train_doc,
             len(list_intersect(t.gh, v.gh))::DOUBLE
               / (len(t.gh) + len(v.gh) - len(list_intersect(t.gh, v.gh)))
               AS j
      FROM cand c
      JOIN base t ON t.doc_id = c.train_doc
      JOIN base v ON v.doc_id = c.val_doc
    )
    SELECT val_doc, count(*)::BIGINT AS n_train_dups,
           round(max(j) + 1e-9, 4) AS max_jaccard
    FROM jac WHERE j >= {_J10_JMIN}
    GROUP BY val_doc
    """,
)
def j10_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val leakage audit: hash split → cross-split MinHash-LSH
    candidates → exact-Jaccard confirm → per-val-doc dup report.
    The signature table feeds four join sides — cached once (the
    d3/d7 lesson). Corpus = _duped (planted twins guarantee leakage
    work: a twin's split bucket differs from its original's)."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the gram+minhash pipeline is the heavy per-row stage and base is
    # cached (consumed by 4 join sides) — spread the 1-2-split source
    # first (the _duped consumer note: repartition only where cached)
    d = (
        _duped(spark, sf_dir)
        .repartition(shuffle, "doc_id")
        .withColumn("__norm", norm_text(F.col("text")))
    )
    base = (
        d.select(
            "doc_id",
            _gram_hashes(F.col("__norm")).alias("gh"),
            _j10_split_col().alias("is_train"),
        )
        .select(
            "doc_id",
            "gh",
            "is_train",
            *[
                _minhash_col(F.col("gh"), k).alias(f"mh_{k}")
                for k in range(_N_MINHASH)
            ],
        )
        .cache()
    )
    sigs = base.select("doc_id", "is_train", *[f"mh_{k}" for k in range(_N_MINHASH)])
    tr = sigs.filter(F.col("is_train")).alias("t")
    va = sigs.filter(~F.col("is_train")).alias("v")
    pair_cols = [
        F.col("t.doc_id").alias("train_doc"),
        F.col("v.doc_id").alias("val_doc"),
    ]
    p1 = tr.join(
        va,
        (F.col("t.mh_0") == F.col("v.mh_0")) & (F.col("t.mh_1") == F.col("v.mh_1")),
    ).select(*pair_cols)
    p2 = tr.join(
        va,
        (F.col("t.mh_2") == F.col("v.mh_2")) & (F.col("t.mh_3") == F.col("v.mh_3")),
    ).select(*pair_cols)
    cand = p1.unionByName(p2).distinct()
    gt = base.select(F.col("doc_id").alias("train_doc"), F.col("gh").alias("gt"))
    gv = base.select(F.col("doc_id").alias("val_doc"), F.col("gh").alias("gv"))
    inter = F.size(F.array_intersect(F.col("gt"), F.col("gv")))
    jac = (
        cand.join(gt, "train_doc")
        .join(gv, "val_doc")
        .select(
            "val_doc",
            "train_doc",
            (
                inter.cast("double")
                / (F.size(F.col("gt")) + F.size(F.col("gv")) - inter)
            ).alias("j"),
        )
    )
    return (
        jac.filter(F.col("j") >= _J10_JMIN)
        .groupBy("val_doc")
        .agg(
            F.count("*").alias("n_train_dups"),
            r4(F.max("j")).alias("max_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# m11 — OCR text-density image filter
# ---------------------------------------------------------------------------

_M11_MAT = mat_path("m11_ocr")
_M11_GRAD = 24  # |adjacent-pixel diff| above this = a text-edge transition
_M11_ROW_FRAC = 0.25  # row is a "text row" when >25% of it is transitions
_M11_MAX_X1000 = 500  # drop when more than half the rows are text rows


@query(
    "m11_ocr_text_density",
    oracle=f"""
    SELECT image_id, fmt, h, w, text_rows, text_frac_x1000,
           CASE WHEN text_frac_x1000 <= {_M11_MAX_X1000} THEN 1 ELSE 0 END
             AS kept
    FROM read_parquet('{_M11_MAT}/*.parquet')
    """,
)
def m11_ocr_text_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-in-image density filter: decode → per-row horizontal
    gradient density → text-row fraction → keep/drop verdict. The
    detector is the deterministic stand-in for the OCR model (module
    docstring); verdicts are materialized so both engines read the
    same rows (m1/m10 contract)."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir)

    def ocr_batches(it):
        import numpy as np
        import pandas as pd

        from .operators.images import decode

        for pdf in it:
            out = {
                "image_id": [],
                "fmt": [],
                "h": [],
                "w": [],
                "text_rows": [],
                "text_frac_x1000": [],
            }
            for iid, buf, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                img, _ = decode(bytes(buf))
                grad = np.abs(np.diff(img.astype(np.int16), axis=1))
                texty = (grad > _M11_GRAD).mean(axis=1) > _M11_ROW_FRAC
                out["image_id"].append(iid)
                out["fmt"].append(fmt)
                out["h"].append(int(img.shape[0]))
                out["w"].append(int(img.shape[1]))
                out["text_rows"].append(int(texty.sum()))
                out["text_frac_x1000"].append(
                    int(round(1000.0 * float(texty.mean())))
                )
            yield pd.DataFrame(out)

    stats = imgs.mapInPandas(
        ocr_batches,
        "image_id string, fmt string, h int, w int, "
        "text_rows long, text_frac_x1000 long",
    )
    stats.write.mode("overwrite").parquet(_M11_MAT)
    mat = spark.read.parquet(_M11_MAT)
    return mat.select(
        "image_id",
        "fmt",
        "h",
        "w",
        "text_rows",
        "text_frac_x1000",
        (F.col("text_frac_x1000") <= _M11_MAX_X1000).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# m12 — video frame-sampling + scene-cut detection
# ---------------------------------------------------------------------------

_M12_VID = mat_path("m12_videos")
_M12_MAT = mat_path("m12_frames")
_M12_STRIDE = 3  # decode every 3rd frame
_M12_MAGIC = b"HCV1"
_M12_CUT_BITS = 16  # consecutive-sample phash Hamming >= this = a cut


def build_video(doc_id: int) -> tuple[int, bytes]:
    """Deterministic synthetic clip for doc_id: n_frames in 6..12, a
    hard scene cut at the midpoint (pattern A → pattern B), small
    per-frame brightness drift. Container: HCV1 | u32 n | (u32 len |
    dctq payload)*n. Module-level so tests can pin the round-trip."""
    import numpy as np

    from . import synth
    from .operators.images import encode
    from .queries_multimodal import _WORLD

    pseed = synth.h(_WORLD.seed, f"vid:{doc_id}")
    n_frames = 6 + synth.h(_WORLD.seed, f"vframes:{doc_id}") % 7
    cut = n_frames // 2
    scenes = [
        synth.gen_image(pseed, 0, lo=32, hi=64),
        synth.gen_image(pseed, 1, lo=32, hi=64),
    ]
    parts = [_M12_MAGIC, struct.pack("<I", n_frames)]
    for i in range(n_frames):
        frame = scenes[0] if i < cut else scenes[1]
        frame = np.clip(frame.astype(np.int16) + 2 * i, 0, 255).astype(np.uint8)
        payload = encode(frame, "dctq")
        parts.append(struct.pack("<I", len(payload)))
        parts.append(payload)
    return n_frames, b"".join(parts)


def sample_video(buf: bytes) -> list[tuple[int, int, int]]:
    """Parse the container and decode every _M12_STRIDE-th frame:
    [(frame_idx, mean_x100, phash63)]. Module-level for the same
    round-trip test."""
    from .operators.images import decode, phash64

    assert buf[:4] == _M12_MAGIC, "not an HCV1 container"
    n = struct.unpack("<I", buf[4:8])[0]
    off, out = 8, []
    for i in range(n):
        ln = struct.unpack("<I", buf[off : off + 4])[0]
        off += 4
        payload = buf[off : off + ln]
        off += ln
        if i % _M12_STRIDE:
            continue
        img, _ = decode(payload)
        out.append(
            (
                i,
                int(round(float(img.mean()) * 100)),
                phash64(img) & ((1 << 63) - 1),  # sign-safe int64
            )
        )
    return out


@query(
    "m12_video_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT clip_id, n_frames, frame_idx, mean_x100, phash63,
             lag(phash63) OVER (PARTITION BY clip_id ORDER BY frame_idx)
               AS prev_ph
      FROM read_parquet('{_M12_MAT}/*.parquet')
    ),
    h AS (
      SELECT clip_id, n_frames, frame_idx, mean_x100,
             CASE WHEN prev_ph IS NULL THEN 0
                  ELSE bit_count(xor(phash63, prev_ph)) END AS ham
      FROM f
    )
    SELECT clip_id, n_frames,
           count(*)::BIGINT AS n_sampled,
           CASE WHEN count(*) = (n_frames + {_M12_STRIDE - 1}) // {_M12_STRIDE}
                THEN 1 ELSE 0 END AS sample_ok,
           round(avg(mean_x100) / 100.0 + 1e-9, 4) AS avg_mean,
           max(ham)::BIGINT AS max_ham,
           CASE WHEN max(ham) >= {_M12_CUT_BITS} THEN 1 ELSE 0 END
             AS scene_cut
    FROM h
    GROUP BY clip_id, n_frames
    """,
)
def m12_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample opaque video blobs: stage 1 materializes the
    binary clips, stage 2 parses the parquet-round-tripped container
    and decodes every 3rd frame; the per-clip report (stride check,
    brightness, max consecutive-sample phash Hamming → scene cut) is
    dual-oracled over the frames mat. Integer-division stride math is
    identical in both engines (non-negative operands)."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(shuffle, "doc_id")
    )

    def vid_batches(it):
        import pandas as pd

        for pdf in it:
            out = {"clip_id": [], "n_frames": [], "video": []}
            for doc_id in pdf["doc_id"]:
                n_frames, video = build_video(int(doc_id))
                out["clip_id"].append(int(doc_id))
                out["n_frames"].append(n_frames)
                out["video"].append(video)
            yield pd.DataFrame(out)

    clips = docs.mapInPandas(
        vid_batches, "clip_id long, n_frames int, video binary"
    )
    # blob-table write idiom (crawl.py IMAGE_WRITE_OPTS rationale):
    # dctq payloads are already compressed; snappy only serializes
    clips.write.mode("overwrite").option("compression", "none").parquet(_M12_VID)

    def frame_batches(it):
        import pandas as pd

        for pdf in it:
            out = {
                "clip_id": [],
                "n_frames": [],
                "frame_idx": [],
                "mean_x100": [],
                "phash63": [],
            }
            for clip_id, n_frames, buf in zip(
                pdf["clip_id"], pdf["n_frames"], pdf["video"]
            ):
                for frame_idx, mean_x100, ph in sample_video(bytes(buf)):
                    out["clip_id"].append(int(clip_id))
                    out["n_frames"].append(int(n_frames))
                    out["frame_idx"].append(frame_idx)
                    out["mean_x100"].append(mean_x100)
                    out["phash63"].append(ph)
            yield pd.DataFrame(out)

    frames = spark.read.parquet(_M12_VID).mapInPandas(
        frame_batches,
        "clip_id long, n_frames int, frame_idx int, mean_x100 long, phash63 long",
    )
    frames.write.mode("overwrite").parquet(_M12_MAT)
    mat = spark.read.parquet(_M12_MAT)

    w = Window.partitionBy("clip_id").orderBy("frame_idx")
    ham = F.when(F.lag("phash63").over(w).isNull(), F.lit(0)).otherwise(
        F.bit_count(F.col("phash63").bitwiseXOR(F.lag("phash63").over(w)))
    )
    per_frame = mat.select(
        "clip_id", "n_frames", "frame_idx", "mean_x100", ham.alias("ham")
    )
    expected = (
        (F.col("n_frames") + F.lit(_M12_STRIDE - 1)) / F.lit(_M12_STRIDE)
    ).cast("int")
    return (
        per_frame.groupBy("clip_id", "n_frames")
        .agg(
            F.count("*").alias("n_sampled"),
            r4(F.avg("mean_x100") / 100.0).alias("avg_mean"),
            F.max("ham").cast("long").alias("max_ham"),
        )
        .select(
            "clip_id",
            "n_frames",
            "n_sampled",
            (F.col("n_sampled") == expected).cast("int").alias("sample_ok"),
            "avg_mean",
            "max_ham",
            (F.col("max_ham") >= _M12_CUT_BITS).cast("int").alias("scene_cut"),
        )
    )
