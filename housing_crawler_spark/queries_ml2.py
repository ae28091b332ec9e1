"""Chained dedup / similarity pipelines (round-2 VERDICT items 5+7):
the candidate-generation stages (d3's MinHash-LSH bands, s2's
hyperplane buckets, multi-band Hamming) feed their REAL candidates into
the verification measures (Jaccard, cosine, Hamming) and a keeper
selection — no synthetic `doc_id+1` pairings anywhere. Plans contain
only banded equi-joins; never an all-pairs cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import load, query, r4
from .queries_ml import (
    _3GRAMS_SQL,
    _cos_sql,
    _DUPED_SQL,
    _duped,
    _md5int_sql,
    _NORM_SQL,
    _TOKENS_SQL,
    char_3grams,
    cosine,
    md5int,
    norm_text,
    perm_consts,
)

# ---------------------------------------------------------------------------
# d7 — the full text-dedup pipeline: corpus (+planted exact AND mutated
# near-dups) → minhash sigs → banded LSH candidates → n-gram Jaccard
# verification → keeper assignment. Replaces d5's synthetic pairing.
# ---------------------------------------------------------------------------

# mutated near-copies: a fixed German tail appended to every 15th doc —
# high-but-not-1.0 Jaccard, so the verify stage does real work
_MUT_SQL = f"""
      {_DUPED_SQL}
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' sofort verfuegbar provisionsfrei'
      FROM documents WHERE doc_id % 15 = 0
"""


def _mut(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _duped(spark, sf_dir)
    m = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 15 == 0)
        .select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" sofort verfuegbar provisionsfrei")).alias(
                "text"
            ),
        )
    )
    return d.unionByName(m)


# Signature scheme: ONE md5 pass hashes each distinct 3-gram to int64;
# the 8 "permutations" are xor-mixes of that hash with fixed constants
# (min over xor(h, C_k) — cheap, portable, identical gram sets give
# identical signatures). 2 bands x 4 rows: band-collision probability
# ~jaccard^4 keeps false candidates down.
#
# Scale shape: within a band bucket we do NOT emit all pairs (the
# corpus is template-heavy, so bucket sizes ~40 make all-pairs
# quadratic — measured 188s at sf0.1 and it only gets worse at 100x).
# Instead every doc links to its bucket's MIN doc_id (star-to-
# representative, linear in bucket size), takes the smallest candidate
# keeper across bands, and verifies THAT one link with exact n-gram
# Jaccard. Keeper assignment is single-pass (transitive chains collapse
# over repeated runs, as in production LSH dedup).
_D7_PERMS = 8


_C = perm_consts(_D7_PERMS)
_GH_SQL = (
    f"list_distinct(list_transform({_3GRAMS_SQL}, s -> {_md5int_sql('s')}))"
)
_SIG_SQL = ", ".join(
    f"list_aggregate(list_transform(g, h -> xor(h, {_C[k]})), 'min') AS mh_{k}"
    for k in range(_D7_PERMS)
)
_B1_KEY = ", ".join(f"mh_{k}" for k in range(0, 4))
_B2_KEY = ", ".join(f"mh_{k}" for k in range(4, 8))

_D7_CHAIN_SQL = f"""
    corpus AS ({_MUT_SQL}),
    grams AS (SELECT doc_id, {_GH_SQL} AS g FROM corpus),
    sigs AS (SELECT doc_id, g, {_SIG_SQL} FROM grams),
    starred AS (
      SELECT doc_id, g,
             min(doc_id) OVER (PARTITION BY {_B1_KEY}) AS bmin_1,
             min(doc_id) OVER (PARTITION BY {_B2_KEY}) AS bmin_2
      FROM sigs
    ),
    cands AS (
      SELECT doc_id AS dup_id, g,
             least(CASE WHEN bmin_1 < doc_id THEN bmin_1 END,
                   CASE WHEN bmin_2 < doc_id THEN bmin_2 END) AS keeper
      FROM starred
    ),
    verified AS (
      SELECT c.dup_id, c.keeper,
             CASE WHEN len(c.g) + len(k.g) - len(list_intersect(c.g, k.g)) > 0
                  THEN len(list_intersect(c.g, k.g))::DOUBLE
                       / (len(c.g) + len(k.g) - len(list_intersect(c.g, k.g)))
             END AS jac
      FROM (SELECT * FROM cands WHERE keeper IS NOT NULL) c
      JOIN grams k ON k.doc_id = c.keeper
    )
"""


@query(
    "d7_dedup_pipeline",
    oracle=f"""
    WITH {_D7_CHAIN_SQL}
    SELECT dup_id, keeper, round(jac + 1e-9, 4) AS jaccard
    FROM verified
    WHERE jac >= 0.6
    """,
)
def d7_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END text dedup: one-pass gram hashing → 8 xor-mix MinHash
    permutations → 2x4-row LSH bands → star-to-bucket-representative
    candidate per doc (linear in bucket size — all-pairs inside
    template-heavy buckets is quadratic and dies at 100x) → exact
    n-gram-Jaccard verification of that link → (dup_id, keeper).
    Catches the planted exact copies and mutated near-copies. Plan:
    two window mins on the band keys over a signatures-only projection
    + two equi-joins re-fetching gram sets (candidate's and keeper's)
    from the cached gram table; no cross join, no quadratic pair
    set."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    corpus = _mut(spark, sf_dir)
    grams = (
        # spread the gram build — the source is 1-2 input splits and
        # this is the expensive expression; safe because cached
        corpus.repartition(shuffle, "doc_id")
        .withColumn("__norm", norm_text(F.col("text")))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(char_3grams(F.col("__norm")), lambda s: md5int(s))
            ).alias("g"),
        )
        .cache()
    )
    # band-min computation runs over a g-FREE projection: the ~KB gram
    # array per row would otherwise be shuffled through BOTH window
    # partitionings (the dominant shuffle volume); g is re-joined from
    # the cached gram table only for the (filtered) candidate set.
    sigs = grams.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("g"), (lambda ck: (lambda h: h.bitwiseXOR(F.lit(ck))))(_C[k]))
            ).alias(f"mh_{k}")
            for k in range(_D7_PERMS)
        ],
    )
    w1 = Window.partitionBy(*[f"mh_{k}" for k in range(0, 4)])
    w2 = Window.partitionBy(*[f"mh_{k}" for k in range(4, 8)])
    starred = sigs.withColumn("bmin_1", F.min("doc_id").over(w1)).withColumn(
        "bmin_2", F.min("doc_id").over(w2)
    )
    doc = F.col("doc_id")
    cands = starred.select(
        doc.alias("dup_id"),
        F.least(
            F.when(F.col("bmin_1") < doc, F.col("bmin_1")),
            F.when(F.col("bmin_2") < doc, F.col("bmin_2")),
        ).alias("keeper"),
    ).filter(F.col("keeper").isNotNull())
    gd = grams.select(F.col("doc_id").alias("dup_id"), "g")
    k = grams.select(F.col("doc_id").alias("keeper"), F.col("g").alias("kg"))
    inter = F.size(F.array_intersect(F.col("g"), F.col("kg")))
    union_n = F.size(F.col("g")) + F.size(F.col("kg")) - inter
    # degenerate empty-gram docs: union 0 → NULL (ANSI would throw;
    # DuckDB 0/0 is NULL too, and NULL fails the >= threshold both sides)
    jac = F.when(union_n > 0, inter.cast("double") / union_n)
    return (
        cands.join(gd, "dup_id")
        .join(k, "keeper")
        .select("dup_id", "keeper", jac.alias("jac"))
        .filter(F.col("jac") >= 0.6)
        .select("dup_id", "keeper", F.round(F.col("jac") + F.lit(1e-9), 4).alias("jaccard"))
    )



# ---------------------------------------------------------------------------
# d8 — transitive dedup: connected components over d7's verified
# near-dup links. d7 assigns each doc a single-pass keeper (its bucket
# representative); chains a->b->c that only materialize across bands
# need the closure to agree on ONE canonical keeper per component.
# Spark: iterative min-label propagation (operators/graph.py, the F11
# driver-loop pattern, O(diameter) joins). Oracle: exact reachability
# via a recursive CTE — component = min reachable id, a graph
# invariant, so the two formulations agree by construction.
# ---------------------------------------------------------------------------


@query(
    "d8_dedup_components",
    oracle=f"""
    WITH RECURSIVE {_D7_CHAIN_SQL},
    dlinks AS (
      SELECT dup_id, keeper FROM verified WHERE jac >= 0.6
    ),
    nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT dup_id AS doc_id FROM dlinks
        UNION ALL SELECT keeper FROM dlinks
      )
    ),
    cedges AS (
      SELECT dup_id AS a, keeper AS b FROM dlinks
      UNION SELECT keeper, dup_id FROM dlinks
    ),
    reach AS (
      SELECT doc_id, doc_id AS label FROM nodes
      UNION
      SELECT e.a AS doc_id, r.label
      FROM reach r JOIN cedges e ON e.b = r.doc_id
    )
    SELECT doc_id, min(label) AS component
    FROM reach GROUP BY doc_id
    """,
)
def d8_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup closure: every doc in d7's link graph
    labeled with its component's canonical min-id keeper (iterative
    min-label propagation; see operators/graph.py for the scale
    shape). The single query a curation run needs AFTER candidate
    generation: one canonical representative per duplicate cluster,
    chains collapsed."""
    from .operators.graph import star_components

    links = d7_dedup_pipeline(spark, sf_dir).select("dup_id", "keeper")
    # small-star/large-star: O(log n) rounds regardless of chain depth
    # (round-4 verdict item 3 — plain min-label propagation is
    # O(diameter) and capped); component minima are algorithm-invariant
    # so the recursive-CTE oracle is unchanged
    comps = star_components(links, a="dup_id", b="keeper")
    return comps.select(F.col("node").alias("doc_id"), "component")


# ---------------------------------------------------------------------------
# s3 — ANN near-dup at corpus scale: hyperplane-LSH BANDS generate one
# candidate link per (vector, band) via star-to-bucket-representative —
# the d7 pattern — and exact cosine verifies each link. Candidate rows
# are <= BANDS * n BY CONSTRUCTION (no within-bucket all-pairs join:
# the round-2 version emitted ~n^2/256 pairs on template-heavy corpora,
# the exact quadratic shape d7's rewrite measured at 188 s and fixed).
# ---------------------------------------------------------------------------

# planted embedding clones: exact (vec_id+1e6) and perturbed (vec_id+2e6)
_EMB_SQL = """
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 20 = 0
      UNION ALL
      SELECT vec_id + 2000000,
             list_transform(generate_series(1, len(embedding)),
                            i -> embedding[i]::DOUBLE * 1.01)
      FROM embeddings WHERE vec_id % 25 = 0
"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    exact = e.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    # uniform scaling keeps cosine exactly 1.0 bucket-stable; the double
    # cast matches the SQL twin element-wise
    pert = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 25 == 0)
        .select(
            (F.col("vec_id") + 2_000_000).alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.size("embedding")),
                lambda i: F.element_at(F.col("embedding"), i).cast("double") * 1.01,
            ).alias("embedding"),
        )
    )
    return e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")).unionByName(exact.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))).unionByName(pert)


# Band b uses hyperplanes 16*b .. 16*b+_S3_PLANES-1 from the shared
# deterministic plane family (disjoint between bands). More planes per
# band = purer buckets = a likelier true-dup representative; clones are
# sign-IDENTICAL (exact copies and uniform scalings both preserve every
# sign(w.x)), so they collide in every band at any plane count.
_S3_PLANES = 12
_S3_BANDS = 2


def _band_bucket_sql(emb: str, band: int) -> str:
    from .queries_ml import _dot_sql, _plane_sql

    terms = []
    for i in range(_S3_PLANES):
        d = _dot_sql(emb, _plane_sql(16 * band + i))
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << i} ELSE 0 END)")
    return " + ".join(terms)


def _band_bucket_col(emb, band: int):
    from .queries_ml import _plane_col, dot

    out = None
    for i in range(_S3_PLANES):
        term = F.when(dot(emb, _plane_col(16 * band + i)) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        out = term if out is None else out + term
    return out


def star_near_dup(e: DataFrame, threshold: float = 0.999) -> DataFrame:
    """Linear-shape embedding near-dup core: per band, every vector
    emits AT MOST ONE candidate link (to its band bucket's min vec_id),
    so candidate rows <= _S3_BANDS * n regardless of bucket skew; exact
    cosine then verifies each link. Input: (vec_id, embedding:double[])."""
    e = e.cache()
    bucketed = e.select(
        "vec_id",
        *[_band_bucket_col(F.col("embedding"), b).alias(f"b{b}") for b in range(_S3_BANDS)],
    )
    starred = bucketed.select(
        "vec_id",
        *[
            F.min("vec_id").over(Window.partitionBy(f"b{b}")).alias(f"bmin_{b}")
            for b in range(_S3_BANDS)
        ],
    )
    doc = F.col("vec_id")
    cands = (
        starred.select(
            doc.alias("vec_b"),
            F.explode(
                F.array(
                    *[
                        F.when(F.col(f"bmin_{b}") < doc, F.col(f"bmin_{b}"))
                        for b in range(_S3_BANDS)
                    ]
                )
            ).alias("vec_a"),
        )
        .filter(F.col("vec_a").isNotNull())
        .distinct()
    )
    ka = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    kb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cs = cosine(F.col("ea"), F.col("eb"))
    return (
        cands.join(ka, "vec_a")
        .join(kb, "vec_b")
        .select("vec_a", "vec_b", cs.alias("cs"))
        .filter(F.col("cs") >= threshold)
        .select(
            "vec_a", "vec_b", F.round(F.col("cs") + F.lit(1e-9), 4).alias("cos_sim")
        )
    )


@query(
    "s3_ann_near_dup",
    oracle=f"""
    WITH corpus0 AS ({_EMB_SQL}),
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
      FROM corpus0
    ),
    bucketed AS (
      SELECT vec_id,
             {_band_bucket_sql("embedding", 0)} AS b0,
             {_band_bucket_sql("embedding", 1)} AS b1
      FROM corpus
    ),
    starred AS (
      SELECT vec_id,
             min(vec_id) OVER (PARTITION BY b0) AS bmin_0,
             min(vec_id) OVER (PARTITION BY b1) AS bmin_1
      FROM bucketed
    ),
    cands AS (
      SELECT DISTINCT vec_a, vec_id AS vec_b FROM (
        SELECT vec_id,
               unnest([CASE WHEN bmin_0 < vec_id THEN bmin_0 END,
                       CASE WHEN bmin_1 < vec_id THEN bmin_1 END]) AS vec_a
        FROM starred
      ) WHERE vec_a IS NOT NULL
    )
    SELECT c.vec_a, c.vec_b,
           round(({_cos_sql("ka.embedding", "kb.embedding")}) + 1e-9, 4) AS cos_sim
    FROM cands c
    JOIN corpus ka ON ka.vec_id = c.vec_a
    JOIN corpus kb ON kb.vec_id = c.vec_b
    WHERE {_cos_sql("ka.embedding", "kb.embedding")} >= 0.999
    """,
)
def s3_ann_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection, scale shape (round-3 fix of the
    round-2 quadratic): {_S3_BANDS} disjoint hyperplane-LSH bands
    ({_S3_PLANES} planes each) bucket the corpus; within each band every
    vector links only to its bucket's MIN vec_id (star-to-representative
    window, the d7 pattern) instead of joining all pairs, so candidate
    rows are <= {_S3_BANDS}n by construction even when one template
    floods a bucket. Exact cosine verifies each link. Clones collide in
    every band because sign(w.x) is scale-invariant."""
    return star_near_dup(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# m2 — multi-band Hamming near-dup over an int64 phash column (the
# input_hint's phash), SQL-verifiable; the perceptual-hash PRODUCTION of
# that column from real pixels stays covered by m1 + crawl parity
# ---------------------------------------------------------------------------

_N_BANDS = 4
_BAND_BITS = 15  # md5int is 60 bits → 4 disjoint 15-bit bands
# 3 planted bit flips — at most 3 bands dirty, ≥1 band always intact
_FLIP = (1 << 3) | (1 << 17) | (1 << 33)

_PHASH_SQL = f"""
      SELECT doc_id AS image_key, {_md5int_sql("doc_id::VARCHAR")} AS phash
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, xor({_md5int_sql("doc_id::VARCHAR")}, {_FLIP})
      FROM documents WHERE doc_id % 10 = 0
"""


def _phash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    base = d.select(
        F.col("doc_id").alias("image_key"),
        md5int(F.col("doc_id").cast("string")).alias("phash"),
    )
    planted = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("image_key"),
        md5int(F.col("doc_id").cast("string"))
        .bitwiseXOR(F.lit(_FLIP))
        .alias("phash"),
    )
    return base.unionByName(planted)


# All-pairs inside a band bucket is quadratic in bucket size; a hot
# band value (all-zero phashes from blank/solid images are the classic
# case) makes one bucket carry the whole corpus. Buckets above this cap
# fall back to star-to-representative links (the d7/s3 pattern).
#
# This is a RECALL/SCALE TRADEOFF, not an equivalence: a member whose
# Hamming distance to the bucket's min-key representative exceeds
# max_hamming loses its links from this band even if it is within
# max_hamming of OTHER bucket members (it can still be recovered by
# its other bands). The trade is deliberate: oversized buckets are
# overwhelmingly near-identical floods (the 10k-identical-phash test
# shape) where the star is lossless, and the alternative — chunked
# pairing — reintroduces the quadratic term the cap exists to kill.
# The DuckDB oracle mirrors the same fallback, so parity is exact.
_MAX_BUCKET = 64


def _banded_hamming(
    imgs: DataFrame,
    band_bits: int,
    n_bands: int,
    max_hamming: int,
    max_bucket: int = _MAX_BUCKET,
) -> DataFrame:
    """Multi-band Hamming near-dup core shared by m2 (synthetic 60-bit
    hashes) and m3 (real 64-bit image phashes): per-band equi-self-join
    on the band value for buckets <= max_bucket, star links to the
    bucket's min image_key for oversized (skewed) buckets, union,
    distinct, exact bit_count(xor) verify."""
    mask = (1 << band_bits) - 1

    def band(col, k):
        return F.shiftrightunsigned(col, k * band_bits).bitwiseAND(F.lit(mask))

    cands = None
    for k in range(n_bands):
        w = Window.partitionBy("bv")
        bk = (
            imgs.select("image_key", "phash", band(F.col("phash"), k).alias("bv"))
            .withColumn("sz", F.count("*").over(w))
            .withColumn("mn", F.min(F.struct("image_key", "phash")).over(w))
        )
        small_a = bk.filter(F.col("sz") <= max_bucket).alias("a")
        small_b = bk.filter(F.col("sz") <= max_bucket).alias("b")
        pairs = small_a.join(
            small_b,
            (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.image_key") < F.col("b.image_key")),
        ).select(
            F.col("a.image_key").alias("img_a"),
            F.col("b.image_key").alias("img_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        stars = bk.filter(
            (F.col("sz") > max_bucket) & (F.col("image_key") > F.col("mn.image_key"))
        ).select(
            F.col("mn.image_key").alias("img_a"),
            F.col("image_key").alias("img_b"),
            F.col("mn.phash").alias("ph_a"),
            F.col("phash").alias("ph_b"),
        )
        part = pairs.unionByName(stars)
        cands = part if cands is None else cands.unionByName(part)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cands.distinct()
        .select("img_a", "img_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _band_cte_sql(k: int, bits: int = _BAND_BITS) -> str:
    """Per-band CTE mirroring _banded_hamming's window stage: band
    value, bucket size, and the bucket representative (min image_key
    and ITS phash). Arithmetic >> equals logical shift here because the
    mask discards every sign-extended bit (mask < 2^(64-shift))."""
    bexpr = f"((phash >> {k * bits}) & {(1 << bits) - 1})"
    return f"""bk{k} AS (
      SELECT image_key, phash, {bexpr} AS bv,
             count(*) OVER (PARTITION BY {bexpr}) AS sz,
             min(image_key) OVER (PARTITION BY {bexpr}) AS bmin,
             arg_min(phash, image_key) OVER (PARTITION BY {bexpr}) AS bph
      FROM imgs
    )"""


def _band_union_sql(k: int) -> str:
    """small buckets -> all pairs; oversized -> star-to-representative
    (identical semantics to _banded_hamming's Spark plan)."""
    return f"""
        SELECT a.image_key AS img_a, b.image_key AS img_b,
               a.phash AS ph_a, b.phash AS ph_b
        FROM bk{k} a JOIN bk{k} b
          ON a.bv = b.bv AND a.image_key < b.image_key
        WHERE a.sz <= {_MAX_BUCKET}
        UNION ALL
        SELECT bmin AS img_a, image_key AS img_b, bph AS ph_a, phash AS ph_b
        FROM bk{k} WHERE sz > {_MAX_BUCKET} AND image_key > bmin"""


@query(
    "m2_phash_near_dup",
    oracle=f"""
    WITH imgs AS ({_PHASH_SQL}),
    {", ".join(_band_cte_sql(k) for k in range(_N_BANDS))},
    cands AS (
      SELECT DISTINCT img_a, img_b, ph_a, ph_b FROM (
        {" UNION ALL ".join(_band_union_sql(k) for k in range(_N_BANDS))}
      )
    )
    SELECT img_a, img_b, bit_count(xor(ph_a, ph_b)) AS hamming
    FROM cands
    WHERE bit_count(xor(ph_a, ph_b)) <= 8
    """,
)
def m2_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup scan, scale path: 4 disjoint 15-bit LSH
    bands (≤3 flipped bits can dirty at most 3 bands, so recall is
    guaranteed and no single band carries the whole corpus — the
    round-1 single-top-byte band both under-recalled and skewed), then
    exact Hamming via bit_count(xor). All JVM-side."""
    return _banded_hamming(
        _phash_table(spark, sf_dir), _BAND_BITS, _N_BANDS, max_hamming=8
    )


# m3 materializes the Arrow stage's real phashes to parquet so BOTH
# engines can run the banded-Hamming join over the same rows (round-2
# VERDICT item 4: converts "trust the tests" into a hard CORRECTNESS
# row for everything except the numpy kernel itself, which stays pinned
# by m1's in-stage invariants + crawl parity). The query rewrites the
# parquet at call time (the table is a pure function of the seed and is
# doc-capped, so it is identical at every sf), then reads it back.
# Paths are pid-scoped with atexit cleanup and a documented
# query-before-oracle ordering contract — see matpaths.py.
from .matpaths import mat_path as _mat_path

_M3_MAT = _mat_path("m3_phash")
_M3_BITS = 16
_M3_MAXHAM = 16


@query(
    "m3_phash_image_near_dup",
    oracle=f"""
    WITH imgs AS (
      SELECT image_key, phash FROM read_parquet('{_M3_MAT}/*.parquet')
    ),
    {", ".join(_band_cte_sql(k, _M3_BITS) for k in range(_N_BANDS))},
    cands AS (
      SELECT DISTINCT img_a, img_b, ph_a, ph_b FROM (
        {" UNION ALL ".join(_band_union_sql(k) for k in range(_N_BANDS))}
      )
    )
    SELECT img_a, img_b, bit_count(xor(ph_a, ph_b)) AS hamming
    FROM cands
    WHERE bit_count(xor(ph_a, ph_b)) <= {_M3_MAXHAM}
    """,
)
def m3_phash_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-band Hamming scan over REAL perceptual hashes produced
    by the Arrow image stage (numpy DCT phash of synthesized pixels).
    The Arrow output is materialized to parquet and the banded join runs
    in both engines over that table — only the numpy kernel itself is
    outside the oracle (verified by m1's in-stage invariants + parity)."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir).select(
        F.col("image_id").alias("image_key"), "phash"
    )
    imgs.write.mode("overwrite").parquet(_M3_MAT)
    return _banded_hamming(
        spark.read.parquet(_M3_MAT),
        band_bits=_M3_BITS,
        n_bands=_N_BANDS,
        max_hamming=_M3_MAXHAM,
    )


# m7 — the same banded-Hamming core over AUDIO fingerprints, closing
# the near-dup family across modalities (text d7, embeddings s3,
# images m2/m3, audio m7). The fingerprint is energy-delta signs
# (operators/media.audio_fingerprint64) — invariant under uniform gain,
# locally stable under additive noise — produced in an Arrow stage and
# materialized so the join runs in both engines (the m3 pattern).
_M7_MAT = _mat_path("m7_audiofp")
_M7_MAXHAM = 16


@query(
    "m7_audio_near_dup",
    oracle=f"""
    WITH imgs AS (
      SELECT image_key, phash FROM read_parquet('{_M7_MAT}/*.parquet')
    ),
    {", ".join(_band_cte_sql(k, _M3_BITS) for k in range(_N_BANDS))},
    cands AS (
      SELECT DISTINCT img_a, img_b, ph_a, ph_b FROM (
        {" UNION ALL ".join(_band_union_sql(k) for k in range(_N_BANDS))}
      )
    )
    SELECT img_a, img_b, bit_count(xor(ph_a, ph_b)) AS hamming
    FROM cands
    WHERE bit_count(xor(ph_a, ph_b)) <= {_M7_MAXHAM}
    """,
)
def m7_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup: pcm16 clips → 64-bit energy-delta fingerprints
    (Arrow stage; stubs skipped) with planted twins — every 4th clip a
    re-levelled copy (uniform 1.02 gain → IDENTICAL fingerprint, the
    guaranteed catch) and every 10th a gain+noise copy (a few near-tied
    bits flip — the realistic catch) — then the shared 4×16-bit banded
    Hamming join over the materialized table in both engines."""

    def fp_batches(it):
        import numpy as np
        import pandas as pd

        from .operators.media import AUDIO_STUB_FMTS, audio_fingerprint64, decode_audio

        for pdf in it:
            out = {"image_key": [], "phash": []}
            for aid, buf, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt in AUDIO_STUB_FMTS:
                    continue
                x, _rate = decode_audio(bytes(buf), fmt)
                out["image_key"].append(aid)
                out["phash"].append(audio_fingerprint64(x))
                doc = int(aid.rsplit("-", 1)[1])
                if doc % 4 == 0:
                    out["image_key"].append(f"{aid}~gain")
                    out["phash"].append(audio_fingerprint64(x.astype(np.float32) * 1.02))
                if doc % 10 == 3:
                    rng = np.random.Generator(np.random.PCG64(doc + 777))
                    noisy = x.astype(np.float32) * 1.02 + rng.normal(
                        0, 120, len(x)
                    ).astype(np.float32)
                    out["image_key"].append(f"{aid}~noise")
                    out["phash"].append(audio_fingerprint64(noisy))
            yield pd.DataFrame(out)

    from .queries_multimodal import _audio_table

    fps = _audio_table(spark, sf_dir).mapInPandas(
        fp_batches, "image_key string, phash long"
    )
    fps.write.mode("overwrite").parquet(_M7_MAT)
    return _banded_hamming(
        spark.read.parquet(_M7_MAT),
        band_bits=_M3_BITS,
        n_bands=_N_BANDS,
        max_hamming=_M7_MAXHAM,
    )


# m8 — cross-modal consistency audit (the LAION-style cleaning op for
# image+caption training pairs): groups of images sharing a caption
# whose PIXELS diverge. Same-caption near-identical images are benign
# dups; same-caption visually-different images are mislabeled pairs a
# curation run wants flagged. Shape: star-to-representative per
# caption group (min_by aggregate + one equi-join back — linear in
# group size, never within-group all-pairs), hamming on the real
# Arrow-stage phashes, materialized so both engines run the audit.
_M8_MAT = _mat_path("m8_capimg")
_M8_MAXHAM = 16


@query(
    "m8_caption_image_mismatch",
    oracle=f"""
    WITH t AS (
      SELECT image_id, caption, phash FROM read_parquet('{_M8_MAT}/*.parquet')
    ),
    rep AS (
      SELECT caption, min_by(phash, image_id) AS rep_phash
      FROM t GROUP BY caption
    ),
    j AS (
      SELECT t.caption, t.phash,
             bit_count(xor(t.phash, r.rep_phash))::INT AS ham
      FROM t JOIN rep r ON r.caption = t.caption
    )
    SELECT caption,
           count(*)::BIGINT AS n_images,
           count(DISTINCT phash)::BIGINT AS n_distinct_phash,
           max(ham) AS max_ham_to_rep,
           sum(CASE WHEN ham > {_M8_MAXHAM} THEN 1 ELSE 0 END)::BIGINT
             AS n_mismatch
    FROM j GROUP BY caption HAVING count(*) >= 2
    """,
)
def m8_caption_image_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption↔image consistency audit: per shared caption, how many
    images, how many distinct phashes, and how many sit beyond the
    near-dup threshold (_M8_MAXHAM = 16 Hamming bits) from the group
    representative (min_by image_id) —
    the rows a curation pass would drop as mislabeled pairs. The
    multi-image docs in the synthetic corpus produce natural
    same-caption different-pixel groups, so the mismatch column is
    exercised without planting."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir).select("image_id", "caption", "phash")
    imgs.write.mode("overwrite").parquet(_M8_MAT)
    t = spark.read.parquet(_M8_MAT)
    rep = t.groupBy("caption").agg(
        F.min_by("phash", "image_id").alias("rep_phash")
    )
    ham = F.bit_count(
        F.col("phash").bitwiseXOR(F.col("rep_phash"))
    ).cast("int")
    j = t.join(rep, "caption").select("caption", "phash", ham.alias("ham"))
    return (
        j.groupBy("caption")
        .agg(
            F.count("*").alias("n_images"),
            F.countDistinct("phash").alias("n_distinct_phash"),
            F.max("ham").alias("max_ham_to_rep"),
            F.sum(F.when(F.col("ham") > _M8_MAXHAM, 1).otherwise(0)).alias(
                "n_mismatch"
            ),
        )
        .filter(F.col("n_images") >= 2)
    )


# ---------------------------------------------------------------------------
# s4 — IVF ANN: k-means coarse quantizer (deterministic seed = first K
# vectors), probes scan the inverted lists of their nprobe nearest
# centroids. K, iters, nprobe and topk are parameters of ivf_ann();
# the oracle pins them to deterministic settings (K=8, 2 Lloyd
# iterations, nprobe=2). At cluster scale K grows ~sqrt(n) so each
# inverted list stays ~sqrt(n) and probe cost is nprobe*n/K.
# ---------------------------------------------------------------------------

_IVF_K = 8
_IVF_ITERS = 2
_IVF_NPROBE = 2


def _sql_assign(base: str, cents: str, nprobe: int = 1) -> str:
    """argmax-cosine cell assignment (rounded similarity + cid tiebreak
    so FP noise can never flip the winner across engines); nprobe>1
    keeps the nprobe best cells."""
    cos = _cos_sql("b.e", "c.c")
    return f"""
      SELECT vec_id, e, cid FROM (
        SELECT b.vec_id, b.e, c.cid,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY round(({cos}) + 1e-9, 6) DESC, c.cid) AS rk
        FROM {base} b CROSS JOIN {cents} c
      ) WHERE rk <= {nprobe}
    """


def _sql_recenter(assigned: str) -> str:
    """element-wise centroid mean, rounded to 4 decimals (+eps) so the
    next iteration sees IDENTICAL centroids on both engines regardless
    of each engine's summation order."""
    return f"""
      SELECT cid, list(m ORDER BY pos) AS c FROM (
        SELECT cid, pos, round(avg(v) + 1e-9, 4) AS m FROM (
          SELECT cid, unnest(e) AS v, generate_subscripts(e, 1) AS pos
          FROM {assigned}
        ) GROUP BY cid, pos
      ) GROUP BY cid
    """


_IVF_SQL = f"""
    base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < {_IVF_K}),
    a1 AS ({_sql_assign("base", "c0")}),
    c1 AS ({_sql_recenter("a1")}),
    a2 AS ({_sql_assign("base", "c1")}),
    c2 AS ({_sql_recenter("a2")}),
    cells AS ({_sql_assign("base", "c2")}),
    pbase AS (SELECT * FROM base WHERE vec_id < 5),
    pcells AS ({_sql_assign("pbase", "c2", _IVF_NPROBE)})
"""


def _df_assign(base: DataFrame, cents: DataFrame, nprobe: int = 1) -> DataFrame:
    """argmax-cosine cell assignment vs the broadcast K-row centroid
    dim; nprobe>1 keeps the nprobe best cells (probe-side multi-list
    scan). Rounded similarity + cid tiebreak: engine-identical."""
    b, c = base.alias("b"), F.broadcast(cents).alias("c")
    cos = cosine(F.col("b.e"), F.col("c.c"))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(cos + F.lit(1e-9), 6)), F.col("cid")
    )
    return (
        b.crossJoin(c)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= nprobe)
        .select("vec_id", "e", "cid")
    )


def _df_recenter(assigned: DataFrame) -> DataFrame:
    exploded = assigned.select("cid", F.posexplode("e").alias("pos", "v"))
    means = exploded.groupBy("cid", "pos").agg(
        F.round(F.avg("v") + F.lit(1e-9), 4).alias("m")
    )
    return means.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda x: x["m"]
        ).alias("c")
    )


def _seed_centroids(base: DataFrame, k_cells: int, seeding: str) -> DataFrame:
    """Initial centroid dim (cid, c) — K rows.

    'first' (the oracle's pinned deterministic setting): the first
    k_cells vector ids. Fine for the SQL-twin gate, but biased at
    production scale when ids correlate with content (e.g. clone
    blocks ingested together seed every centroid inside one cluster).

    'sampled' (the scale default): a deterministic hash-ordered sample
    — the k vectors with the smallest xxhash64(vec_id), i.e. a uniform
    pseudo-random draw independent of id locality. Spark executes the
    orderBy().limit(k) as per-partition top-k + driver merge
    (TakeOrderedAndProject), never a global sort; the cid relabel
    window runs over just K rows. k-means|| is the upgrade path if the
    K-row driver merge itself ever bounds (K ~ 1e5 at n = 1e10 is
    still fine)."""
    if seeding == "first":
        return base.filter(F.col("vec_id") < k_cells).select(
            F.col("vec_id").alias("cid"), F.col("e").alias("c")
        )
    assert seeding == "sampled", seeding
    picks = (
        base.select("vec_id", "e", F.xxhash64("vec_id").alias("__r"))
        .orderBy("__r", "vec_id")
        .limit(k_cells)
    )
    w = Window.partitionBy(F.lit(1)).orderBy("__r", "vec_id")  # K rows only
    return picks.select(
        (F.row_number().over(w) - 1).alias("cid"), F.col("e").alias("c")
    )


def ivf_ann(
    base: DataFrame,
    probes: DataFrame,
    k_cells: int | None = _IVF_K,
    iters: int = _IVF_ITERS,
    nprobe: int = _IVF_NPROBE,
    topk: int = 3,
    seeding: str | None = None,
) -> DataFrame:
    """IVF approximate NN core (the other scale path next to s2's LSH).
    K-means coarse quantizer: deterministic seeds ('first' = the
    oracle's pinned first-K setting, 'sampled' = hash-ordered uniform
    draw for production — see _seed_centroids), `iters` Lloyd
    iterations where assignment is a broadcast cross-join against the
    K-row centroid dim and re-centering is a posexplode/groupBy mean.
    k_cells=None auto-sizes K = ceil(sqrt(n)) (one count job) — the
    standard IVF operating point balancing list length n/K against the
    K-centroid probe scan — and forces sampled seeding (first-K is
    undefined for auto-K when ids aren't dense from 0). Every vector lands in ONE inverted list;
    each probe scans the lists of its `nprobe` nearest centroids
    (equi-join on cell id — probe cost nprobe*n/K, never all-pairs).
    Rounded similarities + centroid-id tiebreaks make every assignment
    decision identical across engines despite FP summation order.
    Inputs: (vec_id, e:double[]). Output: probe_id, neighbor_id, sim."""
    if k_cells is None:
        import math

        # auto-K REQUIRES sampled seeding: 'first' filters vec_id < K,
        # which matches too few (possibly zero) rows when ids are not
        # dense from 0 — an empty centroid dim would silently return an
        # empty result. seeding=None means auto; an EXPLICIT 'first'
        # with auto-K is a caller error, not something to override
        # silently (round-4 advice).
        if seeding == "first":
            raise ValueError(
                "ivf_ann: seeding='first' is undefined with k_cells=None "
                "(auto-K); pass an explicit k_cells or seeding='sampled'"
            )
        k_cells = max(2, math.ceil(math.sqrt(base.count())))
        seeding = "sampled"
    elif seeding is None:
        seeding = "first"  # the oracle's pinned deterministic setting
    cents = _seed_centroids(base, k_cells, seeding)
    for _ in range(iters):
        cents = _df_recenter(_df_assign(base, cents))
    cells = _df_assign(base, cents).cache()
    p = _df_assign(probes, cents, nprobe=nprobe).alias("p")
    x = cells.alias("x")
    cs = cosine(F.col("p.e"), F.col("x.e"))
    ranked = (
        p.join(
            x,
            (F.col("x.cid") == F.col("p.cid")) & (F.col("x.vec_id") != F.col("p.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("probe_id"),
            F.col("x.vec_id").alias("neighbor_id"),
            cs.alias("cs"),
        )
        .withColumn("rk", F.row_number().over(Window.partitionBy("probe_id").orderBy(
            F.desc(F.round(F.col("cs") + F.lit(1e-9), 6)), "neighbor_id")))
        .filter(F.col("rk") <= topk)
    )
    return ranked.select(
        "probe_id", "neighbor_id", F.round(F.col("cs") + F.lit(1e-9), 4).alias("sim")
    )


@query(
    "s4_ivf_ann",
    oracle=f"""
    WITH {_IVF_SQL}
    SELECT probe_id, neighbor_id, round((cs) + 1e-9, 4) AS sim
    FROM (
      SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id,
             {_cos_sql("p.e", "x.e")} AS cs,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(({_cos_sql("p.e", "x.e")}) + 1e-9, 6) DESC,
                        x.vec_id) AS rk
      FROM pcells p
      JOIN cells x ON x.cid = p.cid AND x.vec_id != p.vec_id
    ) WHERE rk <= 3
    """,
)
def s4_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN at the oracle's deterministic settings (K=_IVF_K=8,
    _IVF_ITERS=2 Lloyd iterations, nprobe=_IVF_NPROBE=2, top-3): probes
    scan the inverted lists of their two nearest centroids. See
    ivf_ann() for the parameterized core; tests/test_plans.py measures
    recall@3 vs s1's brute-force ground truth."""
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    probes = base.filter(F.col("vec_id") < 5)
    return ivf_ann(base, probes)


# ---------------------------------------------------------------------------
# t5 — the full corpus-preparation pipeline a training-data run chains:
# quality filter → language ID → exact dedup → near-dup removal → kept
# corpus. Each stage is the already-verified operator (t1's quality
# exprs, t2's stopword-hit argmax, d1's fingerprint keeper, d7's
# star-to-representative LSH) composed into ONE Catalyst plan, the way
# C4/RefinedWeb-style preps run them in sequence.
# ---------------------------------------------------------------------------

_T5_MIN_TOKENS = 20
# Gopher-style repetition rule: distinct-token ratio (the corpus is
# all-lowercase a-z so alphabetic ratio can't discriminate — measured
# ≡1.0; distinct/total spans 0.28-1.0 with p50 0.46)
_T5_MIN_DISTINCT_RATIO = 0.35

_T5_LANGS = ("de", "en", "es", "fr")


def _t5_hits_sql(lang: str) -> str:
    from .queries_ml import _LANG_MARKERS

    arr = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_intersect(toks, [{arr}]))"


_T5_SQL = f"""
    corpus AS ({_MUT_SQL}),
    q AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM corpus WHERE length(text) > 0
    ),
    ql AS (
      SELECT doc_id, text, len(toks) AS n_tokens,
             {_t5_hits_sql("de")} AS de_hits, {_t5_hits_sql("en")} AS en_hits,
             {_t5_hits_sql("es")} AS es_hits, {_t5_hits_sql("fr")} AS fr_hits
      FROM q
      WHERE len(toks) >= {_T5_MIN_TOKENS}
        AND len(list_distinct(toks))::DOUBLE / len(toks)
              >= {_T5_MIN_DISTINCT_RATIO}
    ),
    lang AS (
      SELECT doc_id, text, n_tokens,
             CASE
               WHEN de_hits >= en_hits AND de_hits >= es_hits
                    AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
               WHEN en_hits >= es_hits AND en_hits >= fr_hits
                    AND en_hits > 0 THEN 'en'
               WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
               WHEN fr_hits > 0 THEN 'fr'
               ELSE 'und'
             END AS pred_lang
      FROM ql
    ),
    kept_lang AS (SELECT * FROM lang WHERE pred_lang != 'und'),
    exact AS (
      SELECT doc_id, text, n_tokens, pred_lang, fp,
             min(doc_id) OVER (PARTITION BY fp) AS fp_keeper
      FROM (SELECT *, {_md5int_sql(_NORM_SQL)} AS fp FROM kept_lang)
    ),
    uniq AS (SELECT * FROM exact WHERE doc_id = fp_keeper),
    grams AS (SELECT doc_id, {_GH_SQL} AS g FROM uniq),
    sigs AS (SELECT doc_id, g, {_SIG_SQL} FROM grams),
    starred AS (
      SELECT doc_id, g,
             min(doc_id) OVER (PARTITION BY {_B1_KEY}) AS bmin_1,
             min(doc_id) OVER (PARTITION BY {_B2_KEY}) AS bmin_2
      FROM sigs
    ),
    cands AS (
      SELECT doc_id AS dup_id, g,
             least(CASE WHEN bmin_1 < doc_id THEN bmin_1 END,
                   CASE WHEN bmin_2 < doc_id THEN bmin_2 END) AS keeper
      FROM starred
    ),
    dropped AS (
      SELECT c.dup_id
      FROM (SELECT * FROM cands WHERE keeper IS NOT NULL) c
      JOIN grams k ON k.doc_id = c.keeper
      WHERE CASE WHEN len(c.g) + len(k.g) - len(list_intersect(c.g, k.g)) > 0
                 THEN len(list_intersect(c.g, k.g))::DOUBLE
                      / (len(c.g) + len(k.g) - len(list_intersect(c.g, k.g)))
            END >= 0.6
    )
"""


@query(
    "t5_corpus_prep",
    oracle=f"""
    WITH {_T5_SQL}
    SELECT u.doc_id, u.pred_lang, u.n_tokens, u.fp
    FROM uniq u LEFT JOIN dropped d ON d.dup_id = u.doc_id
    WHERE d.dup_id IS NULL
    """,
)
def t5_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus prep over the planted-duplicate corpus:
    quality gate (≥20 tokens, Gopher-style distinct-token ratio ≥
    0.35) → stopword-hit langid
    (drop 'und') → exact dedup (min-doc_id keeper per normalized-text
    fingerprint) → near-dup removal (d7's star-to-representative LSH +
    exact Jaccard ≥ 0.6) → the kept corpus. One plan; the only joins
    are the Jaccard-verify equi-join on the single candidate link per
    doc and the final anti-join against the dropped set — never
    all-pairs, so the chain keeps d7's linear scale shape."""
    from .queries_ml import _LANG_MARKERS, tokens

    corpus = _mut(spark, sf_dir).filter(F.length("text") > 0)
    toks = tokens(F.col("text"))
    q = corpus.select(
        "doc_id", "text", toks.alias("toks"), F.size(toks).alias("n_tokens")
    ).filter(
        (F.col("n_tokens") >= _T5_MIN_TOKENS)
        & (
            F.size(F.array_distinct(F.col("toks"))).cast("double")
            / F.col("n_tokens")
            >= _T5_MIN_DISTINCT_RATIO
        )
    )
    hits = {
        lang: F.size(
            F.array_intersect(F.col("toks"), F.array(*[F.lit(w) for w in _LANG_MARKERS[lang]]))
        )
        for lang in _T5_LANGS
    }
    de, en, es, fr = (hits[lang] for lang in _T5_LANGS)
    pred = (
        F.when((de >= en) & (de >= es) & (de >= fr) & (de > 0), "de")
        .when((en >= es) & (en >= fr) & (en > 0), "en")
        .when((es >= fr) & (es > 0), "es")
        .when(fr > 0, "fr")
        .otherwise("und")
    )
    lang = q.select("doc_id", "text", "n_tokens", pred.alias("pred_lang")).filter(
        F.col("pred_lang") != "und"
    )
    w_fp = Window.partitionBy("fp")
    uniq = (
        lang.withColumn("fp", md5int(norm_text(F.col("text"))))
        .withColumn("fp_keeper", F.min("doc_id").over(w_fp))
        .filter(F.col("doc_id") == F.col("fp_keeper"))
    )
    grams = (
        uniq.withColumn("__norm", norm_text(F.col("text")))
        .select(
            "doc_id",
            "pred_lang",
            "n_tokens",
            "fp",
            F.array_distinct(
                F.transform(char_3grams(F.col("__norm")), lambda s: md5int(s))
            ).alias("g"),
        )
        .cache()
    )
    # g-free band-min pass (the d7 shuffle-volume fix): signatures only
    # through the windows; gram arrays re-joined for the candidate set
    sigs = grams.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("g"), (lambda ck: (lambda h: h.bitwiseXOR(F.lit(ck))))(_C[k]))
            ).alias(f"mh_{k}")
            for k in range(_D7_PERMS)
        ],
    )
    w1 = Window.partitionBy(*[f"mh_{k}" for k in range(0, 4)])
    w2 = Window.partitionBy(*[f"mh_{k}" for k in range(4, 8)])
    doc = F.col("doc_id")
    cands = (
        sigs.withColumn("bmin_1", F.min("doc_id").over(w1))
        .withColumn("bmin_2", F.min("doc_id").over(w2))
        .select(
            doc.alias("dup_id"),
            F.least(
                F.when(F.col("bmin_1") < doc, F.col("bmin_1")),
                F.when(F.col("bmin_2") < doc, F.col("bmin_2")),
            ).alias("keeper"),
        )
        .filter(F.col("keeper").isNotNull())
    )
    gd = grams.select(F.col("doc_id").alias("dup_id"), "g")
    k = grams.select(F.col("doc_id").alias("keeper"), F.col("g").alias("kg"))
    inter = F.size(F.array_intersect(F.col("g"), F.col("kg")))
    union_n = F.size(F.col("g")) + F.size(F.col("kg")) - inter
    jac = F.when(union_n > 0, inter.cast("double") / union_n)
    dropped = (
        cands.join(gd, "dup_id")
        .join(k, "keeper")
        .select("dup_id", jac.alias("jac"))
        .filter(F.col("jac") >= 0.6)
        .select(F.col("dup_id").alias("doc_id"))
    )
    return grams.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "pred_lang", "n_tokens", "fp"
    )


# ---------------------------------------------------------------------------
# t6 — PII-style redaction, the standard corpus-scrub stage between
# quality filtering and dedup in a training-data prep (emails/phone
# numbers replaced with fixed tags + per-doc counts for audit). The
# corpus is synthetic lowercase prose, so deterministic contact lines
# are planted per doc-id residue to exercise both patterns; regexes
# stick to character classes + bounded quantifiers so Java regex
# (Spark) and RE2-ish (DuckDB) agree byte-for-byte, and the redacted
# text is compared via its portable hash.
# ---------------------------------------------------------------------------

_T6_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+[.][a-z][a-z]+"
_T6_PHONE = "[+][0-9]{2}[ ][0-9]{3}[ ][0-9]{5,9}"

_T6_PLANT_SQL = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || doc_id || '@mail-' || (doc_id % 7) || '.example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' tel +49 030 ' || (10000 + doc_id % 80000)
                     ELSE '' END AS text
      FROM documents
"""


@query(
    "t6_redact_pii",
    oracle=f"""
    WITH planted AS ({_T6_PLANT_SQL}),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(text, '{_T6_EMAIL}', '<EMAIL>', 'g'),
               '{_T6_PHONE}', '<PHONE>', 'g') AS rtext,
             len(regexp_extract_all(text, '{_T6_EMAIL}'))::INT AS n_emails,
             len(regexp_extract_all(text, '{_T6_PHONE}'))::INT AS n_phones
      FROM planted
    )
    SELECT doc_id, n_emails, n_phones,
           length(rtext)::INT AS redacted_len,
           {_md5int_sql("rtext")} AS redacted_fp
    FROM red
    WHERE n_emails > 0 OR n_phones > 0
    """,
)
def t6_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact contact-info spans (emails, phone numbers) and report
    per-doc counts — the PII-scrub pass a corpus prep runs before
    dedup. Pure JVM regex expressions (no UDF, no shuffle until the
    filter); the redacted text itself is pinned across engines by its
    portable 60-bit hash."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail-"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" tel +49 030 "),
                    (10000 + F.col("doc_id") % 80000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    rtext = F.regexp_replace(
        F.regexp_replace(F.col("text"), _T6_EMAIL, "<EMAIL>"),
        _T6_PHONE,
        "<PHONE>",
    )
    red = d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_T6_EMAIL), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_T6_PHONE), F.lit(0))).alias(
            "n_phones"
        ),
        F.length(rtext).alias("redacted_len"),
        md5int(rtext).alias("redacted_fp"),
    )
    return red.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0))


# ---------------------------------------------------------------------------
# t7 — COMPONENT-level corpus dedup (round-4 verdict item 4): t5/d7
# drop docs via single-pass keeper links, but a production prep keeps
# exactly ONE doc per duplicate CLUSTER — the transitive closure d8
# computes. t7 chains d8's components back onto the corpus: every doc
# whose component representative (min id) it is survives, with the
# cluster size for audit. Plan stays linear: d7's banded links →
# O(log n) star rounds → one left join + one groupBy.
# ---------------------------------------------------------------------------


@query(
    "t7_transitive_corpus_dedup",
    oracle=f"""
    WITH RECURSIVE {_D7_CHAIN_SQL},
    dlinks AS (
      SELECT dup_id, keeper FROM verified WHERE jac >= 0.6
    ),
    nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT dup_id AS doc_id FROM dlinks
        UNION ALL SELECT keeper FROM dlinks
      )
    ),
    cedges AS (
      SELECT dup_id AS a, keeper AS b FROM dlinks
      UNION SELECT keeper, dup_id FROM dlinks
    ),
    reach AS (
      SELECT doc_id, doc_id AS label FROM nodes
      UNION
      SELECT e.a AS doc_id, r.label
      FROM reach r JOIN cedges e ON e.b = r.doc_id
    ),
    comp AS (SELECT doc_id, min(label) AS component FROM reach GROUP BY doc_id),
    allc AS (
      SELECT c.doc_id, coalesce(p.component, c.doc_id) AS component
      FROM corpus c LEFT JOIN comp p ON p.doc_id = c.doc_id
    )
    SELECT component AS doc_id, count(*)::INT AS cluster_size
    FROM allc GROUP BY component
    """,
)
def t7_transitive_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep one doc per duplicate CLUSTER: d8's connected components
    (small-star/large-star over d7's verified near-dup links) mapped
    back onto the full corpus — docs outside the link graph are their
    own singleton cluster. Returns the kept representative ids with
    their cluster sizes (the dedup audit a curation run reports).
    Oracle: exact recursive-CTE reachability, identical by the
    component-minimum graph invariant."""
    from .operators.graph import star_components

    links = d7_dedup_pipeline(spark, sf_dir).select("dup_id", "keeper")
    comps = star_components(links, a="dup_id", b="keeper").withColumnRenamed(
        "node", "doc_id"
    )
    corpus_ids = _mut(spark, sf_dir).select("doc_id")
    allc = corpus_ids.join(comps, "doc_id", "left").select(
        F.coalesce("component", F.col("doc_id")).alias("component")
    )
    return (
        allc.groupBy("component")
        .agg(F.count(F.lit(1)).cast("int").alias("cluster_size"))
        .select(F.col("component").alias("doc_id"), "cluster_size")
    )


# ---------------------------------------------------------------------------
# s5 — COMPONENT-level embedding dedup (the t7 pattern on the vector
# side): s3's verified near-dup links → small-star/large-star
# components → one representative vector per duplicate cluster with
# the cluster size. The curation shape for embedding-dedup at corpus
# scale (SemDeDup-style): candidate links stay ≤ BANDS·n, the closure
# is O(log n) rounds, and the final pass is one left join + groupBy.
# ---------------------------------------------------------------------------

_S5_LINKS_SQL = f"""
    corpus0 AS ({_EMB_SQL}),
    ecorpus AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
      FROM corpus0
    ),
    ebucketed AS (
      SELECT vec_id,
             {_band_bucket_sql("embedding", 0)} AS b0,
             {_band_bucket_sql("embedding", 1)} AS b1
      FROM ecorpus
    ),
    estarred AS (
      SELECT vec_id,
             min(vec_id) OVER (PARTITION BY b0) AS bmin_0,
             min(vec_id) OVER (PARTITION BY b1) AS bmin_1
      FROM ebucketed
    ),
    ecands AS (
      SELECT DISTINCT vec_a, vec_id AS vec_b FROM (
        SELECT vec_id,
               unnest([CASE WHEN bmin_0 < vec_id THEN bmin_0 END,
                       CASE WHEN bmin_1 < vec_id THEN bmin_1 END]) AS vec_a
        FROM estarred
      ) WHERE vec_a IS NOT NULL
    ),
    elinks AS (
      SELECT c.vec_a, c.vec_b
      FROM ecands c
      JOIN ecorpus ka ON ka.vec_id = c.vec_a
      JOIN ecorpus kb ON kb.vec_id = c.vec_b
      WHERE {_cos_sql("ka.embedding", "kb.embedding")} >= 0.999
    )
"""


@query(
    "s5_embedding_cluster_dedup",
    oracle=f"""
    WITH RECURSIVE {_S5_LINKS_SQL},
    enodes AS (
      SELECT DISTINCT vec_id FROM (
        SELECT vec_a AS vec_id FROM elinks
        UNION ALL SELECT vec_b FROM elinks
      )
    ),
    eedges AS (
      SELECT vec_a AS a, vec_b AS b FROM elinks
      UNION SELECT vec_b, vec_a FROM elinks
    ),
    ereach AS (
      SELECT vec_id, vec_id AS label FROM enodes
      UNION
      SELECT e.a AS vec_id, r.label
      FROM ereach r JOIN eedges e ON e.b = r.vec_id
    ),
    ecomp AS (SELECT vec_id, min(label) AS component FROM ereach GROUP BY vec_id),
    eallc AS (
      SELECT c.vec_id, coalesce(p.component, c.vec_id) AS component
      FROM ecorpus c LEFT JOIN ecomp p ON p.vec_id = c.vec_id
    )
    SELECT component AS vec_id, count(*)::INT AS cluster_size
    FROM eallc GROUP BY component
    """,
)
def s5_embedding_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep one EMBEDDING per duplicate cluster: connected components
    (small-star/large-star) over s3's cosine-verified near-dup links,
    mapped back onto the full vector corpus — vectors outside the link
    graph are their own singleton cluster. Output: representative
    vec_id + cluster size. Oracle: exact recursive-CTE reachability
    (component minima are algorithm-invariant)."""
    from .operators.graph import star_components

    links = s3_ann_near_dup(spark, sf_dir).select("vec_a", "vec_b")
    comps = star_components(links, a="vec_a", b="vec_b").withColumnRenamed(
        "node", "vec_id"
    )
    corpus_ids = _emb(spark, sf_dir).select("vec_id")
    allc = corpus_ids.join(comps, "vec_id", "left").select(
        F.coalesce("component", F.col("vec_id")).alias("component")
    )
    return (
        allc.groupBy("component")
        .agg(F.count(F.lit(1)).cast("int").alias("cluster_size"))
        .select(F.col("component").alias("vec_id"), "cluster_size")
    )


# ---------------------------------------------------------------------------
# t8 — benchmark decontamination scan (the GPT-3/PaLM-style eval-overlap
# pass a training-data pipeline runs LAST): flag every corpus document
# sharing a full token 5-gram with any eval-set item. The eval set is
# derived deterministically from the corpus itself (an 8-token window
# of every 37th doc — simulating benchmark questions that leaked from
# the same distribution), so no external data is needed and leakage is
# guaranteed to exist: each source doc plus its template near-dups.
#
# 100 TB shape: eval benchmarks are tiny (10^4-10^6 items) next to the
# corpus, so their exploded gram table BROADCASTS; the corpus side
# explodes per-doc distinct grams map-side and only MATCHED rows reach
# the per-doc aggregation — no corpus-wide shuffle, no all-pairs
# anything. The reference has no counterpart (this is the LLM-pipeline
# operator family, SURVEY §6).
# ---------------------------------------------------------------------------

_T8_N = 5  # tokens per contamination shingle
_T8_EVERY = 37  # every Nth doc contributes an eval item
_T8_WIN = (4, 8)  # eval window: 8 tokens starting at token 4 (1-based)


def _tok_ngrams(col: Column, n: int) -> Column:
    """Distinct space-joined token n-grams of a token-array column.
    greatest(1, ...) keeps Spark's sequence() ascending for short docs
    (sequence(1, 0) would DESCEND); the resulting trailing short gram
    is produced identically by the DuckDB twin (concat_ws skips the
    NULL out-of-range elements in both engines)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(col) - (n - 1))),
            lambda i: F.concat_ws(
                " ", *[F.element_at(col, i + k) for k in range(n)]
            ),
        )
    )


def _tok_ngrams_sql(arr: str, n: int) -> str:
    elems = ", ".join(f"{arr}[i + {k}]" for k in range(n))
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(1, len({arr}) - {n - 1})), "
        f"i -> concat_ws(' ', {elems})))"
    )


@query(
    "t8_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS tk
      FROM documents WHERE length(text) > 0
    ),
    eval_items AS (
      SELECT doc_id AS eval_id,
             tk[{_T8_WIN[0]}:{_T8_WIN[0] + _T8_WIN[1] - 1}] AS etk
      FROM toks
      WHERE doc_id % {_T8_EVERY} = 0 AND len(tk) >= {_T8_WIN[0] + _T8_WIN[1]}
    ),
    egrams AS (
      SELECT eval_id, unnest({_tok_ngrams_sql("etk", _T8_N)}) AS g
      FROM eval_items
    ),
    cgrams AS (
      SELECT doc_id, unnest({_tok_ngrams_sql("tk", _T8_N)}) AS g
      FROM toks
    )
    SELECT c.doc_id,
           count(DISTINCT e.eval_id)::INT AS n_eval_items,
           count(DISTINCT c.g)::INT AS n_shared_grams
    FROM cgrams c JOIN egrams e USING (g)
    GROUP BY c.doc_id
    """,
)
def t8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contaminated-document scan: (doc_id, #eval items hit, #distinct
    shared 5-grams) for every corpus doc sharing a token 5-gram with
    the synthetic eval set. Eval grams broadcast; corpus grams explode
    map-side; only matches shuffle into the tiny per-doc aggregate."""
    from .queries_ml import tokens

    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(shuffle, "doc_id")  # 1-2 splits otherwise (_duped note)
        .select("doc_id", tokens(F.col("text")).alias("tk"))
    )
    ev = toks.filter(
        (F.col("doc_id") % _T8_EVERY == 0)
        & (F.size("tk") >= _T8_WIN[0] + _T8_WIN[1])
    ).select(
        F.col("doc_id").alias("eval_id"),
        F.slice("tk", _T8_WIN[0], _T8_WIN[1]).alias("etk"),
    )
    egrams = ev.select(
        "eval_id", F.explode(_tok_ngrams(F.col("etk"), _T8_N)).alias("g")
    )
    cgrams = toks.select(
        "doc_id", F.explode(_tok_ngrams(F.col("tk"), _T8_N)).alias("g")
    )
    return (
        cgrams.join(F.broadcast(egrams), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_id").cast("int").alias("n_eval_items"),
            F.countDistinct("g").cast("int").alias("n_shared_grams"),
        )
    )


# ---------------------------------------------------------------------------
# t9 — intra-document repetition filter (the Gopher / MassiveText
# repetition criteria, Rae et al. 2021 Table A1): per doc, the fraction
# of characters covered by (a) the single most repetitive word 2-gram,
# (b) the most repetitive 3-gram, and (c) ALL duplicated 5-grams; docs
# over any threshold are flagged for removal. Two deliberate,
# documented deviations from the paper, both to keep the statistic
# deterministic and engine-portable: "most common n-gram" is ranked by
# covered characters count*len(gram) (count-ranking is tie-ambiguous
# when equally-frequent grams differ in length), and overlapping
# occurrences are counted per-occurrence rather than deduplicated by
# character position.
#
# 100 TB shape: ONE pass — the three gram families are built per-row
# as (n, gram) structs and exploded once (a single scan of the text
# column, not one per n), then two keyed aggregations:
# (doc_id, n, gram) counts → per-doc maxima/sums. Both shuffles are
# keyed by doc_id(+gram), so volume is linear in corpus size and
# skew is bounded by document length — no joins, no windows.
# ---------------------------------------------------------------------------

_T9_TOP2 = 0.20  # max frac of chars in the most repetitive 2-gram
_T9_TOP3 = 0.18  # ... 3-gram
_T9_DUP5 = 0.15  # max frac of chars in ALL duplicated 5-grams


def _tok_ngrams_all(col: Column, n: int) -> Column:
    """All (non-distinct) space-joined token n-grams — same
    short-doc/trailing-gram semantics as _tok_ngrams."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(col) - (n - 1))),
        lambda i: F.concat_ws(" ", *[F.element_at(col, i + k) for k in range(n)]),
    )


def _tok_ngrams_all_sql(arr: str, n: int) -> str:
    elems = ", ".join(f"{arr}[i + {k}]" for k in range(n))
    return (
        f"list_transform("
        f"generate_series(1, greatest(1, len({arr}) - {n - 1})), "
        f"i -> concat_ws(' ', {elems}))"
    )


def _t9_branch_sql(n: int) -> str:
    return (
        f"SELECT doc_id, n_chars, {n} AS n, "
        f"unnest({_tok_ngrams_all_sql('tk', n)}) AS g FROM toks"
    )


@query(
    "t9_repetition_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, length(text) AS n_chars, {_TOKENS_SQL} AS tk
      FROM documents WHERE length(text) > 0
    ),
    grams AS (
      {_t9_branch_sql(2)}
      UNION ALL {_t9_branch_sql(3)}
      UNION ALL {_t9_branch_sql(5)}
    ),
    cnt AS (
      SELECT doc_id, n_chars, n, g, count(*) AS c
      FROM grams GROUP BY ALL
    ),
    per AS (
      SELECT doc_id, n_chars, n,
             max(c * length(g)) AS top_chars,
             coalesce(sum(CASE WHEN c > 1 THEN c * length(g) END), 0)
               AS dup_chars
      FROM cnt GROUP BY ALL
    )
    SELECT doc_id,
           round(max(CASE WHEN n = 2 THEN top_chars END) / n_chars
                 + 1e-9, 4) AS top2_frac,
           round(max(CASE WHEN n = 3 THEN top_chars END) / n_chars
                 + 1e-9, 4) AS top3_frac,
           round(max(CASE WHEN n = 5 THEN dup_chars END) / n_chars
                 + 1e-9, 4) AS dup5_frac,
           (max(CASE WHEN n = 2 THEN top_chars END) / n_chars > {_T9_TOP2}
            OR max(CASE WHEN n = 3 THEN top_chars END) / n_chars > {_T9_TOP3}
            OR max(CASE WHEN n = 5 THEN dup_chars END) / n_chars > {_T9_DUP5}
           )::INT AS flagged
    FROM per GROUP BY doc_id, n_chars
    """,
)
def t9_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher-style repetition fractions + removal flag.
    Single text scan: 2/3/5-gram families tagged as (n, g) structs in
    one flattened array, one explode, two keyed aggregations."""
    from .queries_ml import tokens

    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .repartition(shuffle, "doc_id")  # 1-2 splits otherwise (_duped note)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            tokens(F.col("text")).alias("tk"),
        )
    )

    def tagged(n: int) -> Column:
        return F.transform(
            _tok_ngrams_all(F.col("tk"), n),
            lambda g: F.struct(
                F.lit(n).cast("int").alias("n"), g.alias("g")
            ),
        )

    grams = toks.select(
        "doc_id",
        "n_chars",
        F.explode(F.flatten(F.array(tagged(2), tagged(3), tagged(5)))).alias(
            "ng"
        ),
    ).select("doc_id", "n_chars", F.col("ng.n").alias("n"), F.col("ng.g").alias("g"))

    cnt = grams.groupBy("doc_id", "n_chars", "n", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    covered = F.col("c") * F.length("g")
    per = cnt.groupBy("doc_id", "n_chars", "n").agg(
        F.max(covered).alias("top_chars"),
        F.coalesce(
            F.sum(F.when(F.col("c") > 1, covered)), F.lit(0)
        ).alias("dup_chars"),
    )
    top2 = F.max(F.when(F.col("n") == 2, F.col("top_chars"))) / F.col("n_chars")
    top3 = F.max(F.when(F.col("n") == 3, F.col("top_chars"))) / F.col("n_chars")
    dup5 = F.max(F.when(F.col("n") == 5, F.col("dup_chars"))) / F.col("n_chars")
    return per.groupBy("doc_id", "n_chars").agg(
        r4(top2).alias("top2_frac"),
        r4(top3).alias("top3_frac"),
        r4(dup5).alias("dup5_frac"),
        (
            (top2 > _T9_TOP2) | (top3 > _T9_TOP3) | (dup5 > _T9_DUP5)
        )
        .cast("int")
        .alias("flagged"),
    ).drop("n_chars")


# ---------------------------------------------------------------------------
# t10 — domain-mixture sampling (the Pile/ROOTS-style per-source
# sampling rates a pre-training mix applies before tokenization).
# Each source gets a deterministic keep-rate from its numeric suffix
# (suffix % 4 → 1.0 / 0.5 / 0.25 / 0.1 — a stand-in for the curated
# per-domain weights table, which at scale would be a broadcast dim);
# a doc is kept iff its salted 60-bit md5 hash, scaled to [0,1),
# falls under the rate. Reports per-source totals, kept counts, the
# achieved rate, and a kept-id checksum.
#
# 100 TB shape: the keep decision is a stateless per-row expression —
# zero shuffles before the 20-row per-source aggregate; resampling
# with a different seed or rates table never reshuffles the corpus.
# Hash-threshold sampling (vs rand()) is reproducible across retries,
# engines, and partitionings — the property training-data lineage
# audits require.
# ---------------------------------------------------------------------------

_T10_SEED = "mix1"
_T10_SCALE = float(1 << 60)  # md5int is 60-bit
_T10_RATES = (1.0, 0.5, 0.25, 0.1)  # indexed by numeric suffix % 4


def _t10_rate_sql() -> str:
    branches = " ".join(
        f"WHEN {i} THEN {r}" for i, r in enumerate(_T10_RATES)
    )
    return (
        "CASE coalesce(nullif(regexp_extract(source, '(\\d+)$', 1), '')::INT"
        f", 0) % 4 {branches} END"
    )


@query(
    "t10_domain_mixture",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             {_t10_rate_sql()} AS rate,
             {_md5int_sql(f"doc_id::VARCHAR || ':{_T10_SEED}'")} / {_T10_SCALE} AS u
      FROM documents
    )
    SELECT source,
           count(*)::INT AS n_total,
           coalesce(sum(CASE WHEN u < rate THEN 1 END), 0)::INT AS n_kept,
           round(coalesce(sum(CASE WHEN u < rate THEN 1 END), 0)
                 / count(*) + 1e-9, 4) AS achieved_rate,
           coalesce(sum(CASE WHEN u < rate THEN doc_id END), 0)::BIGINT
             AS kept_checksum
    FROM scored GROUP BY source
    """,
)
def t10_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold mixture sampling over sources.
    Keep iff md5-salted u(doc) < rate(source); per-source audit row."""
    suffix = F.coalesce(
        F.nullif(F.regexp_extract("source", r"(\d+)$", 1), F.lit("")).cast(
            "int"
        ),
        F.lit(0),
    )
    ridx = suffix % 4
    rate_col = F.lit(None).cast("double")
    for i, r in reversed(list(enumerate(_T10_RATES))):
        rate_col = F.when(ridx == i, F.lit(r)).otherwise(rate_col)
    u = md5int(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + _T10_SEED))
    ) / F.lit(_T10_SCALE)
    kept = F.col("u") < F.col("rate")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", rate_col.alias("rate"), u.alias("u"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_total"),
            F.coalesce(F.sum(F.when(kept, 1)), F.lit(0))
            .cast("int")
            .alias("n_kept"),
            r4(
                F.coalesce(F.sum(F.when(kept, 1)), F.lit(0))
                / F.count(F.lit(1))
            ).alias("achieved_rate"),
            F.coalesce(F.sum(F.when(kept, F.col("doc_id"))), F.lit(0))
            .cast("long")
            .alias("kept_checksum"),
        )
    )


# ---------------------------------------------------------------------------
# t11 — training-sequence packing (concatenate-then-chunk): docs are
# hashed into shards, laid end-to-end within each shard in doc_id
# order, and each doc is attributed to the fixed-size token window
# (seq_len=2048) its first token lands in. Per-(shard, pack) audit:
# how many docs start in the pack and their token mass — the
# statistic packing-efficiency dashboards plot.
#
# 100 TB shape: one shuffle into shards, then a running-sum window
# WITHIN each shard — shards are independent, so parallelism is
# min(#shards, cores) and skew is bounded by the hash. The window
# never sees more than one shard; no global ordering is imposed.
# ---------------------------------------------------------------------------

_T11_SHARDS = 8
_T11_SEQ = 2048


@query(
    "t11_sequence_packing",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             {_md5int_sql("doc_id::VARCHAR || ':shard'")} % {_T11_SHARDS}
               AS shard,
             len({_TOKENS_SQL})::BIGINT AS tok_cnt
      FROM documents WHERE length(text) > 0
    ),
    placed AS (
      SELECT shard, doc_id, tok_cnt,
             coalesce(sum(tok_cnt) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS off
      FROM sized
    )
    SELECT shard::INT AS shard,
           floor(off / {_T11_SEQ})::BIGINT AS pack_id,
           count(*)::INT AS n_docs,
           sum(tok_cnt)::BIGINT AS pack_tokens,
           min(doc_id)::BIGINT AS first_doc,
           max(doc_id)::BIGINT AS last_doc
    FROM placed GROUP BY 1, 2
    """,
)
def t11_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chunk sequence packing audit per (shard, pack)."""
    from pyspark.sql.window import Window as W

    from .queries_ml import tokens

    sized = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            (
                md5int(
                    F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))
                )
                % _T11_SHARDS
            ).alias("shard"),
            F.size(tokens(F.col("text"))).cast("long").alias("tok_cnt"),
        )
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = sized.withColumn(
        "off", F.coalesce(F.sum("tok_cnt").over(w), F.lit(0))
    )
    return (
        placed.groupBy(
            F.col("shard").cast("int").alias("shard"),
            F.floor(F.col("off") / _T11_SEQ).cast("long").alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.sum("tok_cnt").cast("long").alias("pack_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# d9 — cross-document duplicated-substring audit (the ExactSubstr
# signal of Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better", at span granularity): for every doc in the
# planted-duplicate corpus, the fraction of its distinct 10-token
# spans that also occur in ANY other doc. Exact copies read 1.0;
# template near-dups read their true shared-span mass; clean docs 0.
#
# 100 TB shape: spans are hashed to int64 BEFORE any shuffle (10×
# cheaper exchanges than string grams), then three linear keyed
# stages: per-span doc counts, an equi-join of only the duplicated
# span hashes back onto the (doc, span) pairs, and a per-doc count —
# no all-pairs, nothing broadcast-sized-dependent. A 60-bit hash
# collision would count a unique span as duplicated IDENTICALLY in
# both engines (the oracle hashes too): parity is exact, the
# statistic is collision-approximate at ~2^-60.
# ---------------------------------------------------------------------------

_D9_N = 10  # tokens per span


@query(
    "d9_substring_dup_audit",
    oracle=f"""
    WITH corpus AS ({_DUPED_SQL}),
    toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS tk FROM corpus WHERE length(text) > 0
    ),
    spans AS (
      SELECT doc_id, {_md5int_sql("unnest(" + _tok_ngrams_sql("tk", _D9_N) + ")")} AS gh
      FROM toks
    ),
    dup AS (
      SELECT gh FROM spans GROUP BY gh HAVING count(*) > 1
    ),
    per AS (
      SELECT s.doc_id, count(*) AS n_dup
      FROM spans s JOIN dup USING (gh) GROUP BY s.doc_id
    )
    SELECT t.doc_id,
           len({_tok_ngrams_sql("tk", _D9_N)})::INT AS n_spans,
           coalesce(p.n_dup, 0)::INT AS n_dup_spans,
           round(coalesce(p.n_dup, 0)
                 / len({_tok_ngrams_sql("tk", _D9_N)}) + 1e-9, 4) AS dup_frac
    FROM toks t LEFT JOIN per p USING (doc_id)
    """,
)
def d9_substring_dup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated 10-token-span fraction across the corpus.

    The hashed-span table is cached ONCE and every downstream branch
    (per-doc span counts, duplicated-hash set, per-doc dup counts)
    derives from it — the span build (tokenize → 10-token concat_ws →
    md5) is the expensive expression, and a DataFrame feeding multiple
    join branches re-evaluates its whole tree per branch (the d7
    lesson: 188 s → 4 s). n_spans comes from the cached table too
    (spans are per-doc distinct, so count == len(garr)), not from a
    second gram build."""
    from .queries_ml import tokens

    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    spans = (
        _duped(spark, sf_dir)
        .filter(F.length("text") > 0)
        # spread the span build (the expensive expression) across the
        # cluster — the source is 1-2 input splits (30.8s → 2.3s at
        # sf0.1 on local[32]); safe here because the result is cached
        .repartition(shuffle, "doc_id")
        .select(
            "doc_id",
            F.explode(
                _tok_ngrams(tokens(F.col("text")), _D9_N)
            ).alias("g"),
        )
        .select("doc_id", md5int(F.col("g")).alias("gh"))
        .cache()
    )
    base = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    dup = (
        spans.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("gh")
    )
    per = spans.join(dup, "gh").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup")
    )
    n_dup = F.coalesce(F.col("n_dup"), F.lit(0))
    return base.join(per, "doc_id", "left").select(
        "doc_id",
        F.col("n_spans").cast("int").alias("n_spans"),
        n_dup.cast("int").alias("n_dup_spans"),
        r4(n_dup / F.col("n_spans")).alias("dup_frac"),
    )
