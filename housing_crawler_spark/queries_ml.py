"""Training-data pipeline operators: text analysis, deduplication
families, similarity search — over the ``documents`` and ``embeddings``
tables. Every query here is a pure Catalyst plan (higher-order array
functions; no UDFs) with an exact DuckDB oracle.

Cross-engine determinism notes:
- portable row hash = first 15 hex chars of md5 → BIGINT (both engines
  produce identical md5 hex; 15 hex chars < 2^60 so no sign issues);
- dot products fold arrays LEFT-TO-RIGHT in both engines
  (``F.aggregate`` / ``list_reduce``) with elements cast to double first,
  so the doubles are bit-identical — rounding to 4 decimals is safe;
- Spark ``array_intersect`` and DuckDB ``list_intersect`` both return
  distinct elements.

Production note: md5int exists ONLY because the DuckDB oracle needs a
hash both engines compute identically. A production deployment without
the cross-engine gate swaps it for ``F.xxhash64`` (~10x cheaper,
JVM-native) — every gram/fingerprint pipeline here is agnostic to the
hash function as long as it is 64-bit and deterministic.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import load, query

# ---------------------------------------------------------------------------
# shared expression builders
# ---------------------------------------------------------------------------


def md5int(c: Column) -> Column:
    """Portable 60-bit hash: conv(substr(md5(x),1,15), 16, 10)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _md5int_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens(c: Column) -> Column:
    return F.split(F.trim(F.lower(c)), r"\s+")


_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


def norm_text(c: Column) -> Column:
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def char_3grams(n: Column) -> Column:
    """Distinct character 3-grams of an ALREADY-NORMALIZED text column.

    Callers must materialize norm_text(...) into a real column first:
    passing the norm expression tree here would re-evaluate the regexes
    once per array element (O(len²) — measured 50s vs 2s on sf0.1)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length(n) - 2)),
            lambda i: n.substr(i, F.lit(3)),
        )
    )


_3GRAMS_SQL = (
    "list_distinct(list_transform("
    f"generate_series(1, greatest(1, length({_NORM_SQL}) - 2)), "
    f"i -> substr({_NORM_SQL}, i::INT, 3)))"
)


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product — bit-identical to the SQL twin."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _cos_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


# ---------------------------------------------------------------------------
# Text analysis (SURVEY §2.8 scalar-function families at corpus scale)
# ---------------------------------------------------------------------------


@query(
    "t1_text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_TOKENS_SQL}) AS n_tokens,
           length(text) AS n_chars_actual,
           round((length(regexp_replace(text, '[^a-z ]', '', 'g'))::DOUBLE
                 / length(text)) + 1e-9, 4) AS alpha_ratio,
           round((length(regexp_replace(text, '\\s+', '', 'g'))::DOUBLE
                 / len({_TOKENS_SQL})) + 1e-9, 4) AS avg_token_len
    FROM documents WHERE length(text) > 0
    """,
)
def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring ingredients: token count, char counts, alpha ratio,
    mean token length — all JVM-side string expressions."""
    # r07: single-row-group source — spread the per-row regex work
    # (guide §2.5; same fix as d2)
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load(spark, sf_dir, "documents")
        .repartition(shuffle, "doc_id")
        .filter(F.length("text") > 0)
    )
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round((F.length(F.regexp_replace("text", "[^a-z ]", "")).cast("double")
            / F.length("text")) + F.lit(1e-9), 4).alias("alpha_ratio"),
        F.round((F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / F.size(toks)) + F.lit(1e-9), 4).alias("avg_token_len"),
    )


_LANG_MARKERS = {
    "de": ["der", "die", "und", "ist", "nicht", "mit", "ein", "das"],
    "en": ["the", "and", "is", "not", "with", "for", "of", "to"],
    "es": ["el", "la", "los", "es", "con", "para", "una", "que"],
    "fr": ["le", "les", "est", "avec", "pour", "dans", "une", "qui"],
}


def _lang_hits_sql(lang: str) -> str:
    arr = ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang])
    return f"len(list_intersect({_TOKENS_SQL}, [{arr}]))"


@query(
    "t2_langid",
    oracle=f"""
    SELECT doc_id, de_hits, en_hits, es_hits, fr_hits,
           CASE
             WHEN de_hits >= en_hits AND de_hits >= es_hits
                  AND de_hits >= fr_hits AND de_hits > 0 THEN 'de'
             WHEN en_hits >= es_hits AND en_hits >= fr_hits
                  AND en_hits > 0 THEN 'en'
             WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
             WHEN fr_hits > 0 THEN 'fr'
             ELSE 'und'
           END AS pred_lang
    FROM (
      SELECT doc_id,
             {_lang_hits_sql("de")} AS de_hits,
             {_lang_hits_sql("en")} AS en_hits,
             {_lang_hits_sql("es")} AS es_hits,
             {_lang_hits_sql("fr")} AS fr_hits
      FROM documents
    )
    """,
)
def t2_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: distinct marker-token hits
    per language, argmax with a fixed tie-break order."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in _LANG_MARKERS.items()
    }
    d = d.select(
        "doc_id",
        hits["de"].alias("de_hits"),
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["fr"].alias("fr_hits"),
    )
    c = F.col
    pred = (
        F.when(
            (c("de_hits") >= c("en_hits"))
            & (c("de_hits") >= c("es_hits"))
            & (c("de_hits") >= c("fr_hits"))
            & (c("de_hits") > 0),
            "de",
        )
        .when((c("en_hits") >= c("es_hits")) & (c("en_hits") >= c("fr_hits")) & (c("en_hits") > 0), "en")
        .when((c("es_hits") >= c("fr_hits")) & (c("es_hits") > 0), "es")
        .when(c("fr_hits") > 0, "fr")
        .otherwise("und")
    )
    return d.withColumn("pred_lang", pred)


@query(
    "t3_fingerprint",
    oracle=f"""
    SELECT doc_id, {_md5int_sql(_NORM_SQL)} AS fp
    FROM documents
    """,
)
def t3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: 60-bit hash of whitespace-normalized text
    (the dedup key for d1)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", md5int(norm_text(F.col("text"))).alias("fp"))


@query(
    "t4_token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
           len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens
    FROM documents WHERE length(trim(text)) > 0
    """,
)
def t4_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex lexer."""
    d = load(spark, sf_dir, "documents").filter(F.length(F.trim(F.col("text"))) > 0)
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_bpe_tokens"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# Deduplication families (exact → MinHash/LSH → SimHash → n-gram Jaccard →
# embedding cosine). The corpus has no exact dups, so d1/d3 inject
# deterministic copies (doc_id + 1_000_000) to give the operators work.
# ---------------------------------------------------------------------------

_DUPED_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _duped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE for consumers: the documents parquet is 1-2 input splits, so
    # heavy per-row expression pipelines (char-3-grams, minhash perms,
    # 10-token spans) run on 1-2 of 32 cores unless the CONSUMER
    # repartitions before them (d9 measured 30.8s → 2.3s at sf0.1).
    # The repartition is deliberately NOT applied here: an exchange in
    # an uncached multi-branch plan re-executes per branch and measured
    # SLOWER for t5 (+1.3s) and d2 (+0.4s) — add it only where the
    # repartitioned result is consumed once or cached (d7, d9).
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    inj = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return d.unionByName(inj)


@query(
    "d1_exact_dedup",
    oracle=f"""
    SELECT fp, count(*) AS n_dups, min(doc_id) AS keeper,
           max(doc_id) AS last_dup
    FROM (
      SELECT doc_id, {_md5int_sql(_NORM_SQL)} AS fp FROM ({_DUPED_SQL})
    )
    GROUP BY fp HAVING count(*) > 1
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text fingerprint;
    keeper = min doc_id (first-seen-wins, SURVEY W5 semantics)."""
    d = _duped(spark, sf_dir).select(
        "doc_id", md5int(norm_text(F.col("text"))).alias("fp")
    )
    return (
        d.groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keeper"),
            F.max("doc_id").alias("last_dup"),
        )
        .filter(F.col("n_dups") > 1)
    )


_N_MINHASH = 4


def perm_consts(n: int) -> list[int]:
    """Deterministic xor-mix permutation constants (driver-side,
    hashlib — never rehashed per row)."""
    return [
        int(hashlib.md5(f"perm:{k}".encode()).hexdigest()[:15], 16)
        for k in range(n)
    ]


_MH_C = perm_consts(_N_MINHASH)

# d2/d3 signature scheme (the d7 trick, round-3 verdict item 6): ONE
# md5 pass hashes each distinct 3-gram to int64, and each "permutation"
# is min over xor(h, C_k) — cuts the dominant per-gram hashing cost 4x
# vs the old k salted-md5 passes. Identical gram sets still give
# identical signatures; both engines share the constants verbatim.
_GH_SQL = f"list_transform({_3GRAMS_SQL}, s -> {_md5int_sql('s')})"


def _gram_hashes(text: Column) -> Column:
    """Distinct char-3-gram hashes of a pre-normalized text column."""
    return F.transform(char_3grams(text), lambda s: md5int(s))


def _minhash_col(gh: Column, k: int) -> Column:
    """Min over xor-mixed gram hashes. NOTE: must NOT use
    ``lambda h, k=k``: F.transform interprets a two-parameter lambda as
    (element, index) and binds the second param to the array index
    column — close over the constant via a factory instead."""
    c = _MH_C[k]
    return F.array_min(F.transform(gh, lambda h: h.bitwiseXOR(F.lit(c))))


def _minhash_sql(k: int) -> str:
    """SQL twin over a pre-hashed gram array column named ``gh``."""
    return f"list_aggregate(list_transform(gh, h -> xor(h, {_MH_C[k]})), 'min')"


@query(
    "d2_minhash_signatures",
    oracle=f"""
    SELECT doc_id, {", ".join(f"{_minhash_sql(k)} AS mh_{k}" for k in range(_N_MINHASH))}
    FROM (SELECT doc_id, {_GH_SQL} AS gh FROM documents)
    """,
)
def d2_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures: one md5 pass per distinct char-3-gram
    shingle, then k=4 xor-mix permutations (min over xor(h, C_k)) —
    shingle → minhash entirely in higher-order array expressions
    (no UDF, no shuffle, one hash per gram instead of k)."""
    # r07: the documents parquet is ONE row group (unsplittable), so
    # the gram+md5 pipeline — the entire cost of this query — ran on a
    # single task at any core count (guide §2.5 input skew). One
    # round-robin spread of the raw text (~50 MB at sf1.0) buys full
    # parallelism for the ~7M md5 evals; measured 28.5 → ~2 s.
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        load(spark, sf_dir, "documents")
        .repartition(shuffle, "doc_id")
        .withColumn("__norm", norm_text(F.col("text")))
        .withColumn("__gh", _gram_hashes(F.col("__norm")))
    )
    gh = F.col("__gh")
    return d.select(
        "doc_id", *[_minhash_col(gh, k).alias(f"mh_{k}") for k in range(_N_MINHASH)]
    )


@query(
    "d3_minhash_lsh_pairs",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id,
             {", ".join(f"{_minhash_sql(k)} AS mh_{k}" for k in range(_N_MINHASH))}
      FROM (
        SELECT doc_id, {_GH_SQL} AS gh FROM ({_DUPED_SQL})
      )
    ),
    b1 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a JOIN sigs b
           ON a.mh_0 = b.mh_0 AND a.mh_1 = b.mh_1 AND a.doc_id < b.doc_id),
    b2 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigs a JOIN sigs b
           ON a.mh_2 = b.mh_2 AND a.mh_3 = b.mh_3 AND a.doc_id < b.doc_id)
    SELECT DISTINCT doc_a, doc_b FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
    """,
)
def d3_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 2 bands × 2 rows; banded equi-joins
    (shuffle on band key only — never the O(n²) cross join). NOTE:
    pair ENUMERATION is quadratic in bucket size by definition (4.7M
    pairs from 5.5k docs at sf0.1 on this template-heavy corpus) —
    this query is the measure; the linear star-link pipeline (d7/s3)
    is the production path."""
    gh = F.col("__gh")
    sigs = (
        _duped(spark, sf_dir)
        .withColumn("__norm", norm_text(F.col("text")))
        .withColumn("__gh", _gram_hashes(F.col("__norm")))
        .select(
            "doc_id",
            *[_minhash_col(gh, k).alias(f"mh_{k}") for k in range(_N_MINHASH)],
        )
        # the signature build (md5 per distinct gram + xor-mix min-reduce)
        # feeds FOUR join branches (both sides of both bands) — cache it
        # once or it re-evaluates per branch (the d7/d9 lesson; 90s → 3s
        # at sf0.1)
        .cache()
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    p1 = a.join(
        b,
        (F.col("a.mh_0") == F.col("b.mh_0"))
        & (F.col("a.mh_1") == F.col("b.mh_1"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    p2 = a.join(
        b,
        (F.col("a.mh_2") == F.col("b.mh_2"))
        & (F.col("a.mh_3") == F.col("b.mh_3"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    return p1.unionByName(p2).distinct()


_SIMHASH_BITS = 16


@query(
    "d4_simhash",
    oracle=f"""
    SELECT doc_id,
           {" + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))}
           AS simhash
    FROM (
      SELECT doc_id,
             {", ".join(f"sum(CASE WHEN (th & {1 << j}) != 0 THEN 1 ELSE -1 END) AS b{j}" for j in range(_SIMHASH_BITS))}
      FROM (
        SELECT doc_id, {_md5int_sql("tok")} AS th
        FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents)
      )
      GROUP BY doc_id
    )
    """,
)
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: explode tokens → portable token hash → per-bit
    signed vote sums → reassembled hash. One data shuffle (the groupBy)
    after the spread repartition (_duped note)."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = load(spark, sf_dir, "documents").repartition(shuffle, "doc_id")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    th = tok.select("doc_id", md5int(F.col("tok")).alias("th"))
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("th").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
            ).alias(f"b{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return votes.select("doc_id", sim.cast("long").alias("simhash"))


@query(
    "d5_ngram_jaccard_pairs",
    oracle=f"""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round((len(list_intersect(a.g, b.g))::DOUBLE
                 / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))) + 1e-9, 4)
           AS jaccard
    FROM (SELECT doc_id, {_3GRAMS_SQL} AS g FROM documents) a
    JOIN (SELECT doc_id, {_3GRAMS_SQL} AS g FROM documents) b
      ON b.doc_id = a.doc_id + 1
    """,
)
def d5_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity over adjacent doc pairs — the MEASURE
    in isolation with a trivially-auditable pairing; the real pipeline
    wiring (LSH candidates → this measure → keeper) is
    d7_dedup_pipeline in queries_ml2.py."""
    d = (
        load(spark, sf_dir, "documents")
        .withColumn("__norm", norm_text(F.col("text")))
        .select("doc_id", char_3grams(F.col("__norm")).alias("g"))
    )
    a, b = d.alias("a"), d.alias("b")
    inter = F.size(F.array_intersect(F.col("a.g"), F.col("b.g")))
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round((inter.cast("double")
            / (F.size(F.col("a.g")) + F.size(F.col("b.g")) - inter)) + F.lit(1e-9), 4).alias("jaccard"),
    )


@query(
    "d6_embedding_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(({_cos_sql("a.embedding", "b.embedding")}) + 1e-9, 4) AS cos_sim,
           CASE WHEN {_cos_sql("a.embedding", "b.embedding")} >= 0.9
                THEN 1 ELSE 0 END AS near_dup
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    """,
)
def d6_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection over candidate pairs — the
    MEASURE in isolation (bit-identical dot/norm fold, see module
    note); the real pipeline wiring (LSH buckets → this measure) is
    s3_ann_near_dup in queries_ml2.py."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    cs = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round((cs) + F.lit(1e-9), 4).alias("cos_sim"),
        F.when(cs >= 0.9, 1).otherwise(0).alias("near_dup"),
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "s1_knn_bruteforce",
    oracle=f"""
    SELECT probe_id, neighbor_id, round((cs) + 1e-9, 4) AS sim
    FROM (
      SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id,
             {_cos_sql("p.embedding", "x.embedding")} AS cs,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(({_cos_sql("p.embedding", "x.embedding")}) + 1e-9, 6) DESC,
                        x.vec_id) AS rk
      FROM (SELECT * FROM embeddings WHERE vec_id < 5) p
      JOIN embeddings x ON x.vec_id != p.vec_id
    ) WHERE rk <= 3
    """,
)
def s1_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): broadcast the
    probe set, rank per probe. At 100 TB this is the verification path;
    s2 is the scale path."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = e.filter(F.col("vec_id") < 5)
    p, x = probes.alias("p"), e.alias("x")
    cs = cosine(F.col("p.embedding"), F.col("x.embedding"))
    w = Window.partitionBy("probe_id").orderBy(F.desc(F.round((F.col("cs")) + F.lit(1e-9), 6)), "neighbor_id")
    return (
        F.broadcast(p)
        .join(x, F.col("x.vec_id") != F.col("p.vec_id"))
        .select(
            F.col("p.vec_id").alias("probe_id"),
            F.col("x.vec_id").alias("neighbor_id"),
            cs.alias("cs"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("probe_id", "neighbor_id", F.round(F.col("cs") + F.lit(1e-9), 4).alias("sim"))
    )


_N_PLANES = 8


def _plane_sql(k: int) -> str:
    """Deterministic pseudo-random hyperplane k as a SQL list literal
    builder: plane[k][j] = (md5int('k:j') % 1001) - 500."""
    return (
        f"list_transform(generate_series(1, 64), "
        f"j -> ((('0x' || substr(md5('{k}:' || j::VARCHAR), 1, 15))::BIGINT % 1001) - 500)::DOUBLE)"
    )


def _bucket_sql(emb: str) -> str:
    terms = []
    for k in range(_N_PLANES):
        d = _dot_sql(emb, _plane_sql(k))
        terms.append(f"(CASE WHEN {d} > 0 THEN {1 << k} ELSE 0 END)")
    return " + ".join(terms)


@lru_cache(maxsize=None)
def _plane_values(k: int) -> tuple[float, ...]:
    """Driver-side twin of _plane_sql: plane[k][j] for j in 1..64.

    The planes are pure functions of (k, j), but Catalyst does not
    constant-fold the transform(sequence(...), md5 ...) generator — the
    round-3 verdict verified md5 surviving in the optimized plan, i.e.
    512 (s2) / 1,536 (s3) hash+conv evaluations PER ROW in the
    bucketing stage. Computing the 64 values here (hashlib, same
    formula) and emitting a literal array removes that ~100x constant
    factor; values, buckets, and the SQL oracles are unchanged."""
    return tuple(
        float(int(hashlib.md5(f"{k}:{j}".encode()).hexdigest()[:15], 16) % 1001 - 500)
        for j in range(1, 65)
    )


def _plane_col(k: int) -> Column:
    return F.array(*[F.lit(v) for v in _plane_values(k)])


def _bucket_col(emb: Column) -> Column:
    out = None
    for k in range(_N_PLANES):
        term = F.when(dot(emb, _plane_col(k)) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out


@query(
    "s2_ann_lsh_bucketed",
    oracle=f"""
    WITH bucketed AS (
      SELECT vec_id, embedding, {_bucket_sql("embedding")} AS bucket
      FROM embeddings
    )
    SELECT probe_id, neighbor_id, round((cs) + 1e-9, 4) AS sim
    FROM (
      SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id,
             {_cos_sql("p.embedding", "x.embedding")} AS cs,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(({_cos_sql("p.embedding", "x.embedding")}) + 1e-9, 6) DESC,
                        x.vec_id) AS rk
      FROM (SELECT * FROM bucketed WHERE vec_id < 5) p
      JOIN bucketed x ON x.bucket = p.bucket AND x.vec_id != p.vec_id
    ) WHERE rk <= 3
    """,
)
def s2_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: 8 sign bits → bucket id;
    candidates share the probe's bucket (equi-join on bucket — the scale
    path replaces s1's cross join with a shuffle on bucket)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", _bucket_col(F.col("embedding")).alias("bucket")
    )
    probes = e.filter(F.col("vec_id") < 5)
    p, x = probes.alias("p"), e.alias("x")
    cs = cosine(F.col("p.embedding"), F.col("x.embedding"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc(F.round((F.col("cs")) + F.lit(1e-9), 6)), "neighbor_id"
    )
    return (
        p.join(
            x,
            (F.col("x.bucket") == F.col("p.bucket"))
            & (F.col("x.vec_id") != F.col("p.vec_id")),
        )
        .select(
            F.col("p.vec_id").alias("probe_id"),
            F.col("x.vec_id").alias("neighbor_id"),
            cs.alias("cs"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("probe_id", "neighbor_id", F.round(F.col("cs") + F.lit(1e-9), 4).alias("sim"))
    )
