"""Round-6 curation operators (session 2): SemDeDup (s8) and the
D4-style prototype-filter + cluster-balanced diversification (s9).

New module on purpose — query fingerprints are module-level
(all_queries.py), so adding these to queries_ml2/ml4 would have
re-fronted every query in those files through the 50-slot driver gate
(COVERAGE.md hygiene policy).

s8 — SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
corpus, compute pairwise cosines ONLY within each cluster, and drop
every vector that has a >=tau neighbor with higher keep-priority.
The paper keeps the member FARTHEST from its centroid (low centroid
similarity = the diverse exemplar); ties break by vec_id. This is the
order-free variant ("suppressed by ANY higher-priority tau-neighbor")
rather than the sequential greedy scan — parallel by construction and
deterministic, and identical to greedy whenever dup groups are cliques
(exact/scaled copies, as planted here). Distinct from s5 (LSH links →
connected components → min-id representative): s8 is the published
SemDeDup recipe — k-means partitioning bounds the candidate pairs to
cluster size, and the keep policy is centroid-distance-based.

s9 — the D4 pipeline tail (Tirumala et al. 2023): on the SemDeDup
survivors, (a) drop the most PROTOTYPICAL members per cluster (highest
centroid similarity — SSL-prototypes filtering), then (b) keep a
cluster-balanced sample of Q per cluster in deterministic hash order
(diversification). One window chain per step, no joins beyond s8's.

Reference parity: the reference has no embedding-space curation at
all; this family exists for the training-data-pipeline mandate.

100 TB shape: assignment is a broadcast cross-join against the K-row
centroid dim (K ~ sqrt(n) at scale, never all-pairs); the within-
cluster self-join is keyed on cid, so pair work is sum over clusters
of |cluster|^2 — SemDeDup's published design point picks K large
enough that n/K stays small (they use K=50k on LAION). A runaway
megacluster is the skew risk; the m2-style bucket-cap star fallback
(queries_ml2.py) is the guard to bolt on if assignment skew ever
shows, and is not needed at the pinned K=8 audit scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.veccluster import emb_dim, fast_assign, fast_recenter
from .queries import query, r4
from .queries_ml import _cos_sql, _md5int_sql, cosine, dot, md5int
from .queries_ml2 import _EMB_SQL, _emb, _sql_assign, _sql_recenter

# ---------------------------------------------------------------------------
# s8 — SemDeDup
# ---------------------------------------------------------------------------

_S8_K = 8  # coarse cells (the s4/s7 pinned trajectory: first-K seeds, 2 iters)
_S8_TAU = 0.999  # dup threshold on 6-dp-rounded cosine: catches the
# planted exact (cos = 1.0) and uniform-scaled (cos = 1.0) twins, not
# the organic corpus (max organic pair < 0.85 at sf0.01)

# shared WITH-clause text: corpus → pinned 2-iter k-means → cells →
# per-member rounded centroid similarity → within-cluster tau-pairs.
# Every comparison that decides an outcome (assignment argmax, csim
# priority, tau gate) happens on ROUNDED values with vec_id tiebreaks,
# so both engines make identical decisions despite FP summation order.
_S8_SQL = f"""
    corpus0 AS ({_EMB_SQL}),
    base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM corpus0
    ),
    c0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < {_S8_K}),
    a1 AS ({_sql_assign("base", "c0")}),
    c1 AS ({_sql_recenter("a1")}),
    a2 AS ({_sql_assign("base", "c1")}),
    cc AS ({_sql_recenter("a2")}),
    cells AS ({_sql_assign("base", "cc")}),
    csim AS (
      SELECT x.vec_id, x.cid, x.e,
             round(({_cos_sql("x.e", "c.c")}) + 1e-9, 6) AS csim
      FROM cells x JOIN cc c USING (cid)
    ),
    pairs AS (
      SELECT a.vec_id AS xa, b.vec_id AS xb, a.csim AS ca, b.csim AS cb
      FROM csim a JOIN csim b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
      WHERE round(({_cos_sql("a.e", "b.e")}) + 1e-9, 6) >= {_S8_TAU}
    ),
    nd AS (SELECT xa AS vec_id, count(*)::INT AS n_dups FROM pairs GROUP BY xa),
    sup AS (
      SELECT DISTINCT xa AS vec_id FROM pairs
      WHERE cb < ca OR (cb = ca AND xb < xa)
    ),
    semdedup AS (
      SELECT s.vec_id, s.cid,
             round(s.csim + 1e-9, 4) AS centroid_sim,
             coalesce(nd.n_dups, 0) AS n_dups,
             CASE WHEN sup.vec_id IS NULL THEN 1 ELSE 0 END AS keep,
             s.csim
      FROM csim s
      LEFT JOIN nd USING (vec_id)
      LEFT JOIN sup USING (vec_id)
    )
"""


def _semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The s8 frame (vec_id, cid, centroid_sim, n_dups, keep, csim) —
    shared with s9, which chains the D4 tail onto the survivors."""
    # spread the hot per-row work across the cluster: the raw scans are
    # 1-6 input splits at any sf (small parquet), so every downstream
    # projection would otherwise run ≤6-wide (guide §2.5 input skew)
    par = spark.sparkContext.defaultParallelism
    base = (
        _emb(spark, sf_dir)
        .select("vec_id", F.col("embedding").alias("e"))
        .repartition(par)
        .cache()
    )
    cc = base.filter(F.col("vec_id") < _S8_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    dim = emb_dim(sf_dir)
    for _ in range(2):
        cc = fast_recenter(fast_assign(base, cc), dim)
    cc = cc.cache()  # feeds the final assignment AND the csim join
    cells = fast_assign(base, cc)
    # csim feeds the pair self-join twice plus the output — cache it.
    # nrm = sqrt(dot(e,e)) once per ROW: the pair filter below then
    # computes cosine as dot(a,b)/(a.nrm*b.nrm), which is bit-identical
    # to cosine(a.e, b.e) = dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))
    # but folds ONE array per pair instead of three (guide §2.3:
    # per-pair work is the n²/K hot loop — hoist everything row-level)
    nrm = F.sqrt(dot(F.col("e"), F.col("e")))
    csim = cells.join(F.broadcast(cc), "cid").select(
        "vec_id",
        "cid",
        "e",
        F.round(cosine(F.col("e"), F.col("c")) + F.lit(1e-9), 6).alias("csim"),
        nrm.alias("nrm"),
    )
    # first four NORMALIZED coordinates drive the exact prefilter below
    for i in (1, 2, 3, 4):
        csim = csim.withColumn(
            f"u{i}", F.element_at("e", i).cast("double") / F.col("nrm")
        )
    csim = csim.cache()
    a, b = csim.alias("a"), csim.alias("b")
    # broadcast the build side: the SMJ alternative hashes on cid's 8
    # distinct values (≤8 busy tasks at any core count, guide §2.5);
    # the broadcast hash join keeps the probe side's full parallelism
    # and removes both pair-join exchanges (guide §3.1)
    #
    # Exact coordinate prefilter (no false negatives): the tau gate
    # passes iff true cosine >= 0.999 - 1e-9 - 5e-7 (round guard), so
    # the normalized vectors satisfy ||â-b̂||₂ = sqrt(2-2cos) <= 0.0448
    # — hence EVERY coordinate differs by <= 0.0448 < 0.05. Four cheap
    # per-pair subtractions (codegen, left-to-right And short-circuit)
    # drop ~99.5% of the n²/K pairs before the interpreted array-fold
    # dot product ever runs (guide §1.2: fix the per-pair work).
    guard = (F.abs(F.col("a.u1") - F.col("b.u1")) <= 0.05)
    for i in (2, 3, 4):
        guard = guard & (F.abs(F.col(f"a.u{i}") - F.col(f"b.u{i}")) <= 0.05)
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .filter(
            guard
            & (
                F.round(
                    dot(F.col("a.e"), F.col("b.e"))
                    / (F.col("a.nrm") * F.col("b.nrm"))
                    + F.lit(1e-9),
                    6,
                )
                >= _S8_TAU
            )
        )
        .select(
            F.col("a.vec_id").alias("xa"),
            F.col("b.vec_id").alias("xb"),
            F.col("a.csim").alias("ca"),
            F.col("b.csim").alias("cb"),
        )
        .cache()  # feeds n_dups AND the suppression set
    )
    nd = pairs.groupBy(F.col("xa").alias("vec_id")).agg(
        F.count("*").cast("int").alias("n_dups")
    )
    sup = (
        pairs.filter(
            (F.col("cb") < F.col("ca"))
            | ((F.col("cb") == F.col("ca")) & (F.col("xb") < F.col("xa")))
        )
        .select(F.col("xa").alias("vec_id"))
        .distinct()
        .withColumn("__sup", F.lit(1))
    )
    # nd/sup hold only the few tau-pair members — broadcast them so the
    # final assembly never shuffles the corpus (2 Exchange+Sort → 0)
    return (
        csim.join(F.broadcast(nd), "vec_id", "left")
        .join(F.broadcast(sup), "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            r4(F.col("csim")).alias("centroid_sim"),
            F.coalesce("n_dups", F.lit(0)).alias("n_dups"),
            F.when(F.col("__sup").isNull(), 1).otherwise(0).alias("keep"),
            "csim",
        )
    )


@query(
    "s8_semdedup",
    oracle=f"""
    WITH {_S8_SQL}
    SELECT vec_id, cid, centroid_sim, n_dups, keep FROM semdedup
    """,
)
def s8_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the planted-twin embedding corpus: k-means cells,
    within-cell cosine pairs at tau=0.999, keep the farthest-from-
    centroid member of each dup group (csim-asc/vec_id priority).
    Planted exact and uniform-scaled twins tie their originals on
    rounded csim, so the smaller vec_id (the original) survives; every
    organic vector is keep=1 with n_dups=0."""
    return _semdedup(spark, sf_dir).drop("csim")


# ---------------------------------------------------------------------------
# s9 — D4 tail: prototype filter + cluster-balanced sample
# ---------------------------------------------------------------------------

_S9_PROTO_FRAC = 0.1  # drop the top 10% most prototypical per cluster
_S9_Q = 20  # cluster-balanced sample size per cluster


@query(
    "s9_cluster_balanced_sample",
    oracle=f"""
    WITH {_S8_SQL},
    kept AS (SELECT vec_id, cid, csim FROM semdedup WHERE keep = 1),
    ranked AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY cid ORDER BY csim DESC, vec_id)
               AS proto_rank,
             count(*) OVER (PARTITION BY cid) AS n_members
      FROM kept
    ),
    survivors AS (
      SELECT vec_id, cid, proto_rank, n_members,
             {_md5int_sql("CAST(vec_id AS VARCHAR)")} AS h
      FROM ranked
      WHERE proto_rank > CAST(floor(n_members * {_S9_PROTO_FRAC} + 1e-9) AS BIGINT)
    )
    SELECT vec_id, cid, proto_rank, n_members,
           CASE WHEN row_number() OVER (PARTITION BY cid ORDER BY h, vec_id)
                     <= {_S9_Q} THEN 1 ELSE 0 END AS picked
    FROM survivors
    """,
)
def s9_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 diversification on the SemDeDup survivors: per cluster, drop
    the floor(10%) most prototypical members (highest rounded centroid
    similarity — the SSL-prototypes filter), then keep a cluster-
    balanced sample of Q=20 in deterministic md5 hash order. Output is
    every post-prototype survivor with its ranks and picked flag.

    Scale: two window chains partitioned by cid on top of s8's frame —
    no new joins; the hash-order pick is the standard deterministic
    stand-in for the paper's random per-cluster draw."""
    kept = _semdedup(spark, sf_dir).filter(F.col("keep") == 1)
    w_proto = Window.partitionBy("cid").orderBy(F.desc("csim"), F.col("vec_id"))
    w_n = Window.partitionBy("cid")
    ranked = kept.select(
        "vec_id",
        "cid",
        "csim",
        F.row_number().over(w_proto).alias("proto_rank"),
        F.count("*").over(w_n).alias("n_members"),
    )
    survivors = ranked.filter(
        F.col("proto_rank")
        > F.floor(F.col("n_members") * _S9_PROTO_FRAC + F.lit(1e-9)).cast("long")
    ).select(
        "vec_id",
        "cid",
        "proto_rank",
        "n_members",
        md5int(F.col("vec_id").cast("string")).alias("h"),
    )
    w_pick = Window.partitionBy("cid").orderBy("h", "vec_id")
    return survivors.select(
        "vec_id",
        "cid",
        "proto_rank",
        "n_members",
        F.when(F.row_number().over(w_pick) <= _S9_Q, 1).otherwise(0).alias("picked"),
    )
