"""Round-6 LLM-pipeline operators: the ExactSubstr CUT (d10) and the
IVF×PQ ANN composition (s7).

New module on purpose: query fingerprints are module-level
(all_queries.py), so adding these to queries_ml2/ml3 would have
re-fronted every query in those files through the 50-slot driver gate
and stalled the round-5→6 debt drain (COVERAGE.md hygiene policy).

d10 — the rewrite that d9 (queries_ml2.py:1944) only audits: Lee et
al. 2022's ExactSubstr dedup REMOVES each cross-document duplicated
span from every copy but one canonical owner and keeps the remainder
of the document. Reference parity: the reference has no corpus-level
text dedup at all (its nearest analogue is the first-seen-wins id
dedup, crawl_wggesucht.py:189); this family exists for the
training-data-pipeline mandate.

s7 — the published IVFADC shape (Jégou et al. 2011, §IV): s4's
inverted lists prune the candidate set to nprobe cells, s6's
product-quantization codes score ONLY those candidates through
integer ADC lookup tables. Composition is the production ANN layout;
both halves are verified separately (s4, s6), this pins the composed
semantics and the scored-row bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from .operators.exactsubstr import exact_substr_cut
from .queries import load, query, r4
from .queries_ml import _DUPED_SQL, _duped, _md5int_sql, _TOKENS_SQL
from .queries_ml2 import _sql_assign, _sql_recenter
from .queries_ml3 import (
    _PQ_D,
    _PQ_EVERY,
    _PQ_K,
    _PQ_M,
    _PQ_PERT,
    _PQ_TOPK,
    _l2_sql,
    _pq_assign_sql,
    _pq_l2,
    _pq_recenter_sql,
    _pq_sub,
)

# ---------------------------------------------------------------------------
# d10 — ExactSubstr cut (keep-one-copy span excision)
# ---------------------------------------------------------------------------

_D10_N = 10  # tokens per span (same granularity as the d9 audit)

# DuckDB twin of operators/exactsubstr.py, stage by stage:
# positional spans (hash per position, NOT distinct) → cross-doc dup
# spans with min-doc owner → victim intervals → islands merge (same
# running-max window framing) → sorted cut list → complement keep-
# ranges sliced back out of the token array. The reassembled text is
# compared via the portable 60-bit fingerprint, so the cut text is
# pinned byte-exactly across engines.
_D10_SPAN_ELEMS = ", ".join(f"tk[i + {k}]" for k in range(_D10_N))
# the reassembly expression (precomputed: py3.11 f-strings reject
# multi-line expressions inside braces)
_D10_REASSEMBLE = (
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — a fully-cut doc must fingerprint md5('')
    "coalesce(array_to_string(flatten(list_transform("
    "generate_series(1, len(cuts) + 1), "
    "j -> tk[(CASE WHEN j = 1 THEN 1 ELSE cuts[j-1].e + 1 END)"
    ":(CASE WHEN j = len(cuts) + 1 THEN len(tk)"
    " ELSE cuts[j].s - 1 END)])), ' '), '')"
)
_D10_ORACLE = f"""
    WITH corpus AS ({_DUPED_SQL}),
    toks AS (
      SELECT doc_id, {_TOKENS_SQL} AS tk FROM corpus WHERE length(text) > 0
    ),
    spans AS (
      SELECT doc_id, sp.s AS s, sp.gh AS gh FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(tk) - {_D10_N - 1}),
                 i -> struct_pack(
                   s := i,
                   gh := {_md5int_sql(f"concat_ws(' ', {_D10_SPAN_ELEMS})")}
                 ))) AS sp
        FROM toks WHERE len(tk) >= {_D10_N}
      )
    ),
    dup AS (
      SELECT gh, min(doc_id) AS owner
      FROM spans GROUP BY gh HAVING count(DISTINCT doc_id) > 1
    ),
    bad AS (
      SELECT sp.doc_id, sp.s, sp.s + {_D10_N - 1} AS e
      FROM spans sp JOIN dup USING (gh) WHERE sp.doc_id <> dup.owner
    ),
    marked AS (
      SELECT doc_id, s, e,
        CASE WHEN s > coalesce(max(e) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
             THEN 1 ELSE 0 END AS ng
      FROM bad
    ),
    grps AS (
      SELECT doc_id, s, e,
        sum(ng) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    merged AS (
      SELECT doc_id, min(s) AS s, max(e) AS e FROM grps GROUP BY doc_id, grp
    ),
    percut AS (
      SELECT doc_id, list(struct_pack(s := s, e := e) ORDER BY s) AS cuts,
             sum(e - s + 1)::INT AS cut_tokens,
             count(*)::INT AS n_cut_intervals
      FROM merged GROUP BY doc_id
    ),
    assembled AS (
      SELECT t.doc_id, len(tk)::INT AS n_tokens,
             coalesce(p.cut_tokens, 0) AS cut_tokens,
             coalesce(p.n_cut_intervals, 0) AS n_cut_intervals,
             CASE WHEN p.cuts IS NULL
                  THEN [struct_pack(s := 0, e := 0)][:0] ELSE p.cuts END AS cuts,
             tk
      FROM toks t LEFT JOIN percut p USING (doc_id)
    )
    SELECT doc_id, n_tokens, cut_tokens, n_cut_intervals,
           round((n_tokens - cut_tokens) / n_tokens + 1e-9, 4) AS kept_frac,
           {_md5int_sql(_D10_REASSEMBLE)} AS cut_fp
    FROM assembled
"""


@query("d10_substring_dup_cut", oracle=_D10_ORACLE)
def d10_substring_dup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr CUT over the planted-duplicate corpus: every
    cross-document duplicated 10-token span is excised from all but
    its min-doc_id owner; output pins tokens kept/cut, interval count,
    and the reassembled text's fingerprint. Exact planted copies
    (doc_id+1e6) lose their entire text (kept_frac 0); template
    near-dups lose their shared spans only; the owner of each span and
    unique docs are untouched (kept_frac 1).

    Scale: three linear keyed stages + one per-doc window
    (operators/exactsubstr.py); the span build is spread off the 1-2
    input splits of the documents parquet before the cached span
    table is built (the round-5 single-split trap)."""
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = _duped(spark, sf_dir).repartition(shuffle, "doc_id")
    from .queries_ml import md5int

    out = exact_substr_cut(docs, n=_D10_N)
    return out.select(
        "doc_id",
        "n_tokens",
        "cut_tokens",
        "n_cut_intervals",
        r4(F.col("kept_frac")).alias("kept_frac"),
        md5int(F.col("text_cut")).alias("cut_fp"),
    )


# ---------------------------------------------------------------------------
# s7 — IVF×PQ (the IVFADC composition, Jégou et al. 2011 §IV)
#
# s4 prunes (inverted lists) but scores raw vectors; s6 compresses
# (8-byte PQ codes + integer ADC tables) but scans every corpus code
# per probe. Production ANN composes them: a probe visits only its
# nprobe nearest coarse cells and ADC-scores only the codes in those
# cells — scored rows ∝ candidates (≈ nprobe·n/K per probe), never ∝
# corpus (test_plans pins the bound and recall@1 vs the planted
# twins). PQ here encodes the RAW vectors (both codebooks are exactly
# s4's and s6's, reused); the paper's residual refinement (encode
# x − coarse_centroid, one codebook set per composition) is the next
# accuracy step and slots in by swapping the encode/LUT inputs.
#
# Determinism: identical to the halves — every k-means argmin and ADC
# distance is decided on rounded values with id tiebreaks, so both
# engines walk the same training trajectory and produce the same
# codes, cells, and top-k.
# ---------------------------------------------------------------------------

_S7_NPROBE = 2
_S7_K = 8  # coarse cells (s4's setting)


def _ivfpq_ctes() -> str:
    """The shared WITH body of the IVFADC oracles — training replay,
    cells, codes, per-probe LUTs, candidate pruning, ADC scores — with
    no final SELECT; s7 ranks the ADC scores, s10 re-ranks a wider ADC
    shortlist by exact L2 (the FAISS 'refine' stage)."""
    pert = _PQ_PERT.format(i="i")
    return f"""
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
      FROM embeddings
    ),
    probes AS (
      SELECT vec_id + 1000000 AS probe_id,
             list_transform(generate_series(1, len(e)),
                            i -> e[i] + {pert}) AS e
      FROM base WHERE vec_id % {_PQ_EVERY} = 0
    ),
    c0 AS (SELECT vec_id AS cid, e AS c FROM base WHERE vec_id < {_S7_K}),
    a1 AS ({_sql_assign("base", "c0")}),
    c1 AS ({_sql_recenter("a1")}),
    a2 AS ({_sql_assign("base", "c1")}),
    cc AS ({_sql_recenter("a2")}),
    cells AS ({_sql_assign("base", "cc")}),
    pbase AS (SELECT probe_id AS vec_id, e FROM probes),
    pcells AS ({_sql_assign("pbase", "cc", _S7_NPROBE)}),
    sub AS (
      SELECT vec_id, j, e[(j * {_PQ_D} + 1):(j * {_PQ_D} + {_PQ_D})] AS sv
      FROM base, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS j)
    ),
    q0 AS (SELECT vec_id AS cid, j, sv AS cv FROM sub WHERE vec_id < {_PQ_K}),
    pa1 AS ({_pq_assign_sql("sub", "q0")}),
    q1 AS ({_pq_recenter_sql("pa1")}),
    pa2 AS ({_pq_assign_sql("sub", "q1")}),
    q2 AS ({_pq_recenter_sql("pa2")}),
    codes AS (
      SELECT vec_id, j, cid AS code FROM ({_pq_assign_sql("sub", "q2")})
    ),
    psub AS (
      SELECT probe_id, j,
             e[(j * {_PQ_D} + 1):(j * {_PQ_D} + {_PQ_D})] AS sv
      FROM probes, (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS j)
    ),
    lut AS (
      SELECT p.probe_id, c.j, c.cid,
             CAST(round({_l2_sql("p.sv", "c.cv")} * 1000000.0 + 1e-9, 0)
                  AS BIGINT) AS pd_x1e6
      FROM psub p JOIN q2 c ON c.j = p.j
    ),
    cand AS (
      SELECT p.vec_id AS probe_id, x.vec_id AS neighbor_id
      FROM pcells p JOIN cells x ON x.cid = p.cid
    ),
    adc AS (
      SELECT cd.probe_id, cd.neighbor_id, sum(l.pd_x1e6) AS d_x1e6
      FROM cand cd
      JOIN codes x ON x.vec_id = cd.neighbor_id
      JOIN lut l ON l.probe_id = cd.probe_id
               AND l.j = x.j AND l.cid = x.code
      GROUP BY cd.probe_id, cd.neighbor_id
    )"""


def _s7_oracle() -> str:
    return f"""{_ivfpq_ctes()}
    SELECT probe_id, neighbor_id,
           round(d_x1e6 / 1000000.0 + 1e-9, 4) AS approx_dist
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
        ORDER BY d_x1e6, neighbor_id) AS rk
      FROM adc
    ) WHERE rk <= {_PQ_TOPK}
    """


def ivfpq_parts(spark: SparkSession, sf_dir: str):
    """The composed pipeline's intermediate frames, exposed so tests
    can assert the scored-candidate bound and recall without
    re-deriving the training, and so s10 can re-rank the raw ADC
    scores. Returns (probes, cells, cand, adc, topk)."""
    from .operators.veccluster import (
        adc_sum,
        codes_as_array,
        emb_dim,
        fast_assign,
        fast_recenter,
        flat_lut,
        pq_fast_assign,
        pq_fast_recenter,
    )

    # spread the training/encode work off the 1-6 parquet input splits
    # (guide §2.5 — the r07 fix measured on s6/s8; same pipeline here)
    par = spark.sparkContext.defaultParallelism
    base = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
        .repartition(par)
    )
    pert_i = F.expr(
        f"transform(sequence(1, {_PQ_M * _PQ_D}), i -> "
        f"element_at(e, i) + {_PQ_PERT.format(i='i')})"
    )
    probes = base.filter(F.col("vec_id") % _PQ_EVERY == 0).select(
        (F.col("vec_id") + 1000000).alias("probe_id"),
        pert_i.alias("e"),
    )

    # coarse quantizer (s4's trajectory: first-K seeds, 2 Lloyd iters;
    # fast_assign = result-identical argmax via hoisted norms + max_by)
    cc = base.filter(F.col("vec_id") < _S7_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("c")
    )
    dim = emb_dim(sf_dir)
    for _ in range(2):
        cc = fast_recenter(fast_assign(base, cc), dim)
    cc = cc.cache()  # feeds cells AND pcells
    cells = fast_assign(base, cc).select("vec_id", "cid").cache()
    pcells = (
        fast_assign(
            probes.select(F.col("probe_id").alias("vec_id"), "e"),
            cc,
            nprobe=_S7_NPROBE,
        )
        .select(F.col("vec_id").alias("probe_id"), "cid")
    )

    # PQ codebooks (s6's trajectory) + corpus codes
    sub = _pq_sub(base, "vec_id").cache()
    q = sub.filter(F.col("vec_id") < _PQ_K).select(
        F.col("vec_id").alias("cid"), "j", F.col("sv").alias("cv")
    )
    for _ in range(2):
        q = pq_fast_recenter(pq_fast_assign(sub, q, _pq_l2), _PQ_D)
    q = q.cache()  # feeds codes AND the LUT
    codes = pq_fast_assign(sub, q, _pq_l2).select(
        "vec_id", "j", F.col("cid").alias("code")
    )

    # per-probe ADC lookup tables (integer-scaled, broadcastable:
    # probes × m × k rows)
    psub = _pq_sub(probes, "probe_id")
    p, c = psub.alias("p"), F.broadcast(q).alias("c")
    lut = p.join(c, F.col("p.j") == F.col("c.j")).select(
        "probe_id",
        F.col("c.j").alias("j"),
        "cid",
        F.round(
            _pq_l2(F.col("p.sv"), F.col("c.cv")) * 1000000.0 + F.lit(1e-9), 0
        )
        .cast("long")
        .alias("pd_x1e6"),
    )

    # THE composition: candidates = members of each probe's nprobe
    # cells; only their codes flow into the ADC scoring. r07 ADC
    # restructure (same as s6's, guide §2.3): each vector's m codes in
    # ONE array row, each probe's LUT flattened to an m·k-slot array,
    # the distance an inline integer sum — the old (j, code)-keyed
    # m-way join + |cand|-group hash aggregate disappears. The explicit
    # repartition re-spreads the AQE-coalesced aggregate outputs before
    # the ×probes fan-out (guide §2.5).
    cand = pcells.join(cells, "cid").select(
        "probe_id", F.col("vec_id").alias("neighbor_id")
    )
    carr = codes_as_array(codes, _PQ_M)
    lutf = flat_lut(lut, _PQ_M, _PQ_K)
    adc = (
        cells.repartition(par)
        .join(F.broadcast(pcells), "cid")
        .join(F.broadcast(carr), "vec_id")
        .join(F.broadcast(lutf), "probe_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            adc_sum(F.col("code_arr"), F.col("lut_flat"), _PQ_M, _PQ_K).alias(
                "d_x1e6"
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy("d_x1e6", "neighbor_id")
    topk = (
        adc.select(
            F.col("probe_id"),
            F.col("neighbor_id"),
            "d_x1e6",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= _PQ_TOPK)
        .select(
            "probe_id",
            "neighbor_id",
            F.round(F.col("d_x1e6") / 1000000.0 + F.lit(1e-9), 4).alias(
                "approx_dist"
            ),
        )
    )
    return probes, cells, cand, adc, topk


@query("s7_ivfpq_ann", oracle=_s7_oracle())
def s7_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ ANN (IVFADC): coarse k-means lists prune each probe to
    nprobe=2 cells, PQ codes + integer ADC tables score ONLY those
    candidates, top-3 per planted perturbed-twin probe."""
    _, _, _, _, topk = ivfpq_parts(spark, sf_dir)
    return topk


# ---------------------------------------------------------------------------
# s10 — IVFADC + exact re-rank (the FAISS "refine" stage, IVFADC,R)
# ---------------------------------------------------------------------------
# PQ distances are biased estimators (quantization error), so the
# published production shape re-ranks a WIDER ADC shortlist by exact
# distance over the raw vectors before emitting top-k. The scale
# contract is what matters: raw vectors are re-read for probes × C
# shortlist rows only — never for the corpus, never for the full
# candidate lists — so the refine cost is a broadcast-joined constant
# per probe while the big joins stay in 8-byte-code space.

_S10_C = 12  # ADC shortlist per probe handed to the exact re-rank


def _s10_oracle() -> str:
    return f"""{_ivfpq_ctes()},
    short AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY d_x1e6, neighbor_id) AS rk
        FROM adc
      ) WHERE rk <= {_S10_C}
    ),
    ex AS (
      SELECT s.probe_id, s.neighbor_id,
             CAST(round({_l2_sql("p.e", "x.e")} * 1000000.0 + 1e-9, 0)
                  AS BIGINT) AS ed_x1e6
      FROM short s
      JOIN probes p ON p.probe_id = s.probe_id
      JOIN base x ON x.vec_id = s.neighbor_id
    )
    SELECT probe_id, neighbor_id,
           round(ed_x1e6 / 1000000.0 + 1e-9, 4) AS exact_dist
    FROM (
      SELECT *, row_number() OVER (PARTITION BY probe_id
        ORDER BY ed_x1e6, neighbor_id) AS rk
      FROM ex
    ) WHERE rk <= {_PQ_TOPK}
    """


@query("s10_ivfpq_rerank", oracle=_s10_oracle())
def s10_ivfpq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC + refine: the ADC shortlist (C=12 per probe) is
    re-ranked by EXACT L2 over raw vectors — same fold order as the
    SQL twin, integer-scaled — and only then cut to top-3.
    Raw vectors flow through a broadcast join of probes × C rows; the
    corpus-sized joins upstream stay in code space (s7's plan)."""
    probes, _, _, adc, _ = ivfpq_parts(spark, sf_dir)
    w = Window.partitionBy("probe_id").orderBy("d_x1e6", "neighbor_id")
    short = (
        adc.select("probe_id", "neighbor_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _S10_C)
        .select("probe_id", "neighbor_id")
    )
    base = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("xe"),
    )
    pe = probes.select("probe_id", F.col("e").alias("pe"))
    ex = (
        short.join(base, "neighbor_id")
        .join(F.broadcast(pe), "probe_id")
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                _pq_l2(F.col("pe"), F.col("xe")) * 1000000.0 + F.lit(1e-9), 0
            )
            .cast("long")
            .alias("ed_x1e6"),
        )
    )
    w2 = Window.partitionBy("probe_id").orderBy("ed_x1e6", "neighbor_id")
    return (
        ex.select(
            "probe_id", "neighbor_id", "ed_x1e6", F.row_number().over(w2).alias("rk")
        )
        .filter(F.col("rk") <= _PQ_TOPK)
        .select(
            "probe_id",
            "neighbor_id",
            F.round(F.col("ed_x1e6") / 1000000.0 + F.lit(1e-9), 4).alias(
                "exact_dist"
            ),
        )
    )
