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

from .operators.exactsubstr import exact_substr_cut
from .queries import query, r4
from .queries_ml import _DUPED_SQL, _duped, _md5int_sql, _TOKENS_SQL

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
