"""ExactSubstr deduplication — the CUT operator (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", §3:
remove every duplicated span from all but one copy, keep the
remainder of each document).

d9 (queries_ml2.py) AUDITS this signal — per-doc duplicated-span
fraction; this module implements the rewrite the published recipe
actually performs, at token-span granularity:

1. positional spans: every run of ``n`` consecutive tokens, hashed to
   int64 BEFORE any shuffle (same portable md5→60-bit scheme as d9 so
   the DuckDB twin hashes identically);
2. a span is DUPLICATED when it occurs in >1 distinct document; its
   canonical OWNER is the min doc_id containing it (keep-one-copy) —
   the owner keeps the span, every other doc excises it;
3. per victim doc, overlapping/adjacent bad spans are merged into
   disjoint cut intervals with one running-max window (the classic
   islands construction — two window frames over one sort);
4. the kept text is reassembled natively: the complement keep-ranges
   are built from the sorted cut array and sliced out of the token
   array with zip_with + slice, then rejoined with single spaces.

Inherent semantic note: excision joins the fragments flanking a cut
with a single space, which creates NEW token adjacencies that did not
exist in the original document (exactly as in the published recipe,
which splices bytes around removed spans).

100 TB shape: three linear keyed stages (span groupBy, bad-span
equi-join back onto positions, per-doc window + aggregate) — no
all-pairs, nothing proportional to corpus², join fan-in bounded by
span multiplicity. The per-doc window sorts each doc's cut spans
inside one task: bounded by doc length / n, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _md5int(c: Column) -> Column:
    """Portable 60-bit hash (same as queries_ml.md5int; duplicated here
    so the operator layer has no import cycle with the query layer)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def positional_spans(toks: DataFrame, n: int) -> DataFrame:
    """(doc_id, s, gh): the hash of the n-token span starting at
    1-based token position s, one row per position (NOT distinct —
    positions matter for cutting). Docs shorter than n emit nothing."""
    tk = F.col("tk")
    span_at = lambda i: _md5int(  # noqa: E731
        F.concat_ws(" ", *[F.element_at(tk, i + k) for k in range(n)])
    )
    return (
        toks.filter(F.size(tk) >= n)  # sequence(1,0) would DESCEND
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                    lambda i: F.struct(
                        i.alias("s"), span_at(i).alias("gh")
                    ),
                )
            ).alias("sp"),
        )
        .select("doc_id", F.col("sp.s").alias("s"), F.col("sp.gh").alias("gh"))
    )


def merge_intervals(bad: DataFrame) -> DataFrame:
    """(doc_id, s, e) possibly-overlapping integer token intervals →
    disjoint MAXIMAL merged intervals, via the islands construction: a
    row opens a new island only when a non-empty gap separates it from
    every earlier row (s > running_max_e + 1) — back-to-back intervals
    [1,4],[5,8] merge too, since zero tokens survive between them."""
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    opens = F.when(
        prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), 1
    ).otherwise(0)
    return (
        bad.withColumn("__grp", F.sum(opens).over(w_run))
        .groupBy("doc_id", "__grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .drop("__grp")
    )


def exact_substr_cut(docs: DataFrame, n: int = 10) -> DataFrame:
    """docs(doc_id, text) → one row per doc with the duplicated spans
    excised (keep-one-copy: the min-doc_id owner of each span keeps
    it).

    Output: doc_id, n_tokens, cut_tokens, n_cut_intervals, kept_frac
    (double, unrounded), text_cut (tokens outside every cut interval,
    single-space-joined; '' when the whole doc was duplicated).
    """
    toks = docs.filter(F.length("text") > 0).select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("tk")
    )
    spans = positional_spans(toks, n).cache()
    dup = (
        spans.groupBy("gh")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("nd") > 1)
        .select("gh", "owner")
    )
    bad = (
        spans.join(dup, "gh")
        .filter(F.col("doc_id") != F.col("owner"))
        .select("doc_id", "s", (F.col("s") + (n - 1)).alias("e"))
    )
    cuts = merge_intervals(bad)
    per_doc = cuts.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("cuts"),
        F.sum(F.col("e") - F.col("s") + 1).alias("cut_tokens"),
        F.count(F.lit(1)).alias("n_cut_intervals"),
    )

    tk = F.col("tk")
    cuts_arr = F.coalesce(
        F.col("cuts"), F.expr("CAST(array() AS array<struct<s:int,e:int>>)")
    )
    # keep-ranges = complement of the sorted disjoint cuts within
    # [1, len]; a range can be empty (cut at the very start/end, or
    # back-to-back cuts) — slice length is clamped at 0. e can exceed
    # len only never (spans end within the doc), so no upper clamp.
    starts = F.concat(
        F.array(F.lit(1)), F.transform(cuts_arr, lambda c: c["e"] + 1)
    )
    ends = F.concat(
        F.transform(cuts_arr, lambda c: c["s"] - 1), F.array(F.size(tk))
    )
    kept = F.flatten(
        F.zip_with(
            starts,
            ends,
            lambda a, b: F.slice(tk, a, F.greatest(F.lit(0), b - a + 1)),
        )
    )
    n_tokens = F.size(tk)
    cut_tokens = F.coalesce(F.col("cut_tokens"), F.lit(0))
    out = toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        n_tokens.cast("int").alias("n_tokens"),
        cut_tokens.cast("int").alias("cut_tokens"),
        F.coalesce(F.col("n_cut_intervals"), F.lit(0))
        .cast("int")
        .alias("n_cut_intervals"),
        ((n_tokens - cut_tokens).cast("double") / n_tokens).alias(
            "kept_frac"
        ),
        F.array_join(kept, " ").alias("text_cut"),
    )
    return out
