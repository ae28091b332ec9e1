"""operators/exactsubstr.py — the ExactSubstr CUT (Lee et al. 2022
keep-one-copy span excision) on constructed corpora where the right
answer is checkable by hand. The round-5 verdict's required pin: two
duplicated spans SHARING tokens inside one victim doc must merge into
one cut interval (no double-count, no re-cut)."""

from __future__ import annotations

import pytest

from housing_crawler_spark.operators.exactsubstr import (
    exact_substr_cut,
    merge_intervals,
)


def _run(spark, docs, n):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = exact_substr_cut(df, n=n).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def test_overlapping_dup_spans_merge_into_one_interval(spark):
    """Victim doc 2 contains 'a b c d e' — two overlapping duplicated
    4-token spans ('a b c d' at pos 2, 'b c d e' at pos 3) → ONE merged
    cut interval [2,6], 5 tokens removed, not 8."""
    got = _run(
        spark,
        [(1, "a b c d e f g h"), (2, "x a b c d e y z")],
        n=4,
    )
    assert got[1]["text_cut"] == "a b c d e f g h"  # owner untouched
    assert got[1]["cut_tokens"] == 0
    v = got[2]
    assert v["n_cut_intervals"] == 1
    assert v["cut_tokens"] == 5
    assert v["text_cut"] == "x y z"
    assert v["kept_frac"] == pytest.approx(3 / 8)


def test_two_disjoint_cut_intervals(spark):
    """Victim doc 3 duplicates doc 1's prefix twice, separated by
    unique filler → two disjoint merged intervals; the filler and
    nothing else survives."""
    got = _run(
        spark,
        [(1, "a b c d e f g h"), (3, "a b c d e f q r a b c d e")],
        n=4,
    )
    v = got[3]
    assert v["n_cut_intervals"] == 2
    assert v["cut_tokens"] == 11
    assert v["text_cut"] == "q r"


def test_exact_copy_cuts_to_empty(spark):
    """A full copy loses every token (the keep-one-copy policy); the
    min-doc_id owner keeps all of them."""
    text = " ".join(f"t{i}" for i in range(12))
    got = _run(spark, [(5, text), (9, text)], n=4)
    assert got[5]["text_cut"] == text
    assert got[9]["text_cut"] == ""
    assert got[9]["cut_tokens"] == 12
    assert got[9]["kept_frac"] == 0.0
    assert got[9]["n_cut_intervals"] == 1


def test_short_docs_and_unique_docs_untouched(spark):
    got = _run(
        spark,
        [(1, "a b c"), (2, "a b c"), (3, "p q r s t u v w")],
        n=4,
    )
    # docs 1/2 are identical but SHORTER than a span: no span exists,
    # nothing to cut (span-granularity semantics, same as d9's audit)
    for d in (1, 2, 3):
        assert got[d]["cut_tokens"] == 0
        assert got[d]["kept_frac"] == 1.0
    assert got[3]["text_cut"] == "p q r s t u v w"


def test_back_to_back_cuts_merge(spark):
    """Adjacent (touching, non-overlapping) bad intervals merge too:
    victim copies doc 1's tokens 1-4 and doc 2's tokens 1-4 back to
    back → cut [1,4] and [5,8] merge into one interval [1,8]."""
    got = _run(
        spark,
        [
            (1, "a b c d w1 w2 w3 w4"),
            (2, "e f g h y1 y2 y3 y4"),
            (7, "a b c d e f g h z1 z2 z3"),
        ],
        n=4,
    )
    v = got[7]
    # spans of doc 7: 'a b c d'(1) dup w/ doc1, 'e f g h'(5) dup w/
    # doc2; the bridging spans ('b c d e' etc.) are unique to doc 7
    assert v["n_cut_intervals"] == 1
    assert v["cut_tokens"] == 8
    assert v["text_cut"] == "z1 z2 z3"


def test_merge_intervals_unit(spark):
    rows = [
        (1, 1, 4),
        (1, 3, 6),  # overlaps → same island
        (1, 7, 9),  # touches [.,6] (gap of zero tokens) → merges too
        (1, 11, 12),  # gap at token 10 → NEW island
        (2, 5, 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, s int, e int")
    got = sorted(
        (r["doc_id"], r["s"], r["e"]) for r in merge_intervals(df).collect()
    )
    assert got == [(1, 1, 9), (1, 11, 12), (2, 5, 5)]
