"""The generic as-of join operator (operators/asof.py) pinned against
pandas.merge_asof (direction='backward', allow_exact_matches=True) on
hypothesis-generated event streams, plus deterministic edge cases and
the one-shuffle plan shape."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from housing_crawler_spark.operators.asof import asof_join_backward

# (user, ts, value) triples; small domains force ties, exact-match
# timestamps, empty right streams, and cross-user interleaving
_events = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 40), st.integers(-100, 100)
    ),
    min_size=0,
    max_size=40,
)


def _spark_asof(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, u, t, v) for i, (u, t, v) in enumerate(lefts)],
        "lid long, user_id long, ts long, lval long",
    )
    right = spark.createDataFrame(
        [(u, t, v) for (u, t), v in rights.items()],
        "user_id long, ts long, rval long",
    )
    out = asof_join_backward(
        left, right, by=["user_id"], ts="ts", right_cols=["rval"]
    )
    return {
        r["lid"]: (r["rval_matched"], r["ts_matched"])
        for r in out.collect()
    }


def _pandas_asof(lefts, rights):
    lpdf = (
        pd.DataFrame(
            [(i, u, t) for i, (u, t, _v) in enumerate(lefts)],
            columns=["lid", "user_id", "ts"],
        )
        .astype("int64")  # empty frames default to object dtype,
        .sort_values("ts", kind="stable")  # which merge_asof rejects
    )
    rpdf = (
        pd.DataFrame(
            [(u, t, v) for (u, t), v in rights.items()],
            columns=["user_id", "ts", "rval"],
        )
        .astype("int64")
        .sort_values("ts", kind="stable")
    )
    rpdf["rts"] = rpdf["ts"]
    m = pd.merge_asof(
        lpdf,
        rpdf,
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    return {
        int(r.lid): (
            None if pd.isna(r.rval) else int(r.rval),
            None if pd.isna(r.rts) else int(r.rts),
        )
        for r in m.itertuples()
    }


@given(_events, _events)
@settings(max_examples=12, deadline=None)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # the operator requires the right side unique per (by, ts): keep
    # max value, mirroring j9's pre-aggregation
    rights: dict[tuple[int, int], int] = {}
    for u, t, v in right_rows:
        rights[(u, t)] = max(v, rights.get((u, t), v))
    assert _spark_asof(spark, left_rows, rights) == _pandas_asof(
        left_rows, rights
    )


def test_asof_edges(spark):
    lefts = [
        (1, 10, 0),  # exact tie with right at ts=10 → inclusive match
        (1, 9, 0),  # before any right for user 1 → NULL
        (2, 50, 0),  # user 2 has no rights at all → NULL
        (1, 11, 0),  # after → still the ts=10 right
    ]
    rights = {(1, 10): 7, (3, 5): 99}  # user 3's right must not leak
    got = _spark_asof(spark, lefts, rights)
    assert got == {
        0: (7, 10),
        1: (None, None),
        2: (None, None),
        3: (7, 10),
    }


def test_asof_null_right_payload_stays_same_row(spark):
    """Round-5 advice: a matched right row whose payload VALUE is NULL
    must win anyway — carrying columns independently made the NULL fall
    back to an OLDER right row's value while ts_matched pointed at the
    newer row (mixed-row output). The struct-packed carry fixes it."""
    left = spark.createDataFrame(
        [(0, 1, 30)], "lid long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 20, None)],
        "user_id long, ts long, rval long",
    )
    out = asof_join_backward(
        left, right, by=["user_id"], ts="ts", right_cols=["rval"]
    ).collect()
    assert len(out) == 1
    r = out[0]
    # the ts=20 right row matches; its rval is genuinely NULL — it must
    # NOT inherit 7 from the ts=10 row
    assert r["ts_matched"] == 20
    assert r["rval_matched"] is None
    # (merge_asof's documented behavior matches: the matched row's NaN
    # payload stays NaN; the int64-only pandas twin helper can't carry a
    # nullable payload so no cross-check here)


def test_asof_hot_key_100k_single_task(spark):
    """Scale-note pin (round-5 verdict): one key holding 10^5 rows
    sorts inside a single task — slow but correct; the docstring
    documents the pre-split recipe for genuinely skewed keys."""
    n = 100_000
    left = (
        spark.range(n)
        .selectExpr("id as lid", "CAST(1 AS long) user_id", "id * 2 + 1 as ts")
    )
    right = spark.range(n).selectExpr(
        "CAST(1 AS long) user_id", "id * 2 as ts", "id as rval"
    )
    out = asof_join_backward(
        left, right, by=["user_id"], ts="ts", right_cols=["rval"]
    )
    # every left ts=2i+1 matches right ts=2i exactly
    bad = out.filter(
        (F.col("rval_matched") != (F.col("ts") - 1) / 2)
        | (F.col("ts_matched") != F.col("ts") - 1)
    ).count()
    assert bad == 0
    assert out.count() == n


def test_asof_plan_is_one_shuffle(spark):
    """The scale claim: tagged union + ONE window exchange on the by
    key — no join operator of any kind in the plan."""
    left = spark.createDataFrame(
        [(1, 1, 1)], "lid long, user_id long, ts long"
    )
    right = spark.createDataFrame([(1, 1, 2)], "user_id long, ts long, rval long")
    out = asof_join_backward(
        left, right, by=["user_id"], ts="ts", right_cols=["rval"]
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in phys and "BroadcastHashJoin" not in phys
