"""Generic point-in-time (as-of, backward, inclusive) join.

For every left row, attach the right row with the greatest timestamp
``ts`` ≤ the left row's ``ts`` within the same ``by`` key — the
semantics of DuckDB/kdb ``ASOF LEFT JOIN`` with ``l.ts >= r.ts`` and
of ``pandas.merge_asof(direction="backward",
allow_exact_matches=True)`` (tests/test_asof.py pins both).

Scale shape (the reason this exists instead of a range join): the two
streams are tagged and unioned, then ONE cumulative window per ``by``
key carries the latest right payload forward — a single shuffle keyed
by ``by``, O(n log n_partition) for the sort, no join at all. A range
join would rewrite this as an inequality join (O(n·m) worst case or a
binning scheme); a per-key collect would not be distributed.

Requirement: the right side must be UNIQUE per (by, ts) — otherwise
"the" matching row is ill-defined. Callers pre-aggregate (j9 keeps
max_by event_id); this function asserts nothing at runtime because
the check would cost a full pass.

Right rows sort BEFORE left rows at equal ts (inclusive match). Left
rows never affect each other: they carry a NULL right-payload STRUCT,
which ``last(ignorenulls)`` skips, so ties among left rows are
harmless. All right columns travel inside ONE struct carried by a
single ``last(ignorenulls=True)`` — so a matched right row whose
payload VALUE is NULL still wins (the struct itself is non-null), and
every ``*_matched`` output column comes from the SAME right row.
Carrying each column independently (the pre-round-6 shape) silently
mixed rows: a NULL payload fell back to an older right row's value
while ``ts_matched`` pointed at the newer row.

Scale note — hot keys (round-5 verdict): the window sorts each ``by``
key inside one task. That is inherent to as-of semantics (the running
"latest right row" is a sequential scan per key), so a key holding
10^8 rows at 100 TB pools one task. This is the documented decision:
callers with a known-skewed key should pre-split it by a coarse time
bucket and as-of join twice (bucket-local pass + one row per bucket
boundary), which composes from this operator; the engine's own keys
(user_id in j9) are near-uniform. test_asof pins that a single key
holding 10^5 rows completes correctly in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "__asof_is_left"
_PAY = "__asof_right_payload"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join: all left columns, plus for each ``c`` in
    ``right_cols`` the matched right row's value (NULL if no right row
    at-or-before), plus ``{ts}_matched`` — the matched right row's
    timestamp (for gap computations)."""
    key_cols = [*by, ts]
    left_only = [c for c in left.columns if c not in key_cols]
    r_schema = dict(zip(right.schema.names, right.schema.fields))
    l_schema = dict(zip(left.schema.names, left.schema.fields))

    # one struct = the whole matched-right-row payload (+ its ts); its
    # type is derived from the right schema so the left side's NULL
    # literal casts exactly
    pay_fields = [*right_cols, ts]
    pay_type = (
        "struct<"
        + ",".join(
            f"{c}:{r_schema[c].dataType.simpleString()}" for c in pay_fields
        )
        + ">"
    )
    tagged_left = left.select(
        *key_cols,
        F.lit(1).alias(_TAG),
        *left_only,
        F.lit(None).cast(pay_type).alias(_PAY),
    )
    tagged_right = right.select(
        *key_cols,
        F.lit(0).alias(_TAG),
        *[
            F.lit(None).cast(l_schema[c].dataType).alias(c)
            for c in left_only
        ],
        F.struct(*[F.col(c) for c in pay_fields]).alias(_PAY),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PAY, ignorenulls=True).over(w)
    u = tagged_right.unionByName(tagged_left).select(
        *key_cols,
        _TAG,
        *left_only,
        *[matched[c].alias(f"{c}_matched") for c in right_cols],
        matched[ts].alias(f"{ts}_matched"),
    )
    return u.filter(F.col(_TAG) == 1).drop(_TAG)
