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
rows never affect each other: they carry NULL right payloads, which
``last(ignorenulls)`` skips, so ties among left rows are harmless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_TAG = "__asof_is_left"
_RTS = "__asof_right_ts"


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

    def _null_as(col: str, schema: dict) -> Column:
        return F.lit(None).cast(schema[col].dataType).alias(col)

    l_schema = dict(zip(left.schema.names, left.schema.fields))
    tagged_left = left.select(
        *key_cols,
        F.lit(1).alias(_TAG),
        *left_only,
        *[_null_as(c, r_schema) for c in right_cols],
        F.lit(None).cast(r_schema[ts].dataType).alias(_RTS),
    )
    tagged_right = right.select(
        *key_cols,
        F.lit(0).alias(_TAG),
        *[_null_as(c, l_schema) for c in left_only],
        *right_cols,
        F.col(ts).alias(_RTS),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(ts, _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = tagged_right.unionByName(tagged_left).select(
        *key_cols,
        _TAG,
        *left_only,
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"{c}_matched")
            for c in right_cols
        ],
        F.last(_RTS, ignorenulls=True).over(w).alias(f"{ts}_matched"),
    )
    return u.filter(F.col(_TAG) == 1).drop(_TAG)
