"""Generic bucketed interval join: point ∈ [lo, hi] as an equi-join.

Spark has no native range-join optimization — a plain
``points.join(intervals, pt.between(lo, hi))`` plans as a
BroadcastNestedLoopJoin (O(n·m) comparisons, and a full cartesian
shuffle when neither side broadcasts). The classic distributed rewrite
(Databricks' range-join bins, DuckDB's IEJoin literature) buckets the
domain: each point lands in exactly ONE fixed-width bucket, each
interval is replicated to every bucket it overlaps, and the theta join
becomes a hash equi-join on the bucket id followed by the exact
``BETWEEN`` refinement.

Correctness shape: a qualifying (point, interval) pair meets in
exactly one bucket — the point's — so the output needs NO post-join
dedup; the refinement only ever removes pairs whose bucket collided
without overlap.

Scale shape (the reason this exists):
- The equi-join shuffles both sides by bucket id once; with
  ``bucket_width`` ≈ the p95 interval width the interval side's
  replication factor is ≤ ~2 (``ceil(width / bucket_width) + 1``
  copies per interval). Too-small buckets blow up replication;
  too-large buckets degrade the refinement selectivity — width is the
  single tuning knob, exposed per call.
- Hot buckets (a burst of points in one bucket) are ordinary equi-join
  skew: AQE's skew-join split handles them because this IS a plain
  shuffle hash join after the rewrite — which a nested-loop theta join
  would not get.
- ``broadcast_intervals=True`` keeps the point side shuffle-free
  entirely (broadcast hash join on the bucket id) — the right call
  when the interval side is a dimension (campaigns, maintenance
  windows) and the point side is the 100 TB fact.

Both sides must carry disjoint column names apart from the key
columns named in the call (asserted). Works on any integral domain —
callers join timestamps by converting to epoch seconds first, which
also keeps the arithmetic bit-identical across engines
(tests/test_rangejoin.py pins the operator against a naive
cross-join filter oracle over randomized inputs and bucket widths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__ij_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_key: str,
    lo: str,
    hi: str,
    bucket_width: int,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join every point row to every interval row with
    ``lo <= point_key <= hi`` (both bounds inclusive), returning all
    columns of both inputs. ``bucket_width`` is in the key's own units
    and must be positive."""
    assert bucket_width > 0, bucket_width
    overlap = (set(points.columns) & set(intervals.columns)) - set()
    assert not overlap, f"column collision: {sorted(overlap)}"

    pb = points.withColumn(_B, F.floor(F.col(point_key) / bucket_width))
    ib = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width),
                F.floor(F.col(hi) / bucket_width),
            )
        ),
    )
    if broadcast_intervals:
        ib = F.broadcast(ib)
    return (
        pb.join(ib, _B)
        .where(F.col(point_key).between(F.col(lo), F.col(hi)))
        .drop(_B)
    )
