"""operators/rangejoin.interval_join vs a naive theta-join oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from housing_crawler_spark.operators.rangejoin import interval_join


def _world(spark, seed, n_pts=400, n_iv=60, dom=10_000):
    rng = np.random.RandomState(seed)
    pts = spark.createDataFrame(
        [(int(i), int(rng.randint(0, dom))) for i in range(n_pts)],
        "pid long, k long",
    )
    ivs = []
    for j in range(n_iv):
        lo = int(rng.randint(0, dom))
        ivs.append((int(j), lo, lo + int(rng.randint(0, dom // 8))))
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    return pts, iv


def _naive(pts, iv):
    return pts.crossJoin(iv).where(F.col("k").between(F.col("lo"), F.col("hi")))


@pytest.mark.parametrize("bucket", [1, 7, 64, 1_000, 50_000])
def test_matches_naive_theta_join(spark, bucket):
    """Exact multiset equality against the cross-join filter for bucket
    widths from degenerate (1: max replication) to whole-domain
    (50_000: every row in one bucket)."""
    pts, iv = _world(spark, seed=bucket)
    got = sorted(
        interval_join(
            pts, iv, point_key="k", lo="lo", hi="hi", bucket_width=bucket
        ).collect()
    )
    want = sorted(_naive(pts, iv).collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got  # non-vacuous: some pairs matched


def test_broadcast_variant_identical(spark):
    pts, iv = _world(spark, seed=99)
    a = sorted(
        map(
            tuple,
            interval_join(
                pts, iv, point_key="k", lo="lo", hi="hi", bucket_width=256
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            interval_join(
                pts,
                iv,
                point_key="k",
                lo="lo",
                hi="hi",
                bucket_width=256,
                broadcast_intervals=True,
            ).collect(),
        )
    )
    assert a == b and a


def test_bounds_inclusive_and_exactly_once(spark):
    """Points exactly on lo and hi match; a pair qualifying across a
    bucket boundary appears exactly once (the interval spans 3 buckets
    at width 10, the point sits in the middle one)."""
    pts = spark.createDataFrame([(1, 10), (2, 25), (3, 30), (4, 31)], "pid long, k long")
    iv = spark.createDataFrame([(7, 10, 30)], "iid long, lo long, hi long")
    rows = interval_join(
        pts, iv, point_key="k", lo="lo", hi="hi", bucket_width=10
    ).collect()
    matched = sorted(r.pid for r in rows)
    assert matched == [1, 2, 3]  # 31 excluded, both bounds inclusive
    assert len(rows) == len(set((r.pid, r.iid) for r in rows))


def test_column_collision_asserts(spark):
    pts, iv = _world(spark, seed=1)
    with pytest.raises(AssertionError, match="collision"):
        interval_join(
            pts.withColumnRenamed("pid", "lo"),
            iv,
            point_key="k",
            lo="lo",
            hi="hi",
            bucket_width=10,
        )
