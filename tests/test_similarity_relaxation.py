"""F11 iterative relaxation: result bounds + equivalence with an eager
Python reference over the same rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.operators.similarity import (
    RelaxationResult,
    iterative_relaxation,
)


def _grid():
    return [(10.0,), (50.0,), (200.0,), (1000.0,), (100000.0,)]


def test_relaxation_matches_eager_python(spark, sf_smoke):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet").select(
        "event_id", "value"
    )
    probe = 50.0

    def pred(params):
        (radius,) = params
        return F.abs(F.col("value") - probe) <= radius

    res = iterative_relaxation(ev, pred, _grid(), min_rows=3, max_rows=10)
    assert isinstance(res, RelaxationResult)

    rows = [(r["event_id"], r["value"]) for r in ev.collect()]
    chosen = None
    for step, (radius,) in enumerate(_grid()):
        hits = [e for e, v in rows if abs(v - probe) <= radius]
        if 3 <= len(hits) <= 10:
            chosen = (step, sorted(hits))
            break
    if chosen is not None:
        got = sorted(r["event_id"] for r in res.df.collect())
        assert (res.step, got) == chosen
        assert 3 <= res.n <= 10
    else:
        assert res.step == -1


def test_relaxation_falls_through_to_loosest(spark, sf_smoke):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")

    def pred(params):
        (radius,) = params
        return F.col("value") > 1e12  # never matches

    res = iterative_relaxation(ev, pred, _grid())
    assert res.n == 0 and res.step == -1
