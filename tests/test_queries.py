"""Every registry query with an oracle must match DuckDB exactly."""

from __future__ import annotations

import pytest

from housing_crawler_spark.all_queries import REGISTRY

from .oracle_harness import compare, duckdb_run

WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_smoke, name):
    qd = REGISTRY[name]
    compare(qd.fn(spark, sf_smoke), duckdb_run(qd.oracle, sf_smoke))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_smoke, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_smoke)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
