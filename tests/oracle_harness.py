"""Local mirror of the driver's correctness gate.

Runs a registry query on Spark and its SQL oracle on DuckDB over the
same parquet files, then compares row count, column-name set, and an
order-insensitive multiset of stringified rows (columns aligned by
sorted name) — the same contract CORRECTNESS_r{N}.json is built from.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from housing_crawler_spark.queries import TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.4f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> None:
    """Raise AssertionError with a diagnostic diff on any mismatch."""
    spdf = spark_df.toPandas()
    assert sorted(spdf.columns) == sorted(oracle_pdf.columns), (
        f"schema mismatch: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spdf) == len(oracle_pdf), (
        f"rowcount mismatch: spark={len(spdf)} oracle={len(oracle_pdf)}"
    )
    a, b = canon_rows(spdf), canon_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"value mismatch; first diffs (spark, oracle): {diffs}")
