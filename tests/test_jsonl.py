"""JSONL corpus interchange: documents round-trip losslessly and feed
the corpus-prep pipeline (ingest → t5-style operators) unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.queries import load
from housing_crawler_spark.sources.jsonl import read_docs_jsonl, write_docs_jsonl


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip_lossless(spark, sf_smoke, tmp_path):
    docs = load(spark, sf_smoke, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_docs_jsonl(docs, path)
    back = read_docs_jsonl(spark, path, docs.schema).select(*docs.columns)
    assert _rows(back) == _rows(docs)


def test_jsonl_ingest_feeds_text_operators(spark, sf_smoke, tmp_path):
    """Ingested JSONL docs produce the same text-operator results as
    the parquet path — the operators are source-agnostic."""
    from housing_crawler_spark.queries_ml import md5int, norm_text

    docs = load(spark, sf_smoke, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs2")
    write_docs_jsonl(docs, path)
    back = read_docs_jsonl(spark, path, docs.schema)

    def fps(df):
        return sorted(
            tuple(r)
            for r in df.select(
                "doc_id", md5int(norm_text(F.col("text"))).alias("fp")
            ).collect()
        )

    assert fps(back) == fps(docs)


def test_jsonl_malformed_line_survives(spark, tmp_path):
    """A corrupt line must not kill the job (PERMISSIVE): it surfaces
    as an all-null row the downstream quality gate drops."""
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok eins"}\n'
        "NOT JSON AT ALL {{{\n"
        '{"doc_id": 2, "text": "ok zwei"}\n'
    )
    back = read_docs_jsonl(spark, str(p), "doc_id long, text string")
    rows = back.collect()
    assert len(rows) == 3
    good = [r for r in rows if r["doc_id"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    bad = [r for r in rows if r["doc_id"] is None]
    assert len(bad) == 1 and bad[0]["text"] is None
