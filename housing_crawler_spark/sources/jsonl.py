"""JSONL document source/sink — the LLM-corpus interchange format.

Web-scale text corpora (Common Crawl derivatives, C4/RefinedWeb-style
dumps) ship as JSON-lines; this adapter moves them in and out of the
``documents`` shape the dedup/quality/langid operators run on.

Scale rules, same as csvio: the schema is EXPLICIT on read (schema
inference is a full extra pass at 100 TB), one JSON object per line
(splittable — a multiline JSON array is one unsplittable record), and
compression is left to the codec suffix (.gz files are NOT splittable;
prefer .zst/.bz2 or uncompressed behind a splittable container when a
single file must parallelize)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_docs_jsonl(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """JSON-lines sink (one object per line; ignoreNullFields off so a
    re-read with the same schema sees explicit nulls, not dropped keys)."""
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode("overwrite").option("ignoreNullFields", "false").json(path)


def read_docs_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Explicit-schema JSONL scan. PERMISSIVE mode + _corrupt_record
    stays OFF here: a malformed line yields nulls in every schema
    column rather than killing the 100 TB job (FAILFAST) or silently
    vanishing (DROPMALFORMED); quality gates downstream remove them."""
    return spark.read.option("mode", "PERMISSIVE").schema(schema).json(path)
