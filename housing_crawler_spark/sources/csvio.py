"""CSV source/sink — the reference's native table format (SURVEY S1).

The reference persists every table as CSV (monthly per-city ads files,
`utils.py:31-48`; consolidated `raw_data/*.csv`). The engine's store is
parquet snapshots, but interop with a reference deployment needs the
CSV round trip — with the details that actually bite:

- German label values contain commas ("Kabel, Satellit") and umlauts,
  so quoting + UTF-8 must survive the round trip byte-for-byte;
- nulls must stay distinguishable from empty strings (emptyValue vs
  nullValue — pandas' to_csv writes both as '', which the reference
  tolerates because it re-reads with NaN coercion; we pin the
  lossless convention instead). Known sentinel collision: a string
  cell whose LITERAL value is the two characters ``\\N`` reads back
  as NULL (it is written unquoted and matches nullValue) — outside
  the reference's value domain, acceptable for interop. Embedded
  newlines are likewise out of domain (read side is single-line for
  splittability; a quoted newline would need multiLine=true, which
  makes files unsplittable);
- the schema is EXPLICIT on read. inferSchema at 100 TB is a second
  full scan before the first real one — never pay it; callers pass
  the StructType they expect (or reuse a DataFrame's .schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# NULL is written as the \N sentinel (so the empty string and NULL stay
# distinguishable — pandas' to_csv writes both as '' and loses the
# difference); empty strings round-trip through the default quoted form
_OPTS = {
    "header": "true",
    "encoding": "UTF-8",
    "nullValue": "\\N",
    "escape": '"',
}


def write_ads_csv(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """Reference-convention CSV sink (header, UTF-8, lossless nulls).
    ``coalesce`` bounds the file count for small dims; leave None for
    big tables so the write stays parallel."""
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode("overwrite").options(**_OPTS).csv(path)


def read_ads_csv(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Explicit-schema CSV scan (no inferSchema — that is a second full
    pass over the data before the first query). PERMISSIVE mode keeps
    malformed rows visible rather than silently dropping them."""
    return (
        spark.read.options(**_OPTS)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )
