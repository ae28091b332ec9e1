"""String normalization expressions (reference string_utils.py semantics,
re-expressed as native Spark SQL functions — SURVEY §2.8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_caption(col: Column) -> Column:
    """Title/caption cleanup: strip quotes, newlines, tabs, semicolons,
    collapse runs of spaces, trim (reference crawl_wggesucht.py:288-289).
    Twin: synth.clean_caption_py."""
    s = F.regexp_replace(col, '["\\n\\t;]', "")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)


def simplify_umlauts(col: Column) -> Column:
    """ä→ae, ö→oe, ü→ue, ß→ss (reference string_utils.py:12-17)."""
    s = F.regexp_replace(col, "ä", "ae")
    s = F.regexp_replace(s, "ö", "oe")
    s = F.regexp_replace(s, "ü", "ue")
    s = F.regexp_replace(s, "Ä", "Ae")
    s = F.regexp_replace(s, "Ö", "Oe")
    s = F.regexp_replace(s, "Ü", "Ue")
    return F.regexp_replace(s, "ß", "ss")


def capitalize_city(col: Column) -> Column:
    """City-name capitalization (reference string_utils.py:32-48)."""
    return F.initcap(col)
