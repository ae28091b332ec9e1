"""robots.txt parsing as native column expressions.

The reference honors robots.txt implicitly through wg-gesucht's crawl
etiquette (fixed sleeps, crawl_wggesucht.py:79,302-307); the engine
models it explicitly: per-host rules (disallow prefix + crawl delay)
gate discovered links and set politeness budgets
(operators/frontier.robots_gate / with_budgets).

This module turns RAW robots.txt text — one blob per host, as a fetch
of /robots.txt would return — into those rule rows without leaving the
JVM: regexp over the ``User-agent: *`` block. Simplified single-agent
model (first Disallow + first Crawl-delay of the ``*`` block), which is
exactly the subset the engine's gate consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the rules block for User-agent: * — up to the next User-agent or EOF
_STAR_BLOCK = r"(?s)User-agent: \*\n(.*?)(?:\nUser-agent:|$)"


def star_block(txt: Column) -> Column:
    return F.regexp_extract(txt, _STAR_BLOCK, 1)


def disallow_prefix(txt: Column) -> Column:
    """First Disallow path of the ``*`` block ('' → nothing disallowed)."""
    return F.regexp_extract(star_block(txt), r"Disallow: *([^\n]*)", 1)


def crawl_delay_s(txt: Column, default: int = 1) -> Column:
    d = F.regexp_extract(star_block(txt), r"Crawl-delay: *([0-9]+)", 1)
    return F.coalesce(F.nullif(d, F.lit("")).cast("int"), F.lit(default))


def parse_robots(df: DataFrame, txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) → the engine's ROBOTS rule rows."""
    t = F.col(txt_col)
    return df.select(
        "host",
        disallow_prefix(t).alias("disallow_prefix"),
        crawl_delay_s(t).alias("crawl_delay_s"),
    )
