"""housing_crawler_spark — a PySpark-native distributed crawl + analytics engine.

A from-scratch rebuild of the capabilities of chvieira2/housing_crawler
(reference at /root/reference, studied for behavior only):

- a distributed URL-frontier + fetch scheduler (seen-set anti-join with
  bloom pre-filter, robots gating, per-host politeness budgets, salted
  window ranking) over snapshot-versioned parquet tables of
  image + caption pairs,
- the reference's analytics/ETL query surface re-expressed as native
  Spark DataFrame/SQL plans,
- large-scale training-data pipeline operators (dedup families,
  similarity search, text analysis, multimodal columns).

Everything is DataFrame-first: no per-row Python in any hot path;
vectorized pandas/Arrow UDFs only where built-in operators genuinely
cannot express the semantics (image codecs, bloom shard construction).
"""

__version__ = "0.1.0"
