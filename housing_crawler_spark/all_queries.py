"""Import every query module so the full REGISTRY is populated, then
order it for the driver's correctness gate.

The driver checks the FIRST 50 registry entries against their DuckDB
oracles (CORRECTNESS_r01 covered exactly positions 0-49), so ordering
is coverage policy: queries that are new this round or that never got a
driver row lead; queries already proven green in a previous round's
CORRECTNESS file fill the remaining slots in stable order. Everything
is ALSO checked locally by tests/test_queries.py regardless of
position — the rotation only affects which get the driver's
independent re-check this round (see COVERAGE.md).
"""

from __future__ import annotations

from . import queries as _q  # noqa: F401  (base operators)
from . import queries_analytics as _qa  # noqa: F401  (A/W/J/F families)
from . import queries_etl as _qe  # noqa: F401  (reference ETL semantics)
from . import queries_etl_pipeline as _qep  # noqa: F401  (6-stage ETL oracles)
from . import queries_ml as _qml  # noqa: F401  (text/dedup/similarity)
from . import queries_ml2 as _qml2  # noqa: F401  (chained dedup/ANN pipelines)
from . import queries_more as _qmo  # noqa: F401  (long-tail §2 shapes)
from . import queries_multimodal as _qmm  # noqa: F401  (image columns)
from .queries import REGISTRY as _R

# new in round 2, or had no CORRECTNESS_r01 row (driver cap), or failed
# the r01 hash gate (j3) — these get the driver's check first
_PRIORITY = [
    "j3_grid_spatial_join",
    "etl1_prepare",
    "etl2_filter",
    "etl3_numerical",
    "etl4_split",
    "etl5_features",
    "etl6_impute",
    "e6_relative_time",
    "e7_city_normalize",
    "d7_dedup_pipeline",
    "s3_ann_near_dup",
    "s4_ivf_ann",
    "c2_robots_parse",
    "m2_phash_near_dup",
    "a10_rowwise_mean",
    "w4_rank_groups_by_mean",
    "f5_bbox_null_outside",
    "g1_geocode_fallback_join",
    "r1_rollup",
    "p1_exact_percentiles",
]

_missing = [n for n in _PRIORITY if n not in _R]
assert not _missing, f"priority list names unknown queries: {_missing}"
REGISTRY = {name: _R[name] for name in _PRIORITY}
for _name, _qd in _R.items():
    if _name not in REGISTRY:
        REGISTRY[_name] = _qd

__all__ = ["REGISTRY"]
