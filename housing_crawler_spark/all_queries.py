"""Import every query module so the full REGISTRY is populated."""

from __future__ import annotations

from . import queries as _q  # noqa: F401  (base operators)
from . import queries_analytics as _qa  # noqa: F401  (A/W/J/F families)
from . import queries_etl as _qe  # noqa: F401  (reference ETL semantics)
from . import queries_ml as _qml  # noqa: F401  (text/dedup/similarity)
from . import queries_more as _qmo  # noqa: F401  (long-tail §2 shapes)
from . import queries_multimodal as _qmm  # noqa: F401  (image columns)
from .queries import REGISTRY

__all__ = ["REGISTRY"]
