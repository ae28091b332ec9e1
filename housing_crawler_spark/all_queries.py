"""Import every query module so the full REGISTRY is populated, then
order it for the driver's correctness gate.

The driver checks the FIRST 50 registry entries against their DuckDB
oracles, so ordering is coverage policy. It is SELF-MAINTAINING
(round-2 VERDICT item 2): the committed CORRECTNESS_r*.json files are
the ledger of when each query last got a green driver row, and the
registry is sorted oldest-green-first — a query that is new, never
driver-checked, or failed its last check leads; the most recently
re-verified ones fill the tail. By construction no oracle query can go
more than ceil(n_queries / 50) rounds without an independent driver
re-check. Everything is ALSO checked locally by tests/test_queries.py
regardless of position (see COVERAGE.md).

Registry-hygiene policy at 100+ queries (round-5 VERDICT item 8).
The gate re-checks GATE_SLOTS (=50) queries per round, so unbounded
growth or mass re-fronting stretches re-check latency. Two rules keep
the worst case at ONE round of latency for anything actually due:

1. **Debt must fit the gate.** ``gate_debt()`` counts queries whose
   green driver row is missing or stale (module edited since the row).
   Every round must END with debt <= GATE_SLOTS so every due query
   gets its driver row in the NEXT round at the latest — i.e. no query
   is ever >2 rounds stale-while-edited. Enforced by
   tests/test_registry_rotation.py::test_gate_debt_fits_gate, which
   fails the build the moment an editing spree or query-adding spree
   overruns the gate.
2. **New queries consume gate slack.** Adding a query costs one debt
   slot (it is never-checked by construction). Budget for a round:
   new queries + newly-edited queries <= GATE_SLOTS − debt carried in.
   When a planned family would overrun, split it across rounds or
   freeze query-module churn until the gate drains (the round-6
   approach: 4 new queries against 26 slots of slack).

There is no separate "engine-critical" tier: the crawl engine's
correctness is pinned by always-run pytest parity suites (not by the
gate), and every oracle query — engine-adjacent or long-tail — is run
by tests/test_queries.py on every local test pass regardless of gate
position. The gate ordering only decides which INDEPENDENT driver
re-checks happen first, and stalest-first is the right policy there.
"""

from __future__ import annotations

import glob
import json
import os
import re

from . import queries as _q  # noqa: F401  (base operators)
from . import queries_analytics as _qa  # noqa: F401  (A/W/J/F families)
from . import queries_crawlops as _qco  # noqa: F401  (politeness/caption audits)
from . import queries_crawlops2 as _qco2  # noqa: F401  (DUST/PageRank/revisit/watermark)
from . import queries_crawlops3 as _qco3  # noqa: F401  (mirrors/sitemap/budget/traps)
from . import queries_etl as _qe  # noqa: F401  (reference ETL semantics)
from . import queries_etl_pipeline as _qep  # noqa: F401  (6-stage ETL oracles)
from . import queries_ml as _qml  # noqa: F401  (text/dedup/similarity)
from . import queries_ml2 as _qml2  # noqa: F401  (chained dedup/ANN pipelines)
from . import queries_ml3 as _qml3  # noqa: F401  (DSIR/CCNet/as-of/LAION funnel)
from . import queries_ml4 as _qml4  # noqa: F401  (ExactSubstr cut, IVF×PQ)
from . import queries_ml5 as _qml5  # noqa: F401  (SemDeDup, D4 diversify)
from . import queries_ml6 as _qml6  # noqa: F401  (split leakage, OCR/video)
from . import queries_models as _qmd  # noqa: F401  (S10 weekly model pipeline)
from . import queries_more as _qmo  # noqa: F401  (long-tail §2 shapes)
from . import queries_multimodal as _qmm  # noqa: F401  (image columns)
from .queries import REGISTRY as _R

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green_round() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS file shows all three
    checks green (rows+schema+hash, no err). Failed/errored/absent
    rows don't count, so those queries sort to the front again."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last


def _module_fp(fn) -> str | None:
    """Content fingerprint of the module file defining a query fn —
    coarse (module-level) on purpose: oracle SQL strings are built at
    import from module-level fragments, so only the module text pins
    the full tested artifact."""
    import hashlib
    import inspect

    try:
        path = inspect.getsourcefile(fn)
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()[:16]
    except (OSError, TypeError):
        return None


def _ledger_fps() -> dict[str, str]:
    """name -> module fingerprint recorded when the query last got a
    green verification (QUERY_FPS.json, refreshed each round start by
    scripts/update_query_fps.py)."""
    try:
        with open(os.path.join(_ROOT, "QUERY_FPS.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


_LAST = _last_green_round()
_FPS = _ledger_fps()
_POS = {name: i for i, name in enumerate(_R)}


def _effective_green(name: str) -> int:
    """A green driver row only counts while the query's defining module
    is UNCHANGED since it was recorded (round-4 advice: edited-but-
    previously-green queries must re-queue like never-checked ones)."""
    rnd = _LAST.get(name, 0)
    if rnd and _FPS.get(name) != _module_fp(_R[name].fn):
        return 0
    return rnd


# Primary key: effective green round (0 = re-check due). Secondary:
# RAW last green round, so when more queries need re-checking than the
# gate's 50 slots, the stalest verification debt (never-checked, then
# oldest-green-but-edited) wins a slot and recently-driver-green
# queries with fresh edits absorb the overflow to the next round.
REGISTRY = {
    name: _R[name]
    for name in sorted(
        _R, key=lambda n: (_effective_green(n), _LAST.get(n, 0), _POS[n])
    )
}

#: Queries the driver's correctness gate re-checks per round.
GATE_SLOTS = 50


def gate_debt() -> list[str]:
    """Queries owed a driver row: never all-three-green, failed their
    last check, or edited since their green row. The hygiene policy
    (module docstring) requires len(gate_debt()) <= GATE_SLOTS at all
    times, so nothing waits more than one round for its re-check."""
    return [n for n in REGISTRY if _effective_green(n) == 0]


__all__ = ["REGISTRY", "GATE_SLOTS", "gate_debt"]
