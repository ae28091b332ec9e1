"""Refresh QUERY_FPS.json — the fingerprint half of the driver-gate
rotation ledger (round-4 advice item 2).

For every registry query whose last green row is in CORRECTNESS_rN.json,
record the sha256 fingerprint of its defining MODULE as of the commit
that introduced that CORRECTNESS file — the tree at that commit is
exactly the code the driver verified (the per-round ledger commit lands
after all of the round's work commits). all_queries.py then treats a
green row whose module has since changed as never-checked, sorting the
query back into the driver gate's first 50.

Stamping every query at one fixed rev (the old behavior) silently
blesses edits made BETWEEN a query's last green round and that rev:
a module edited in round N+1 but last driver-checked in round N kept
its green seniority and could rotate out of the gate unverified.

Usage: python scripts/update_query_fps.py   (run at round start)
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _rev_of_round(rnd: int) -> str | None:
    """Commit that last touched CORRECTNESS_r{rnd}.json (zero-padded
    and bare spellings both checked)."""
    for fname in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json"):
        r = subprocess.run(
            ["git", "-C", _ROOT, "log", "-1", "--format=%H", "--", fname],
            capture_output=True,
            text=True,
        )
        rev = r.stdout.strip()
        if rev:
            return rev
    return None


def main() -> None:
    import inspect

    from housing_crawler_spark.all_queries import _last_green_round
    from housing_crawler_spark.queries import REGISTRY

    last = _last_green_round()
    out: dict[str, str] = {}
    fp_cache: dict[tuple[str, str], str | None] = {}
    for name, qd in REGISTRY.items():
        if name not in last:
            continue  # never driver-green: stays unstamped (front of gate)
        rev = _rev_of_round(last[name])
        if rev is None:
            continue  # ledger file uncommitted: treat as never-checked
        path = os.path.relpath(inspect.getsourcefile(qd.fn), _ROOT)
        key = (rev, path)
        if key not in fp_cache:
            blob = subprocess.run(
                ["git", "-C", _ROOT, "show", f"{rev}:{path}"],
                capture_output=True,
            )
            # module may not exist at that rev (query predates a file
            # split/rename): no stamp -> sorts to the front, safe side
            fp_cache[key] = (
                hashlib.sha256(blob.stdout).hexdigest()[:16]
                if blob.returncode == 0
                else None
            )
        if fp_cache[key] is not None:
            out[name] = fp_cache[key]
    dst = os.path.join(_ROOT, "QUERY_FPS.json")
    with open(dst, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1)
    print(f"stamped {len(out)} queries (per-round revs) -> {dst}")


if __name__ == "__main__":
    main()
