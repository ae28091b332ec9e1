"""Refresh QUERY_FPS.json — the fingerprint half of the driver-gate
rotation ledger (round-4 advice item 2).

For every registry query with a green row in any committed
CORRECTNESS_r*.json, record the sha256 fingerprint of its defining
MODULE as of the given git rev (default: HEAD — run this at ROUND
START, before editing, so the stamped fingerprints describe exactly
the code the driver verified). all_queries.py then treats a green row
whose module has since changed as never-checked, sorting the query
back into the driver gate's first 50.

Usage: python scripts/update_query_fps.py [git-rev]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    import inspect

    from housing_crawler_spark.all_queries import _last_green_round
    from housing_crawler_spark.queries import REGISTRY

    last = _last_green_round()
    out: dict[str, str] = {}
    fp_cache: dict[str, str] = {}
    for name, qd in REGISTRY.items():
        if name not in last:
            continue  # never driver-green: stays unstamped (front of gate)
        path = os.path.relpath(inspect.getsourcefile(qd.fn), _ROOT)
        if path not in fp_cache:
            blob = subprocess.run(
                ["git", "-C", _ROOT, "show", f"{rev}:{path}"],
                capture_output=True,
                check=True,
            ).stdout
            fp_cache[path] = hashlib.sha256(blob).hexdigest()[:16]
        out[name] = fp_cache[path]
    dst = os.path.join(_ROOT, "QUERY_FPS.json")
    with open(dst, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1)
    print(f"stamped {len(out)} queries at {rev} -> {dst}")


if __name__ == "__main__":
    main()
