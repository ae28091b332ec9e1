"""Scaling-efficiency evidence for the north_rule (≥0.8 from N to 4N).

No real cluster exists in this sandbox, so the criterion is evidenced by
running the *same* crawl job at two parallelism levels — local[8] and
local[32] — on identical input (separate JVMs via subprocess), then
reporting throughput at both plus efficiency = (T32/T8) / 4.

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--crawl-only"],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo, hi = 8, 32
    r_lo, r_hi = run_at(lo), run_at(hi)
    eff = (r_hi["frontier_urls_per_sec"] / r_lo["frontier_urls_per_sec"]) / (hi / lo)
    md = f"""# BENCH — scaling evidence (local[{lo}] vs local[{hi}])

Same synthetic crawl job (seed=42, identical frontier) at two
parallelism levels, per the north_rule's two-cluster-size criterion
(sandbox evidence: cores stand in for executors).

| parallelism | frontier URLs | wall sec | URLs/sec | images |
|---|---|---|---|---|
| local[{lo}] | {r_lo["crawl_urls"]} | {r_lo["crawl_sec"]} | {r_lo["frontier_urls_per_sec"]} | {r_lo["crawl_images"]} |
| local[{hi}] | {r_hi["crawl_urls"]} | {r_hi["crawl_sec"]} | {r_hi["frontier_urls_per_sec"]} | {r_hi["crawl_images"]} |

**scaling efficiency** = ({r_hi["frontier_urls_per_sec"]} / {r_lo["frontier_urls_per_sec"]}) / {hi // lo}
= **{eff:.3f}** (target ≥ 0.8)

Reference single-thread baseline (BASELINE.md): ≤0.083 new ads/s
politeness-floor ceiling; this engine's virtual-clock politeness keeps
per-host budgets while parallelizing across hosts/partitions.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": round(eff, 3), "lo": r_lo, "hi": r_hi}))


if __name__ == "__main__":
    main()
