"""Per-phase crawl timings at two parallelism levels.

The engine records plan_build / fetch_and_links_exec / delta_writes /
compaction per round in its commit metrics; this runs the same world at
local[8] and local[32] (fresh JVM each) and prints both breakdowns.
See BENCH/PROFILE.md for the analysis. Env: PAGES (default 8000).
"""
import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from housing_crawler_spark.session import spark_session
from housing_crawler_spark import synth
from housing_crawler_spark.crawl import CrawlEngine, EngineConfig
from housing_crawler_spark.storage.snapshots import SnapshotStore

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
spark = spark_session("prof", cores=cpus, shuffle_partitions=cpus)
world = synth.WorldConfig(
    n_hosts=40, base_pages=int(os.environ.get("PAGES", "8000")),
    round_seconds=200000, img_lo=128, img_hi=512,
    imgs_per_detail_max=2, fmt_override="dctq", img_noise=2.0,
)
with tempfile.TemporaryDirectory(prefix="prof_") as tmp:
    eng = CrawlEngine(spark, SnapshotStore(tmp), world,
                      EngineConfig(salt_threshold=50_000, verify_decode=True))
    eng.init_state(synth.seed_frontier_rows(world), synth.robots_rows(world))
    os.sync()
    t0 = time.perf_counter()
    ms = eng.run(2)
    el = time.perf_counter() - t0
    out = {"cpus": cpus, "wall": round(el, 1),
           "urls": sum(m["n_selected"] for m in ms),
           "rounds": [{k: m["timings"].get(k) for k in
                       ("plan_build", "fetch_and_links_exec", "delta_writes", "compaction")}
                      for m in ms]}
    print("PROF " + json.dumps(out))
spark.stop()
"""

for cpus in (8, 32):
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), PAGES=os.environ.get("PAGES", "8000"))
    r = subprocess.run([sys.executable, "-c", SCRIPT], capture_output=True, text=True, env=env)
    for line in r.stdout.splitlines():
        if line.startswith("PROF "):
            print(line[5:])
    if r.returncode != 0:
        print(r.stderr[-2000:])
