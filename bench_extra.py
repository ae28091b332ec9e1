"""Per-query isolation harness for the optimization rounds (guide §1).

NOT the driver metric — bench.py is frozen for measurement. This file
exists to (a) time ONE query through the noop sink in a fresh session,
(b) dump .explain('formatted') before/after a change, and (c) run a
subset of queries back-to-back with the same REPS/median methodology as
bench.py so before/after numbers are like-for-like.

Usage:
    python bench_extra.py time  <query> [--sf DIR] [--reps N]
    python bench_extra.py plan  <query> [--sf DIR] [--out FILE]
    python bench_extra.py sweep <q1,q2,...> [--sf DIR] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main() -> None:
    from housing_crawler_spark.all_queries import REGISTRY
    from housing_crawler_spark.session import spark_session

    mode = sys.argv[1]
    names = sys.argv[2].split(",")
    sf = _arg("--sf", SF_DIR)
    reps = int(_arg("--reps", "3"))
    spark = spark_session("hcs-bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    try:
        if mode == "plan":
            out = _arg("--out", "")
            df = REGISTRY[names[0]].fn(spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            if out:
                with open(out, "w") as fh:
                    fh.write(txt)
                print(f"wrote {out} ({len(txt)} bytes)")
            else:
                print(txt)
            return
        results = {}
        for name in names:
            times = []
            for _ in range(reps):
                df = REGISTRY[name].fn(spark, sf)
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            results[name] = {
                "median": sorted(times)[len(times) // 2],
                "samples": times,
            }
        print(json.dumps({"sf": sf, "cpus": CPUS, "results": results}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
