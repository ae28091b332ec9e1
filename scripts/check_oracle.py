"""Check named registry queries against their DuckDB oracles.

Usage: python scripts/check_oracle.py q1,q2,... [--sf DIR] [--cpus N]
Mirrors the driver gate via tests/oracle_harness helpers.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    names = sys.argv[1].split(",")
    sf = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else "/root/testdata/sf0.01"
    cpus = int(sys.argv[sys.argv.index("--cpus") + 1]) if "--cpus" in sys.argv else 16

    from oracle_harness import compare, duckdb_run

    from housing_crawler_spark.all_queries import REGISTRY
    from housing_crawler_spark.session import spark_session

    spark = spark_session("hcs-check-oracle", cores=cpus, shuffle_partitions=cpus)
    failed = []
    try:
        for name in names:
            qd = REGISTRY[name]
            if qd.oracle is None:
                print(f"{name}: SKIP (no oracle)")
                continue
            try:
                compare(qd.fn(spark, sf), duckdb_run(qd.oracle, sf))
                print(f"{name}: OK")
            except Exception as e:
                failed.append(name)
                print(f"{name}: FAIL {str(e)[:500]}")
            spark.catalog.clearCache()
    finally:
        spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
