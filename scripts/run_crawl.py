"""spark-submit entry point for the crawl engine (north_rule launch path).

Cluster:
    zip -r hcs.zip housing_crawler_spark
    spark-submit --py-files hcs.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.session.timeZone=UTC \
        scripts/run_crawl.py --store /data/crawlstore --rounds 10 \
        --hosts 40 --pages 300

Local sandbox (the session factory builds local[N] and ships the
package itself):
    python scripts/run_crawl.py --store /tmp/crawlstore --rounds 5
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="snapshot store root")
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--hosts", type=int, default=40)
    p.add_argument("--pages", type=int, default=300)
    p.add_argument("--round-seconds", type=int, default=3600)
    p.add_argument("--cpus", type=int, default=None, help="local mode cores")
    p.add_argument("--resume", action="store_true", help="continue from the last committed round")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from housing_crawler_spark import synth
    from housing_crawler_spark.crawl import CrawlEngine, EngineConfig
    from housing_crawler_spark.storage.snapshots import SnapshotStore

    active = SparkSession.getActiveSession()
    if active is not None:  # launched via spark-submit — session provided
        spark = active
    else:
        from housing_crawler_spark.session import spark_session

        spark = spark_session("hcs-crawl", cores=args.cpus)

    world = synth.WorldConfig(
        n_hosts=args.hosts, base_pages=args.pages, round_seconds=args.round_seconds
    )
    store = SnapshotStore(args.store)
    engine = CrawlEngine(spark, store, world)
    if store.last_round() is None:
        engine.init_state(synth.seed_frontier_rows(world), synth.robots_rows(world))
    elif not args.resume:
        raise SystemExit(f"store {args.store} already has committed rounds; pass --resume")
    for m in engine.run(args.rounds):
        print(json.dumps({k: v for k, v in m.items() if k != "per_host_fetched"}))


if __name__ == "__main__":
    main()
