#!/usr/bin/env python
"""housing_crawler_spark — command-line entry point.

The Spark-native counterpart of the reference's CLI (reference
main.py:47-98 launches CrawlWgGesucht().crawl_all_pages for one city;
ads_table_processing.process_ads_tables runs the batch ETL). Designed
for ``spark-submit --py-files housing_crawler_spark.zip main.py …`` on
a cluster; in local mode it builds its own session.

Subcommands:

  crawl    run the distributed crawl engine for N rounds against the
           deterministic synthetic world (swap synth.fetch for a real
           HTTP client on a cluster — same mapInPandas stage), with
           checkpointed state under --store (resumes automatically)
  etl      run the full 6-stage ETL (reference process_ads_tables) on a
           raw-ads parquet table → wide analytics table parquet
  etl-store  the reference's EP2 daemon chain: run the 6-stage ETL over
           a crawl snapshot store's detail fetch output (ads_bridge) →
           wide analytics table parquet; --from-round gives the
           incremental (delta-local) variant
  train-models  walk-forward weekly price models (reference
           train_model_weeks.py daemon): one cumulative-window OLS pass
           over a raw-ads parquet → model-artifact parquet table
  query    run one registered query by name against an sf dir and show
           the first rows

Examples:
  python main.py crawl --store /tmp/crawlstate --rounds 8 --hosts 25
  python main.py etl --input raw_ads.parquet --output wide.parquet \
      --grid data/tuebingen_grid_feats.geojson
  python main.py query q1_pricing_summary --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark(args):
    from housing_crawler_spark.session import spark_session

    return spark_session("housing_crawler_spark", cores=args.cores)


def cmd_crawl(args) -> None:
    from housing_crawler_spark import synth
    from housing_crawler_spark.crawl import CrawlEngine, EngineConfig
    from housing_crawler_spark.storage.snapshots import SnapshotStore

    spark = _spark(args)
    world = synth.WorldConfig(n_hosts=args.hosts, base_pages=args.pages)
    store = SnapshotStore(args.store)
    eng = CrawlEngine(spark, store, world, EngineConfig())
    if store.last_round() is None:
        eng.init_state(synth.seed_frontier_rows(world), synth.robots_rows(world))
    for m in eng.run(args.rounds):
        print(json.dumps({k: m[k] for k in ("n_selected", "n_new_known", "n_known")}))


def cmd_etl(args) -> None:
    from housing_crawler_spark.etl import process_ads_tables
    from housing_crawler_spark.sources.geojson import load_grid_features

    spark = _spark(args)
    ads = spark.read.parquet(args.input)
    grid = load_grid_features(spark, args.grid) if args.grid else None
    out = process_ads_tables(ads, grid=grid, cell_geometry=args.cell_geometry)
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count(), "output": args.output}))


def cmd_etl_store(args) -> None:
    from housing_crawler_spark.ads_bridge import etl_from_store
    from housing_crawler_spark.sources.geojson import load_grid_features
    from housing_crawler_spark.storage.snapshots import SnapshotStore

    spark = _spark(args)
    grid = load_grid_features(spark, args.grid) if args.grid else None
    out = etl_from_store(
        spark,
        SnapshotStore(args.store),
        up_to_round=args.up_to_round,
        from_round=args.from_round,
        grid=grid,
        cell_geometry=args.cell_geometry,
    )
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"rows": spark.read.parquet(args.output).count(), "output": args.output}))


def cmd_train_models(args) -> None:
    from housing_crawler_spark.sources.models import (
        tag_ads,
        tag_ads_multi,
        train_weekly_models,
        train_weekly_models_multi,
        write_models,
    )

    spark = _spark(args)
    ads = spark.read.parquet(args.input)
    if args.multi:
        models = train_weekly_models_multi(tag_ads_multi(ads))
    else:
        models = train_weekly_models(tag_ads(ads))
    write_models(models, args.output)
    print(json.dumps({"models": spark.read.parquet(args.output).count(), "output": args.output}))


def cmd_query(args) -> None:
    from housing_crawler_spark.all_queries import REGISTRY

    spark = _spark(args)
    if args.name not in REGISTRY:
        sys.exit(f"unknown query {args.name!r}; known: {', '.join(REGISTRY)}")
    REGISTRY[args.name].fn(spark, args.sf_dir).show(args.n, truncate=False)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run crawl rounds (resumes from --store)")
    c.add_argument("--store", required=True)
    c.add_argument("--rounds", type=int, default=8)
    c.add_argument("--hosts", type=int, default=25)
    c.add_argument("--pages", type=int, default=12)
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("etl", help="full 6-stage ETL on a raw ads parquet")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument("--grid", nargs="*", default=None, help="grid geojson path(s)")
    e.add_argument("--cell-geometry", choices=("rect", "bowtie"), default="rect")
    e.set_defaults(fn=cmd_etl)

    s = sub.add_parser("etl-store", help="6-stage ETL over a crawl store's output")
    s.add_argument("--store", required=True)
    s.add_argument("--output", required=True)
    s.add_argument("--up-to-round", type=int, default=None)
    s.add_argument("--from-round", type=int, default=0)
    s.add_argument("--grid", nargs="*", default=None, help="grid geojson path(s)")
    s.add_argument("--cell-geometry", choices=("rect", "bowtie"), default="rect")
    s.set_defaults(fn=cmd_etl_store)

    t = sub.add_parser(
        "train-models",
        help="walk-forward weekly price models (reference EP3) → parquet artifact table",
    )
    t.add_argument("--input", required=True, help="raw-ads parquet")
    t.add_argument("--output", required=True, help="model artifact parquet")
    t.add_argument(
        "--multi",
        action="store_true",
        help="k-feature walk-forward ridge (the reference's full-feature fit)",
    )
    t.set_defaults(fn=cmd_train_models)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("-n", type=int, default=20)
    q.set_defaults(fn=cmd_query)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
