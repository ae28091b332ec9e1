"""J8 backfill: a crawl run whose image stage was disabled is repaired
by backfill_images to the exact simulator corpus."""

from __future__ import annotations

import hashlib

from housing_crawler_spark import synth
from housing_crawler_spark.crawl import CrawlEngine, EngineConfig
from housing_crawler_spark.simulator import simulate
from housing_crawler_spark.storage.snapshots import SnapshotStore

WORLD = synth.WorldConfig(n_hosts=4, base_pages=5)
N_ROUNDS = 5


def test_backfill_restores_missing_images(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "bf"))
    eng = CrawlEngine(
        spark, store, WORLD, EngineConfig(image_stage_enabled=False)
    )
    eng.init_state(synth.seed_frontier_rows(WORLD), synth.robots_rows(WORLD))
    eng.run(N_ROUNDS)
    assert eng.images(N_ROUNDS).count() == 0  # nothing written yet

    res = eng.backfill_images(N_ROUNDS)
    assert res["n_backfilled_images"] > 0

    sim = simulate(WORLD, N_ROUNDS)
    got = {
        r["image_id"]: (r["caption"], r["phash"], hashlib.sha256(bytes(r["bytes"])).hexdigest())
        for r in eng.images(res["round"]).collect()
    }
    want = {
        im["image_id"]: (im["caption"], im["phash"], hashlib.sha256(im["bytes"]).hexdigest())
        for im in sim.images
    }
    assert got == want

    # idempotent: nothing missing afterwards
    res2 = eng.backfill_images(res["round"])
    assert res2["n_backfilled_images"] == 0
