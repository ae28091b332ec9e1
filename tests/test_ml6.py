"""Pins for the queries_ml6 family that the SQL oracles can't express:
the video container round-trip (the numpy/codec side of m12) and the
split/leakage invariants of j10."""

from __future__ import annotations

import hashlib

from housing_crawler_spark.queries import REGISTRY
from housing_crawler_spark.queries_ml6 import (
    _J10_TRAIN_BUCKETS,
    _M12_STRIDE,
    build_video,
    sample_video,
    sampled_phashes,
)


def test_sampled_phashes_matches_container_path():
    """m13's r07 fast path (synthesize only sampled frames) must
    reproduce the container path's (frame_idx, phash63) rows exactly,
    with and without the planted twins' brightness offset."""
    for doc_id in (0, 7, 123, 9999, 1_000_007):
        for b in (0, 6):
            _, buf = build_video(doc_id % 1_000_000, brightness=b)
            want = [
                (i, ph & ((1 << 63) - 1)) for i, _m, ph in sample_video(buf)
            ]
            assert sampled_phashes(doc_id, brightness=b) == want, (doc_id, b)


def _split_is_train(doc_id: int) -> bool:
    """Python twin of the j10 split hash (md5int % 10 < 8)."""
    h = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 10 < _J10_TRAIN_BUCKETS


def test_video_container_round_trip():
    for doc_id in (0, 7, 123, 9999):
        n_frames, buf = build_video(doc_id)
        assert 6 <= n_frames <= 12
        frames = sample_video(buf)
        # stride arithmetic: indices 0, 3, 6, ... below n_frames
        assert [i for i, _, _ in frames] == list(range(0, n_frames, _M12_STRIDE))
        assert len(frames) == (n_frames + _M12_STRIDE - 1) // _M12_STRIDE
        for _, mean_x100, ph in frames:
            assert 0 <= mean_x100 <= 25500
            assert 0 <= ph < (1 << 63)
        # determinism: same doc -> byte-identical container
        assert build_video(doc_id)[1] == buf


def test_video_scene_cut_spans_a_sample_boundary():
    """The planted cut at n_frames // 2 always falls between two
    SAMPLED indices, so the max consecutive-sample Hamming distance
    reflects the A->B switch (not just drift)."""
    for doc_id in range(30):
        n_frames, _ = build_video(doc_id)
        cut = n_frames // 2
        samples = list(range(0, n_frames, _M12_STRIDE))
        assert any(a < cut <= b for a, b in zip(samples, samples[1:]))


def test_j10_planted_twins_leak_iff_split_differs(spark, sf_smoke):
    """Every planted twin (doc_id + 1_000_000, byte-identical text)
    whose split bucket differs from its original's MUST be reported
    with max_jaccard == 1.0 — regardless of which side is val."""
    from housing_crawler_spark.queries_ml6 import j10_split_leakage_audit
    from housing_crawler_spark.queries import load

    doc_ids = [
        r["doc_id"]
        for r in load(spark, sf_smoke, "documents").select("doc_id").collect()
        if r["doc_id"] % 10 == 0
    ]
    expected_val_docs = set()
    for d in doc_ids:
        twin = d + 1_000_000
        a, b = _split_is_train(d), _split_is_train(twin)
        if a and not b:
            expected_val_docs.add(twin)
        elif b and not a:
            expected_val_docs.add(d)
    got = {
        r["val_doc"]: r["max_jaccard"]
        for r in j10_split_leakage_audit(spark, sf_smoke).collect()
    }
    for vd in expected_val_docs:
        assert vd in got, f"planted cross-split twin {vd} not reported"
        assert got[vd] == 1.0


def test_video_brightness_twin_frames_hash_near():
    """m13's planted re-graded twins: the +6 brightness clip's sampled
    frames stay within the Hamming confirm radius of the original's
    (phash drops DC), while the pixel means visibly shift."""
    from housing_crawler_spark.queries_ml6 import _M13_MAXHAM

    for doc_id in (0, 7, 49):
        _, buf_a = build_video(doc_id)
        _, buf_b = build_video(doc_id, brightness=6)
        fa, fb = sample_video(buf_a), sample_video(buf_b)
        assert [i for i, _, _ in fa] == [i for i, _, _ in fb]
        for (_, ma, pa), (_, mb, pb) in zip(fa, fb):
            assert mb > ma  # the regrade is visible in the mean
            # EVERY frame pair confirms -> the twin survives m13's
            # all-frames (max per-frame min-Hamming) keep rule
            assert bin(pa ^ pb).count("1") <= _M13_MAXHAM


def test_m19_bucketing_invariants(spark, sf_correct) -> None:
    from housing_crawler_spark.queries_ml6 import _M19_BUCKETS

    pdf = REGISTRY["m19_aspect_bucketing"].fn(spark, sf_correct).toPandas()
    # every image lands in a real bucket (the fold's -1 sentinel never
    # survives because every key beats BIGINT-max)
    assert (pdf.bucket_id >= 0).all() and (pdf.bucket_id <= 8).all()
    # bucket dims round-trip the literal table
    dims = {i: wh for i, wh in enumerate(_M19_BUCKETS)}
    for r in pdf.itertuples():
        assert (r.bw, r.bh) == dims[r.bucket_id]
    # crop waste is a fraction, and the extreme-aspect buckets absorb
    # the tails at higher waste than the square bucket
    assert ((pdf.avg_crop_waste >= 0) & (pdf.avg_crop_waste < 1)).all()
    assert len(pdf) >= 5  # distribution is non-vacuous across buckets
