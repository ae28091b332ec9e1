"""Audio/video multimodal plumbing (operators/media.py): bit-exact
codec round-trips, feature correctness vs direct numpy, stub formats
skipping or raising honestly, frame sampling shape/count, and
composition of sampled frames with the image toolchain."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from housing_crawler_spark.operators import media
from housing_crawler_spark.operators.images import decode, phash64
from housing_crawler_spark.queries_multimodal import _audio_table, _video_table


def test_pcm16_roundtrip_bit_exact():
    rng = np.random.Generator(np.random.PCG64(7))
    x = rng.integers(-32768, 32767, 5000).astype(np.int16)
    buf = media.encode_audio(x, 16000)
    y, rate = media.decode_audio(buf, "pcm16")
    assert rate == 16000 and np.array_equal(x, y)


def test_rawv_roundtrip_bit_exact():
    rng = np.random.Generator(np.random.PCG64(8))
    frames = rng.integers(0, 256, (7, 24, 36)).astype(np.uint8)
    buf = media.encode_video(frames, 12.0)
    got = {i: f for i, f in media.iter_frames(buf, "rawv")}
    assert len(got) == 7
    for i in range(7):
        assert np.array_equal(got[i], frames[i])


def test_stub_formats_raise():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        media.decode_audio(b"ID3xx", "mp3")
    with pytest.raises(NotImplementedError, match="PyAV"):
        list(media.iter_frames(b"h264x", "h264"))


def test_audio_features_match_numpy(spark, sf_smoke):
    audio = _audio_table(spark, sf_smoke).filter(F.col("fmt") == "pcm16").limit(20)
    rows = audio.collect()
    feats = {
        r["audio_id"]: r
        for r in media.audio_features(audio).collect()
    }
    assert len(feats) == len(rows)
    for r in rows:
        x, rate = media.decode_audio(bytes(r["bytes"]), "pcm16")
        f = feats[r["audio_id"]]
        assert f["duration_s"] == pytest.approx(len(x) / rate, abs=1e-5)
        xf = x.astype(np.float32)
        assert f["rms"] == pytest.approx(float(np.sqrt(np.mean(xf * xf))), rel=1e-6)
        assert f["peak"] == int(np.max(np.abs(x.astype(np.int32))))


def test_audio_stub_rows_flow_through_with_nulls(spark, sf_smoke):
    feats = media.audio_features(_audio_table(spark, sf_smoke))
    stub = feats.filter(F.col("fmt") == "mp3")
    assert stub.count() > 0
    assert stub.filter(F.col("rms").isNotNull()).count() == 0
    real = feats.filter(F.col("fmt") == "pcm16")
    assert real.filter(F.col("rms").isNull()).count() == 0


def test_frame_sampling_count_and_image_compat(spark, sf_smoke):
    vids = _video_table(spark, sf_smoke).filter(F.col("fmt") == "rawv").limit(10)
    meta = {r["video_id"]: r for r in vids.select("video_id", "n_frames", "w", "h").collect()}
    frames = media.sample_frames(vids, every_k=5).collect()
    by_vid: dict[str, list] = {}
    for fr in frames:
        vid = fr["image_id"].rsplit("-f", 1)[0]
        by_vid.setdefault(vid, []).append(fr)
    for vid, m in meta.items():
        got = by_vid[vid]
        want_n = (m["n_frames"] + 4) // 5  # frames 0,5,10,...
        assert len(got) == want_n, vid
        for fr in got:
            img, fmt = decode(bytes(fr["bytes"]))  # valid image-table row
            assert fmt == "raw" and img.shape == (m["h"], m["w"])
            assert phash64(img) == fr["phash"]


def test_video_stub_rows_skipped(spark, sf_smoke):
    vids = _video_table(spark, sf_smoke)
    assert vids.filter(F.col("fmt") == "h264").count() > 0
    sampled = media.sample_frames(vids, every_k=5)
    assert sampled.filter(F.col("image_id").startswith("vid-0-")).count() == 0  # doc 0 is a stub


# -- resize kernel (m6) ------------------------------------------------------


def _naive_block_mean(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = img.shape
    out = np.zeros((oh, ow))
    for i in range(oh):
        for j in range(ow):
            y0, y1 = (i * h) // oh, ((i + 1) * h) // oh
            x0, x1 = (j * w) // ow, ((j + 1) * w) // ow
            out[i, j] = img[y0:y1, x0:x1].mean() if y1 > y0 and x1 > x0 else 0.0
    return out


def test_resize_area_matches_naive_twin():
    from housing_crawler_spark.operators.images import resize_area

    rng = np.random.Generator(np.random.PCG64(7))
    for h, w, oh, ow in [(100, 80, 64, 64), (64, 64, 64, 64), (37, 53, 16, 16), (128, 16, 32, 16)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        got = resize_area(img, oh, ow)
        np.testing.assert_allclose(got, _naive_block_mean(img, oh, ow), atol=1e-9)


def test_resize_area_preserves_phash_path():
    """phash64 routes through resize_area(.., 32, 32); crawl parity
    pins the hashes globally — this is the direct kernel check that the
    parameterized refactor is the identity on the 32x32 path."""
    from housing_crawler_spark.operators.images import _resize32, resize_area

    rng = np.random.Generator(np.random.PCG64(11))
    img = rng.integers(0, 256, (75, 130)).astype(np.uint8)
    np.testing.assert_array_equal(_resize32(img), resize_area(img, 32, 32))


# -- audio fingerprint (m7) --------------------------------------------------


def test_audio_fingerprint_matches_naive_twin_and_gain_invariance():
    from housing_crawler_spark.operators.media import audio_fingerprint64

    rng = np.random.Generator(np.random.PCG64(5))
    n = 13000
    t = np.arange(n, dtype=np.float32)
    x = (8000 * np.sin(2 * np.pi * 440 * t / 16000)
         + 2000 * np.sin(2 * np.pi * 3 * t / n)  # slow energy envelope
         + 300 * rng.standard_normal(n, dtype=np.float32))
    x = np.clip(x, -32768, 32767).astype(np.int16)

    # naive twin: per-frame mean energy, bit = E[k+1] > E[k], MSB-first
    xf = x.astype(np.float64)
    bounds = (np.arange(66) * n) // 65
    e = [np.mean(xf[bounds[i]:bounds[i + 1]] ** 2) for i in range(65)]
    want = 0
    for i in range(64):
        want = (want << 1) | int(e[i + 1] > e[i])
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert audio_fingerprint64(x) == want

    # uniform gain preserves every energy-delta sign → identical fp
    assert audio_fingerprint64(x.astype(np.float32) * 1.37) == audio_fingerprint64(x)
