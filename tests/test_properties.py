"""Property-based tests (hypothesis): codec round-trips, hash twin,
caption cleaning idempotence — no Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from housing_crawler_spark import synth
from housing_crawler_spark.functions.hashing import xxhash64
from housing_crawler_spark.operators.images import decode, encode, phash64, psnr


@given(st.integers(0, 2**60), st.integers(0, 2))
@settings(max_examples=60, deadline=None)
def test_codec_roundtrip_properties(pseed, idx):
    img = synth.gen_image(pseed, idx, 16, 96)
    for fmt in ("raw", "pngz"):
        out, f2 = decode(encode(img, fmt))
        assert f2 == fmt and np.array_equal(out, img)
    out, _ = decode(encode(img, "dctq"))
    assert out.shape == img.shape
    assert psnr(img, out) >= 40.0
    # decode is deterministic → phash of decode is stable
    assert phash64(out) == phash64(decode(encode(img, "dctq"))[0])


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_xxhash64_is_stable_and_signed(data):
    v = xxhash64(data)
    assert -(2**63) <= v < 2**63
    assert v == xxhash64(data)


@given(st.text(min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_caption_clean_idempotent(s):
    c1 = synth.clean_caption_py(s)
    assert synth.clean_caption_py(c1) == c1
    assert '"' not in c1 and "\n" not in c1 and "\t" not in c1 and ";" not in c1
    assert "  " not in c1


@given(st.integers(0, 10**6), st.integers(0, 10**6))
@settings(max_examples=100, deadline=None)
def test_fetch_is_pure(a, b):
    cfg = synth.WorldConfig(n_hosts=5, base_pages=4)
    url = f"https://host-000{a % 5}.example/ad/{b % 50}"
    r1 = synth.fetch(cfg, url, 0)
    r2 = synth.fetch(cfg, url, 0)
    assert r1 == r2
