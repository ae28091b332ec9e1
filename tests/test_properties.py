"""Property-based tests (hypothesis): codec round-trips, hash twin,
caption cleaning idempotence — no Spark session needed."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from housing_crawler_spark import synth
from housing_crawler_spark.functions.hashing import xxhash64
from housing_crawler_spark.operators.images import (
    _D32,
    decode,
    encode,
    phash64,
    psnr,
    resize_area,
)


def _resize_area_integral(img, out_h, out_w):
    """Pre-r07 reference: full-image float64 integral (cumsum) block
    means — the fast reduceat path must stay bit-identical to this."""
    h, w = img.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    ii = np.cumsum(np.cumsum(img.astype(np.float64), 0), 1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    sums = (
        ii[ys[1:], :][:, xs[1:]]
        - ii[ys[:-1], :][:, xs[1:]]
        - ii[ys[1:], :][:, xs[:-1]]
        + ii[ys[:-1], :][:, xs[:-1]]
    )
    areas = np.outer(ys[1:] - ys[:-1], xs[1:] - xs[:-1]).astype(np.float64)
    areas[areas == 0] = 1.0
    return sums / areas


def _phash64_reference(img):
    """Pre-r07 reference phash: integral-image resize + shift-fold bit
    packing. The packbits fast path must reproduce it exactly."""
    small = _resize_area_integral(img, 32, 32)
    coeffs = _D32 @ small @ _D32.T
    vals = coeffs[:8, :8].flatten()[1:]
    med = np.median(vals)
    bits = np.zeros(64, dtype=np.uint64)
    bits[1:] = (vals > med).astype(np.uint64)
    word = np.uint64(0)
    for b in bits:
        word = (word << np.uint64(1)) | b
    return int(word.astype(np.int64))


@given(st.integers(0, 2**60), st.integers(8, 200), st.integers(8, 200))
@settings(max_examples=80, deadline=None)
def test_images_phash_fast_path(pseed, hgt, wid):
    """r07 fast paths (reduceat block sums, packbits word) must be
    bit-identical to the original integral-image/shift-fold versions —
    including sub-32px inputs where zero-area blocks yield 0-rows."""
    img = synth.gen_image(pseed, 0, lo=min(hgt, wid), hi=max(hgt, wid))
    assert np.array_equal(
        resize_area(img, 32, 32), _resize_area_integral(img, 32, 32)
    )
    assert phash64(img) == _phash64_reference(img)


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
