"""Deterministic synthetic crawl world (the "mock web").

Everything is a pure function of ``(cfg.seed, canonical_url)`` — no
wall-clock, no Python ``hash()`` (PYTHONHASHSEED-dependent), no live
HTTP. The same functions back three consumers:

1. the Spark engine's fetch stage (inside Arrow-batched ``mapInPandas``),
2. the single-process reference simulator oracle (simulator.py),
3. the test fixtures / bench frontier generator.

World shape mirrors the reference's crawl surface
(/root/reference/housing_crawler/crawl_wggesucht.py):

- hosts = the 25-city dict (params.py:41-67) → ``host-%04d.example``,
  Zipf(s=1.2)-skewed page counts so low-index hosts are hot (exercises
  salting);
- listing pages ``/list?page=p`` in ascending page order (crawl loop
  :262), each showing ``cards`` ads in DOM order (:282-285) with
  page-to-page overlap (old ads reappear → exercises the seen-set skip
  :297-299);
- detail pages ``/ad/{id}`` (some under ``/private/`` → robots-gated);
  ~5% 'gone' (inactive-ad detection, utils.py:125-130); listing fetches
  can hit a first-attempt CAPTCHA (utils.py:109-123) that resolves on
  retry after a backoff;
- each live detail page yields 1-3 images (numpy-generated patterns,
  encoded raw/pngz/dctq) and a *dirty* caption (quotes/newlines/tabs/
  semicolons/doubled spaces — the reference cleans titles the same way,
  crawl_wggesucht.py:288-289).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .functions.hashing import xxhash64

_MASK63 = (1 << 63) - 1

WORDS = (
    "zimmer wohnung hell altbau balkon garten wg berlin stadtmitte ruhig "
    "modern neu saniert zentral gemuetlich klein gross sonnig dach keller"
).split()


@dataclass(frozen=True)
class WorldConfig:
    seed: int = 42
    n_hosts: int = 10
    base_pages: int = 12  # pages for host 0; Zipf-decayed for the rest
    cards_min: int = 4  # ads per listing page: cards_min + (host % cards_var)
    cards_var: int = 4
    overlap: int = 2  # ads shared between consecutive pages
    round_seconds: int = 60  # virtual-clock budget window per round
    captcha_every: int = 50  # 1-in-N listing fetches captcha on attempt 0
    captcha_backoff_rounds: int = 2
    gone_every: int = 20  # 1-in-N detail pages are gone
    private_every: int = 10  # 1-in-N ads live under /private (robots-gated)
    empty_streak_halt: int = 3  # reference: stop after 3 zero-new pages
    disallow_prefix: str = "/private"
    dup_every: int = 12  # ~8% duplicate seed rows under canonicalization
    img_lo: int = 16  # image edge range (bench uses bigger images so
    img_hi: int = 256  # decode compute reflects real photo payloads)
    imgs_per_detail_max: int = 3
    fmt_override: str | None = None  # force one codec (bench: 'dctq')
    img_noise: float = 6.0  # pattern noise sigma (bench lowers it: same
    # codec compute, far fewer bits after quantization -> less write IO)


def h(cfg_seed: int, tag: str) -> int:
    """Non-negative 63-bit derivation hash, stable across processes."""
    return xxhash64(f"{cfg_seed}:{tag}") & _MASK63


# ---------------------------------------------------------------------------
# Host universe
# ---------------------------------------------------------------------------


def host_name(i: int) -> str:
    return f"host-{i:04d}.example"


def host_index(host: str) -> int:
    return int(host.split("-")[1].split(".")[0])


def n_pages(cfg: WorldConfig, i: int) -> int:
    return max(2, int(cfg.base_pages / (i + 1) ** 1.2))


def cards_per_page(cfg: WorldConfig, i: int) -> int:
    return cfg.cards_min + (i % cfg.cards_var)


def crawl_delay_s(cfg: WorldConfig, i: int) -> int:
    # reference politeness floor: 3 s/listing page (crawl_wggesucht.py:79),
    # 10 s/detail (:302-307) — we vary per host to differentiate budgets
    return 3 + (i % 7)


def budget(cfg: WorldConfig, i: int) -> int:
    return max(1, cfg.round_seconds // crawl_delay_s(cfg, i))


def robots_rows(cfg: WorldConfig) -> list[dict]:
    return [
        {
            "host": host_name(i),
            "disallow_prefix": cfg.disallow_prefix,
            "crawl_delay_s": crawl_delay_s(cfg, i),
        }
        for i in range(cfg.n_hosts)
    ]


# ---------------------------------------------------------------------------
# URL construction
# ---------------------------------------------------------------------------


def listing_url(i: int, page: int) -> str:
    return f"https://{host_name(i)}/list?page={page}"


def ad_id(cfg: WorldConfig, i: int, page: int, card: int) -> int:
    # newest-first window with overlap: consecutive pages share
    # ``cfg.overlap`` ads (the reference's re-listed old ads)
    step = cards_per_page(cfg, i) - cfg.overlap
    return page * step + card


def ad_url(cfg: WorldConfig, i: int, aid: int) -> str:
    hn = host_name(i)
    if h(cfg.seed, f"priv:{hn}:{aid}") % cfg.private_every == 0:
        return f"https://{hn}/private/ad/{aid}"
    return f"https://{hn}/ad/{aid}"


def dirty_variant(cfg: WorldConfig, url: str, salt: str = "") -> str:
    """Deterministically dirty a canonical URL (what 'the web' links to)."""
    v = h(cfg.seed, f"dirt:{salt}:{url}") % 5
    if v == 0:
        return url
    if v == 1:
        scheme, rest = url.split("://", 1)
        return scheme + "://" + rest + ("&utm_source=crawl" if "?" in rest else "/?utm_source=crawl")
    if v == 2:
        scheme, rest = url.split("://", 1)
        host, tail = rest.split("/", 1)
        return scheme.upper() + "://" + host.upper() + "/" + tail
    if v == 3:
        return url + "#section-2"
    return url + ("&ref=partner" if "?" in url else "?ref=partner")


# ---------------------------------------------------------------------------
# Fetch model (pure function of (cfg, canonical_url, attempt))
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FetchResult:
    kind: str  # listing | detail | captcha | gone
    out_links: tuple[str, ...] = ()  # dirty detail URLs, DOM order
    caption_raw: str = ""
    n_images: int = 0
    payload_seed: int = 0


def parse_canonical(url: str) -> tuple[str, str, int | None]:
    """canonical url → (host, path, page_no_or_None)."""
    rest = url.split("://", 1)[1]
    slash = rest.find("/")
    host, tail = rest[:slash], rest[slash:]
    qpos = tail.find("?")
    path = tail[:qpos] if qpos >= 0 else tail
    page = None
    if qpos >= 0 and "page=" in tail[qpos:]:
        for part in tail[qpos + 1 :].split("&"):
            if part.startswith("page="):
                page = int(part[5:])
    return host, path, page


def caption_raw_for(cfg: WorldConfig, url: str) -> str:
    # ONE hash per caption; words/dirt derived from its digit groups
    # (pure-python xxhash64 is the fetch stage's hot path)
    k = h(cfg.seed, f"cap:{url}")
    n = 3 + k % 6
    kk = k // 6
    words = []
    for _ in range(n):
        words.append(WORDS[kk % len(WORDS)])
        kk //= len(WORDS)
    s = " ".join(words)
    d = kk % 5
    if d == 0:
        s = f'"{s}"'
    elif d == 1:
        s = s.replace(" ", "\n", 1) + "\t"
    elif d == 2:
        s = "  " + s.replace(" ", "  ", 2) + " ;"
    elif d == 3:
        s = s + ";\n"
    return s


def fetch(cfg: WorldConfig, canonical_url: str, attempt: int) -> FetchResult:
    host, path, page = parse_canonical(canonical_url)
    i = host_index(host)
    if path == "/list" and page is not None:
        if page >= n_pages(cfg, i):
            return FetchResult("gone")
        if attempt == 0 and h(cfg.seed, f"captcha:{canonical_url}") % cfg.captcha_every == 0:
            return FetchResult("captcha")
        cards = cards_per_page(cfg, i)
        links = tuple(
            dirty_variant(cfg, ad_url(cfg, i, ad_id(cfg, i, page, j)), salt=f"{page}:{j}")
            for j in range(cards)
        )
        return FetchResult("listing", out_links=links)
    if "/ad/" in path:
        if h(cfg.seed, f"gone:{canonical_url}") % cfg.gone_every == 0:
            return FetchResult("gone")
        return FetchResult(
            "detail",
            caption_raw=caption_raw_for(cfg, canonical_url),
            n_images=1 + h(cfg.seed, f"nimg:{canonical_url}") % cfg.imgs_per_detail_max,
            payload_seed=h(cfg.seed, f"payload:{canonical_url}"),
        )
    return FetchResult("gone")


# ---------------------------------------------------------------------------
# Images (per payload_seed; used by the fetch image stage + oracle)
# ---------------------------------------------------------------------------


def gen_image(
    payload_seed: int, idx: int, lo: int = 16, hi: int = 256, noise: float = 6.0
) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(payload_seed + idx))
    hgt = int(rng.integers(lo, hi + 1))
    wid = int(rng.integers(lo, hi + 1))
    fx, fy = float(rng.uniform(1, 4)), float(rng.uniform(1, 4))
    phase = float(rng.uniform(0, 2 * np.pi))
    # separable pattern: one outer product instead of full 2-D trig grids;
    # float32 throughout — generation is part of the bandwidth-bound image
    # path (BENCH/BASELINE.md) and fp32 noise/trig halves its traffic
    sin_x = np.sin(2 * np.pi * fx * np.arange(wid) / wid + phase).astype(np.float32)
    cos_y = np.cos(2 * np.pi * fy * np.arange(hgt) / hgt).astype(np.float32)
    img = np.float32(128.0) + np.float32(60.0) * np.outer(cos_y, sin_x)
    img += np.float32(noise) * rng.standard_normal((hgt, wid), dtype=np.float32)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def image_fmt(cfg: WorldConfig, url: str, idx: int) -> str:
    if cfg.fmt_override is not None:
        return cfg.fmt_override
    from .operators.images import FORMATS

    return FORMATS[h(cfg.seed, f"fmt:{url}:{idx}") % len(FORMATS)]


def clean_caption_py(s: str) -> str:
    """Python twin of the Spark caption-clean expression
    (reference title cleanup, crawl_wggesucht.py:288-289)."""
    import re

    s = re.sub(r'["\n\t;]', "", s)
    s = re.sub(r" +", " ", s)
    return s.strip()


# ---------------------------------------------------------------------------
# Seed frontier (Python fixture — exact twin used by simulator parity tests)
# ---------------------------------------------------------------------------


def seed_frontier_rows(cfg: WorldConfig) -> list[dict]:
    """All listing pages of all hosts, dirty spellings, ~8% dup rows."""
    rows = []
    for i in range(cfg.n_hosts):
        for p in range(n_pages(cfg, i) + 2):  # +2 pages past the end → 'gone'
            url = dirty_variant(cfg, listing_url(i, p), salt="seed")
            rows.append(
                {
                    "url": url,
                    "host": host_name(i),
                    "depth": 0,
                    "listing_page_no": p,
                    "card_idx": 0,
                    "freshness_score": round(1.0 / (p + 1), 6),
                }
            )
            if h(cfg.seed, f"dup:{url}") % cfg.dup_every == 0:
                rows.append(
                    {**rows[-1], "url": dirty_variant(cfg, listing_url(i, p), salt="dup")}
                )
    return rows
