"""Single-process reference simulator — the crawl-semantics oracle.

A small, eager Python re-implementation of the reference crawler's
*semantics* (NOT its code): fixed host order (params.py:41-67 city dict),
ascending listing pages (crawl_wggesucht.py:262), DOM-order cards
(:282-285), seen-set skip (:297-299), first-seen-wins (:189), CAPTCHA
backoff (utils.py:109-123), 3-empty-page host halt (:483-491), politeness
budgets from the per-host crawl delay (:79,:302-307) on a virtual clock.

The Spark engine (crawl.py) must reproduce this simulator's exact fetch
order, final URL-seen membership, image rows, and politeness ledger —
that equivalence IS the correctness contract (SURVEY.md §5.1).

Round semantics shared by both implementations:
- a round is the atomicity unit; links discovered in round r become
  eligible in round r+1;
- per round, per non-halted host (in host-index order): eligible
  frontier entries sorted by (depth, listing_page_no, card_idx,
  canonical_url), top-``budget(host)`` fetched in that order;
- captcha → not seen; entry retries after ``captcha_backoff_rounds``;
- fetched (listing/detail/gone) → seen, removed from frontier;
- discovered links: canonicalize → robots prefix gate → drop if seen →
  drop if already in frontier (existing entry wins) → within-batch
  first-seen-wins by (depth, page, card) → insert;
- per host: a round with ≥1 listing fetch and 0 inserted links bumps an
  empty-streak; ``empty_streak_halt`` consecutive → host halted forever.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import synth
from .functions.hashing import xxhash64
from .functions.urls import canonicalize_url_py
from .operators.images import encode, phash64


@dataclass
class Entry:
    host: str
    depth: int
    page: int
    card: int
    attempts: int = 0
    next_round: int = 1


@dataclass
class SimResult:
    fetch_order: list = field(default_factory=list)  # (round, host, url, kind)
    seen: set = field(default_factory=set)
    images: list = field(default_factory=list)
    ledger: list = field(default_factory=list)  # (round, host, n_fetches, budget)
    halted: set = field(default_factory=set)
    rounds_run: int = 0


def image_id_for(canonical_url: str, idx: int) -> str:
    return f"{xxhash64(canonical_url) & ((1 << 64) - 1):016x}-{idx}"


def make_images(cfg: synth.WorldConfig, url: str, res: synth.FetchResult) -> list[dict]:
    caption = synth.clean_caption_py(res.caption_raw)
    out = []
    for idx in range(res.n_images):
        img = synth.gen_image(res.payload_seed, idx, cfg.img_lo, cfg.img_hi, cfg.img_noise)
        fmt = synth.image_fmt(cfg, url, idx)
        out.append(
            {
                "image_id": image_id_for(url, idx),
                "bytes": encode(img, fmt),
                "w": img.shape[1],
                "h": img.shape[0],
                "fmt": fmt,
                "caption": caption,
                "phash": phash64(img),
            }
        )
    return out


def simulate(cfg: synth.WorldConfig, n_rounds: int) -> SimResult:
    res = SimResult()
    frontier: dict[str, Entry] = {}

    def try_insert(canonical: str, e: Entry) -> bool:
        _, path, _ = synth.parse_canonical(canonical)
        if path.startswith(cfg.disallow_prefix):
            return False
        if canonical in res.seen or canonical in frontier:
            return False
        frontier[canonical] = e
        return True

    # seed rows: first-seen-wins across dup spellings (existing wins)
    for row in synth.seed_frontier_rows(cfg):
        try_insert(
            canonicalize_url_py(row["url"]),
            Entry(row["host"], row["depth"], row["listing_page_no"], row["card_idx"]),
        )

    streak: dict[str, int] = {synth.host_name(i): 0 for i in range(cfg.n_hosts)}

    for r in range(1, n_rounds + 1):
        res.rounds_run = r
        any_fetch = False
        for i in range(cfg.n_hosts):
            host = synth.host_name(i)
            if host in res.halted:
                continue
            cands = sorted(
                (
                    (e.depth, e.page, e.card, url)
                    for url, e in frontier.items()
                    if e.host == host and e.next_round <= r
                ),
            )
            bud = synth.budget(cfg, i)
            selected = cands[:bud]
            if not selected:
                continue
            any_fetch = True
            res.ledger.append((r, host, len(selected), bud))
            n_listing = 0
            n_new = 0
            for depth, page, card, url in selected:
                e = frontier[url]
                fr = synth.fetch(cfg, url, e.attempts)
                res.fetch_order.append((r, host, url, fr.kind))
                if fr.kind == "captcha":
                    e.attempts += 1
                    e.next_round = r + 1 + cfg.captcha_backoff_rounds
                    continue
                del frontier[url]
                res.seen.add(url)
                if fr.kind == "listing":
                    n_listing += 1
                    for j, dirty in enumerate(fr.out_links):
                        ok = try_insert(
                            canonicalize_url_py(dirty),
                            Entry(host, depth + 1, page, j, next_round=r + 1),
                        )
                        n_new += int(ok)
                elif fr.kind == "detail":
                    res.images.extend(make_images(cfg, url, fr))
            if n_listing > 0:
                streak[host] = 0 if n_new > 0 else streak[host] + 1
                if streak[host] >= cfg.empty_streak_halt:
                    res.halted.add(host)
        if not any_fetch and all(e.next_round > r for e in frontier.values()):
            if not frontier:
                break
    return res
