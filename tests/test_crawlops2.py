"""c4/c5/c6/m18 (queries_crawlops2) beyond the registry-wide oracle
mirror: non-vacuity of both verdict directions (strippable AND
unstrippable params, flagged AND clean images), an independent Python
twin of the integer PageRank recurrence, and the c6 tier boundaries
recomputed row by row."""

from __future__ import annotations

from pyspark.sql import functions as F

from housing_crawler_spark.queries_crawlops2 import (
    _C5_HOSTS,
    _C5_ITERS,
    _C5_SCALE,
    _C5_TELEPORT,
    c4_dust_param_rules,
    c5_host_pagerank,
    c6_revisit_schedule,
    m18_watermark_filter,
)


def test_c4_both_verdicts_non_vacuous(spark, sf_smoke):
    """utm_source must be strippable on every host (content-neutral,
    support = full host class); color/page must never be (planted
    content-relevant). An all-true or all-false table would pass the
    oracle vacuously."""
    rows = c4_dust_param_rules(spark, sf_smoke).collect()
    by_param: dict[str, set[bool]] = {}
    for r in rows:
        by_param.setdefault(r["param"], set()).add(r["strippable"])
    assert by_param["utm_source"] == {True}
    assert by_param["color"] == {False}
    assert by_param["page"] == {False}
    # every strippable verdict is backed by full agreement + support
    for r in rows:
        if r["strippable"]:
            assert r["n_equal"] == r["n_pairs"] >= 5, r


def test_c5_matches_python_twin(spark, sf_smoke):
    """The integer PageRank recurrence re-run in plain Python over the
    same edge multiset must reproduce every rank exactly — pins the
    DIV truncation semantics and the join/agg wiring, independent of
    the SQL oracle."""
    from housing_crawler_spark.queries_crawlops2 import _c5_edges

    edges = _c5_edges(spark, sf_smoke).collect()
    ranks = {r["src"] for r in edges}
    r = {h: _C5_SCALE for h in ranks}
    for _ in range(_C5_ITERS):
        inflow: dict[int, int] = {}
        for e in edges:
            flow = (r[e["src"]] * e["w"]) // e["wout"]
            inflow[e["dst"]] = inflow.get(e["dst"], 0) + flow
        r = {h: _C5_TELEPORT + (85 * inflow.get(h, 0)) // 100 for h in r}
    got = {x["host"]: x["pagerank_x1e9"] for x in c5_host_pagerank(spark, sf_smoke).collect()}
    assert got == r


def test_c5_rank_invariants(spark, sf_smoke):
    """Mass can only shrink under truncating division: every rank sits
    in [teleport, H*SCALE] and the total never exceeds the initial
    mass. All hosts appear (no dangling drops)."""
    rows = c5_host_pagerank(spark, sf_smoke).collect()
    assert len(rows) == _C5_HOSTS
    total = sum(r["pagerank_x1e9"] for r in rows)
    assert total <= _C5_HOSTS * _C5_SCALE
    for r in rows:
        assert _C5_TELEPORT <= r["pagerank_x1e9"] <= _C5_HOSTS * _C5_SCALE


def test_c6_tier_boundaries(spark, sf_smoke):
    """Tier and interval re-derived from (n_obs, n_changes) with the
    integer cross-multiplication rule; all three tiers must occur
    (propensities span 5-64%, so a missing tier means a planted-coin
    bug, not an unlucky corpus)."""
    rows = c6_revisit_schedule(spark, sf_smoke).collect()
    seen = set()
    for r in rows:
        if r["n_changes"] * 4 >= r["n_obs"]:
            tier, every = "hot", 1
        elif r["n_changes"] * 10 >= r["n_obs"]:
            tier, every = "warm", 4
        else:
            tier, every = "cold", 16
        assert (r["tier"], r["revisit_every"]) == (tier, every), r
        seen.add(tier)
    assert seen == {"hot", "warm", "cold"}, seen


def test_c7_chains_and_canonical_shape(spark, sf_smoke):
    """The mirror's ?utm variant must resolve to the MAIN bare URL
    (2-hop propagation, not star collapse); every canonical is a bare
    main-host URL; content-relevant param variants never enter the
    alias graph."""
    from housing_crawler_spark.queries_crawlops2 import c7_url_alias_components

    got = {
        r["url"]: r["canonical_url"]
        for r in c7_url_alias_components(spark, sf_smoke).collect()
    }
    mirror_utm = [u for u in got if u.startswith("https://mh") and "?utm" in u]
    assert mirror_utm, "no mirror utm variants at smoke SF"
    for u in mirror_utm:
        want = u.replace("https://mh", "https://h").split("?")[0]
        assert got[u] == want, (u, got[u])
    for u, c in got.items():
        assert c.startswith("https://h") and "?" not in c, (u, c)
        assert "color=" not in u and "page=" not in u, u


def test_m18_plants_flagged_organics_clean(spark, sf_smoke):
    """Every planted '-wm' sibling is flagged; no organic image is.
    Plants must exist (non-vacuous gate) — the blind detector's flag
    set must coincide exactly with the plant set."""
    rows = m18_watermark_filter(spark, sf_smoke).collect()
    plants = {r["image_id"] for r in rows if r["image_id"].endswith("-wm")}
    flagged = {r["image_id"] for r in rows if r["flagged"]}
    assert plants, "no watermark siblings planted at smoke SF"
    assert flagged == plants, (
        len(plants - flagged),
        len(flagged - plants),
    )
