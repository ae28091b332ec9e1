"""queries_ml5 — SemDeDup (s8) and the D4 diversification tail (s9)
pinned on the planted-twin topology, beyond the generic oracle gate:
the keep POLICY (original survives, twin dies) and the per-cluster
sample bounds are asserted directly."""

from __future__ import annotations

from housing_crawler_spark.queries_ml5 import (
    _S9_PROTO_FRAC,
    _S9_Q,
    s8_semdedup,
    s9_cluster_balanced_sample,
)


def test_s8_keep_policy_on_planted_twins(spark, sf_smoke):
    rows = {r["vec_id"]: r.asDict() for r in s8_semdedup(spark, sf_smoke).collect()}
    twins = [v for v in rows if v >= 1_000_000]
    assert twins, "corpus must contain planted twins"
    for v in twins:
        # every planted twin is suppressed; its original survives and
        # is dup-flagged (equal rounded centroid_sim, smaller id wins)
        orig = v % 1_000_000
        assert rows[v]["keep"] == 0, v
        assert rows[v]["n_dups"] >= 1
        assert rows[orig]["keep"] == 1, orig
        assert rows[orig]["n_dups"] >= 1
        assert rows[v]["cid"] == rows[orig]["cid"]  # twins co-cluster
    # organics: no tau-neighbor, all kept
    organics = [v for v in rows if v < 1_000_000 and rows[v]["n_dups"] == 0]
    assert all(rows[v]["keep"] == 1 for v in organics)
    # removed set == twin set exactly
    assert sorted(v for v in rows if rows[v]["keep"] == 0) == sorted(twins)


def test_s9_cluster_balance_and_proto_filter(spark, sf_smoke):
    out = [r.asDict() for r in s9_cluster_balanced_sample(spark, sf_smoke).collect()]
    assert out
    by_cid: dict[int, list[dict]] = {}
    for r in out:
        by_cid.setdefault(r["cid"], []).append(r)
    for cid, members in by_cid.items():
        n = members[0]["n_members"]
        # the prototype filter dropped floor(frac*n) rows: every
        # surviving proto_rank exceeds the cut, ranks are distinct
        cut = int(n * _S9_PROTO_FRAC + 1e-9)
        ranks = sorted(m["proto_rank"] for m in members)
        assert ranks[0] > cut
        assert len(set(ranks)) == len(ranks)
        assert len(members) == n - cut
        # cluster-balanced sample: exactly min(Q, survivors) picked
        picked = sum(m["picked"] for m in members)
        assert picked == min(_S9_Q, len(members)), cid
