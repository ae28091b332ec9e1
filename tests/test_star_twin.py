"""Pure-Python twin of operators/graph.star_components — no Spark.

Pins two properties of the small-star/large-star alternation that the
Spark tests can't afford to sweep:

1. Correctness against a union-find oracle over thousands of random
   graphs (the Spark test covers three hand-built shapes).
2. Soundness of the subset-break: the loop exits when
   new_canon ⊆ canon even if STRICTLY smaller (a pure-removal round).
   The twin verifies that whenever that early exit fires, the labels
   read off new_canon already equal the true fixpoint's — so the
   production code's one-superstep saving never changes output.

The twin mirrors graph.star_components round-for-round (large-star:
closed-neighborhood min emitted from the lo endpoint, d > s filter;
small-star: per-hi min with self-edge retention) so a future edit that
breaks the invariant fails here first.
"""

from __future__ import annotations

import random
from collections import defaultdict


def one_round(canon: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """One large-star + small-star superstep over canonical (hi, lo)
    edges — the same dataflow as graph.star_components' loop body."""
    sym: set[tuple[int, int]] = set()
    for hi, lo in canon:
        sym.add((hi, lo))
        sym.add((lo, hi))
    nbrs: dict[int, set[int]] = defaultdict(set)
    for s, d in sym:
        nbrs[s].add(d)
    mins = {s: min(min(ds), s) for s, ds in nbrs.items()}
    ls: set[tuple[int, int]] = set()
    for s, d in sym:
        if d > s and d != mins[s]:
            ls.add((d, mins[s]))
    l_nbrs: dict[int, set[int]] = defaultdict(set)
    for hi, lo in ls:
        l_nbrs[hi].add(lo)
    mins2 = {hi: min(ds) for hi, ds in l_nbrs.items()}
    new: set[tuple[int, int]] = set()
    for hi, lo in ls:
        if lo != mins2[hi]:
            new.add((lo, mins2[hi]))
    for hi, mn in mins2.items():
        new.add((hi, mn))
    return new


def union_find_labels(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, list[int]] = defaultdict(list)
    for n in nodes:
        roots[find(n)].append(n)
    return {n: min(members) for members in roots.values() for n in members}


def run_star(canon: set[tuple[int, int]], max_iter: int = 200):
    """Mirror of the production loop incl. the subset-break; returns
    (labels, n_strict_subset_breaks)."""
    strict = 0
    for _ in range(max_iter):
        if not canon:
            break
        new = one_round(canon)
        changed_empty = len(new - canon) == 0
        if changed_empty and len(new) != len(canon):
            strict += 1
        canon = new
        if changed_empty:
            break
    else:
        raise RuntimeError("did not converge")
    labels = {}
    for hi, lo in canon:
        assert hi not in labels, "non-star state at exit"
        labels[hi] = lo
    return labels, strict


def random_graph(rng: random.Random) -> set[tuple[int, int]]:
    n = rng.randint(2, 14)
    edges: set[tuple[int, int]] = set()
    for _ in range(rng.randint(1, 22)):
        a, b = rng.sample(range(n), 2)
        edges.add((max(a, b), min(a, b)))
    return edges


def test_star_twin_matches_union_find() -> None:
    rng = random.Random(0)
    for _ in range(2000):
        edges = random_graph(rng)
        truth = union_find_labels(edges)
        labels, _ = run_star(set(edges))
        got = {n: labels.get(n, n) for n in truth}
        assert got == truth


def test_subset_break_equals_fixpoint() -> None:
    """Whenever the early exit fires on a STRICT subset, iterating on
    to the true fixpoint must give identical labels — the soundness
    claim behind graph.star_components' break condition."""
    rng = random.Random(1)
    fired = 0
    for _ in range(3000):
        edges = random_graph(rng)
        canon = set(edges)
        for _ in range(200):
            if not canon:
                break
            new = one_round(canon)
            if len(new - canon) == 0:
                if len(new) != len(canon):
                    fired += 1
                    cur = new
                    for _ in range(200):
                        nxt = one_round(cur)
                        if nxt == cur:
                            break
                        cur = nxt
                    early_labels = {hi: lo for hi, lo in new}
                    fix_labels = {hi: lo for hi, lo in cur}
                    assert early_labels == fix_labels
                canon = new
                break
            canon = new
    assert fired > 100, "sweep never exercised the strict-subset break"


def test_chain_converges_logarithmically() -> None:
    """1,000-hop chain: O(log n) supersteps, exactly the bound the
    Spark test asserts with max_iter=15."""
    edges = {(i + 1, i) for i in range(1000)}
    canon = set(edges)
    rounds = 0
    for _ in range(15):
        new = one_round(canon)
        rounds += 1
        done = len(new - canon) == 0
        canon = new
        if done:
            break
    assert done, "chain did not converge within 15 supersteps"
    labels = {hi: lo for hi, lo in canon}
    assert all(labels[i] == 0 for i in range(1, 1001))
