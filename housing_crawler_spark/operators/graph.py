"""Connected components by iterative min-label propagation.

The dedup pipelines (d7 text, s3 embeddings, m2/m3 phash) emit
star-to-representative LINKS; production dedup needs the transitive
closure — every doc labeled with its component's canonical (minimum)
id, however long the chain a→b→c→d is. The BSP formulation: every
node starts labeled with itself, and each superstep takes the min of
its own label and its neighbors' labels; converges in O(diameter)
rounds (star graphs: 2).

Spark shape: one equi-join + one groupBy-min per iteration (shuffle on
edge endpoints — linear per round, never all-pairs), a driver loop
with an early-stop count per round — the SURVEY F11 iterative pattern
(operators/similarity.iterative_relaxation). For adversarial
long-chain graphs at 10^10 scale, the small-star/large-star
alternation (Kiveris et al., "Connected Components in MapReduce and
Beyond") cuts rounds to O(log n); near-dup graphs are shallow
(star-per-band links), so plain propagation is the right default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    links: DataFrame, a: str = "a", b: str = "b", max_iter: int = 20
) -> DataFrame:
    """Undirected edge list → (node, component) with component = the
    smallest node id reachable. Deterministic, exact integers; raises
    if the labels haven't converged within max_iter rounds. NOTE the
    effective diameter limit is ``max_iter - 1``: detecting convergence
    costs one extra no-change round, so a chain of diameter D needs
    D+1 iterations. For graphs that may be deeper, use
    :func:`star_components` (O(log n) rounds regardless of diameter)."""
    fwd = links.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    # localCheckpoint (eager) rather than cache: each iteration's frame
    # must TRUNCATE lineage, or the query plan grows by one join per
    # round and Catalyst re-analysis goes quadratic — the classic
    # iterative-DataFrame pitfall (plans, not data, become the cost)
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb_min, labels["node"] == nb_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nb_min", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"components did not converge in {max_iter} rounds")


def star_components(
    links: DataFrame, a: str = "a", b: str = "b", max_iter: int = 50
) -> DataFrame:
    """Undirected edge list → (node, component) by small-star /
    large-star alternation (Kiveris et al., "Connected Components in
    MapReduce and Beyond", 2014 — public algorithm). Converges in
    O(log n) supersteps REGARDLESS of graph diameter, so adversarial
    duplicate chains (d8's pathological case for plain min-label
    propagation, which needs O(diameter) rounds) finish in ~a dozen
    iterations at any scale.

    Each phase is one groupBy-min + one equi-join over the edge list —
    linear shuffle volume per round, never all-pairs; every iteration
    localCheckpoints to truncate lineage (the iterative-DataFrame
    pitfall noted on min_label_components). Output is identical to
    min_label_components: component = min reachable id (the canonical
    representative), one row per distinct node in ``links``.

    Invariant maintained between rounds: edges are kept canonical as
    (hi, lo) with hi > lo; at convergence the edge set is a star per
    component (x → min), from which labels read off directly.
    """
    nodes = (
        links.select(F.col(a).alias("node"))
        .unionByName(links.select(F.col(b).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    canon = (
        links.select(
            F.greatest(F.col(a), F.col(b)).alias("hi"),
            F.least(F.col(a), F.col(b)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    n_edges = canon.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        # -- large-star: every node u links its LARGER neighbors to the
        # min of its closed neighborhood. Each canonical edge (hi, lo)
        # is emitted exactly once, from the lo endpoint's perspective.
        sym = canon.select(F.col("hi").alias("s"), F.col("lo").alias("d")).unionByName(
            canon.select(F.col("lo").alias("s"), F.col("hi").alias("d"))
        )
        mins = sym.groupBy("s").agg(F.least(F.min("d"), F.first("s")).alias("mn"))
        ls = (
            sym.join(mins, "s")
            .filter(F.col("d") > F.col("s"))
            .select(F.col("d").alias("hi"), F.col("mn").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        # -- small-star: every node hi links its smaller neighborhood
        # (and itself) to that neighborhood's min
        mins2 = ls.groupBy("hi").agg(F.min("lo").alias("mn"))
        ss_lo = (
            ls.join(mins2, "hi")
            .filter(F.col("lo") != F.col("mn"))
            .select(F.col("lo").alias("hi"), F.col("mn").alias("lo"))
        )
        ss_hi = mins2.select("hi", F.col("mn").alias("lo"))
        new_canon = ss_lo.unionByName(ss_hi).distinct().localCheckpoint()
        n_new = new_canon.count()
        changed = new_canon.subtract(canon).count()
        canon, n_edges = new_canon, n_new
        # break on new ⊆ old, not set equality: a PURE-REMOVAL round
        # (empty subtract, smaller count) only drops redundant alternate
        # edges — every hi keeps its (hi, min) edge via ss_hi, so the
        # label read-off below already equals the true fixpoint's, and
        # waiting for new == old would cost one more full superstep.
        # Invariant pinned by tests/test_star_twin.py's exhaustive
        # random-graph check against a union-find oracle.
        if changed == 0:
            break
    else:
        raise RuntimeError(f"star_components did not converge in {max_iter} rounds")
    # at convergence canon is a star per component: hi → component min
    labels = canon.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    return (
        nodes.join(labels, "node", "left")
        .select("node", F.coalesce("component", F.col("node")).alias("component"))
    )
