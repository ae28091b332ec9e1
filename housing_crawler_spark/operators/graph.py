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
    if max_iter rounds don't converge (diameter > max_iter)."""
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
