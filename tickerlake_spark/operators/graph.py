"""Graph operators for dedup clustering.

Near-duplicate detection emits PAIRS (see ``operators/dedup.py``); turning
pairs into keep/drop decisions needs the transitive closure — documents A~B
and B~C must land in ONE cluster even though A~C was never emitted. That is
connected components over the similarity graph, followed by "keep the
canonical (min-id) member per component".

Algorithm: min-label propagation with pointer doubling. Each node starts
labeled with its own id; every iteration each node takes the minimum over
(its own label, its neighbors' labels, its label's label). The third term is
pointer jumping — the distance a label has traveled doubles per iteration —
so convergence is O(log diameter) rather than O(diameter), the same bound as
the alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") with a simpler per-iteration plan: two
shuffle-joins + one hash-agg, fully distributed, no driver data beyond a
1-row convergence probe. ``localCheckpoint`` every iteration truncates
lineage so the loop's plan doesn't grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "canonical_per_component"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns ``(node, component)`` where ``component`` is the minimum node id
    reachable from ``node``. Nodes appearing only in ``edges`` (no isolated
    vertices) — callers union isolated nodes afterwards if needed.

    Raises if not converged within ``max_iter`` (diameter bound exceeded).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a)
            .agg(F.min("component").alias("nbr_min"))
        )
        # pointer jump: my label's label (labels is keyed by node, and every
        # component value IS a node id, so this inner join matches 1:1)
        l2 = labels.select(
            F.col("node").alias("n2"), F.col("component").alias("c2")
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .join(l2, F.col("component") == F.col("n2"))
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                    F.col("c2"),
                ).alias("__new"),
                F.col("component").alias("__old"),
            )
            .select(
                "node",
                F.col("__new").alias("component"),
                (F.col("__new") < F.col("__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def canonical_per_component(
    components: DataFrame,
    node: str = "node",
    component: str = "component",
) -> DataFrame:
    """Per component: the canonical (minimum-id) member and the member count.

    ``component`` is already the min member id by construction, so this is a
    single hash-agg; the canonical node is the component label itself.
    """
    return components.groupBy(component).agg(
        F.count("*").alias("n_members"),
        F.min(node).alias("keep_node"),
    )
