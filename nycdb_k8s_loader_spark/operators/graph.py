"""Graph operators: connected components by iterative label propagation.

Capability twin of the reference's landlord-portfolio graph
(/root/reference/wowutil.py:74-85: name-standardize → build edge graph
→ connected portfolios via networkx, driver-side) and the recursive
``get_assoc_addrs_from_bbl`` traversal (tests/test_wowutil.py:42-44).

Spark-first: the reference materializes the whole graph in driver
memory — a non-starter at 100 TB. We use distributed min-label
propagation over an edge DataFrame:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. Each round is one join + one groupBy (both hash
shuffles on the node key, reusable partitioning); convergence takes
O(graph diameter) rounds — near-dup clusters and landlord portfolios
are shallow (diameter ≲ 10). For adversarial deep graphs, swap in
large-star/small-star (Kiveris et al.) — same DataFrame skeleton.

Every iteration localCheckpoints the labels frame: without it the
lineage doubles per round and the planner, not the job, becomes the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) where component = min node id in the
    component. Nodes are every id present in the edge list; edges are
    treated as undirected."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def cluster_assignments(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Dedup-cluster ids from a near-dup pair list: each doc mapped to
    the min doc_id of its connected component (the keep-candidate).
    Composition point: feed MinHash/SimHash/Jaccard pair outputs in,
    get per-doc cluster labels out."""
    return connected_components(pairs, src=id_a, dst=id_b).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
