"""Distributed connected components (iterative min-label propagation).

Turns near-dup candidate PAIRS (MinHash/LSH output) into duplicate
CLUSTERS — the step a dedup pipeline actually keys off ("keep one doc
per component"). The reference has nothing like it; classic public
algorithm (label propagation; see also Kiveris et al. large-star/
small-star for the shuffle-optimal variant, noted below).

Each iteration is one join + one aggregation, both shuffling on the
vertex id; iterations = graph diameter (near-dup graphs are shallow —
a handful of rounds at web scale). DataFrames are localCheckpointed
per round so the plan doesn't grow linearly with iterations (lineage
blow-up is the classic iterative-Spark trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """vertices(id) + edges(src, dst) -> (id, component) where
    component = min vertex id reachable. Undirected (edges are
    symmetrized here). Raises if not converged in max_iterations."""
    sym = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    ).distinct()

    labels = vertices.select(
        F.col(vertex_col).alias("id"), F.col(vertex_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["d"] == labels["id"])
            .groupBy("s")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["s"], "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
        " — for adversarially deep graphs switch to large-star/small-star"
    )
