"""Connected components for dedup clustering.

Near-dup detection (q49/q60) yields PAIRS; deduplication needs
CLUSTERS — transitive closure over the pair graph, one canonical
survivor per component. This is the iterative min-label-propagation
algorithm (each vertex repeatedly adopts the smallest label among
itself and its neighbors) expressed in DataFrame ops:

- one iteration = two broadcast-or-shuffle joins + a groupBy min,
- convergence in O(component diameter) iterations — near-dup
  clusters are shallow (pairs all mutually similar), so 2-4 rounds,
- each round's result is localCheckpoint()ed: iterative plans
  otherwise stack lineage until planning time explodes (the classic
  iterative-Spark trap; GraphX/GraphFrames do the same internally).

Oracle-checked via q88: transitive closure IS expressible in DuckDB
as a recursive CTE over reachability pairs (UNION dedups, so it
terminates; the min-per-vertex aggregate runs outside the recursion,
which is the part recursive SQL restricts) — on top of the known-
graph unit tests here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str, dst: str,
                         max_iter: int = 20) -> DataFrame:
    """Return (vertex, component) where component is the min vertex
    id reachable from ``vertex`` over undirected ``edges``."""
    # materialize the (possibly expensive) upstream pair pipeline
    # ONCE before the union references it twice — Spark does not
    # reuse the duplicated subplan, so without this the edge source
    # (e.g. q83's prefix join) runs twice (measured 2× at sf0.1)
    e0 = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
          .localCheckpoint())
    und = (e0.union(e0.select(F.col("b").alias("a"),
                              F.col("a").alias("b")))
           .distinct()
           .localCheckpoint())
    labels = (und.select(F.col("a").alias("vertex"))
              .distinct()
              .withColumn("component", F.col("vertex")))
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["b"] == labels["vertex"])
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # keep old + new side by side so the convergence check is a
        # filter on the checkpointed frame, not an extra join+job
        stepped = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.col("component").alias("__old"),
                F.least("component", F.coalesce("nbr_component",
                                                "component"))
                .alias("component"),
            )
            .localCheckpoint()  # cut lineage: iterative-plan blowup
        )
        changed = (stepped.filter(F.col("component") != F.col("__old"))
                   .limit(1).count())
        labels = stepped.drop("__old")
        if changed == 0:
            break
    else:
        # silently-wrong labels are worse than a loud failure: a
        # component with diameter > max_iter (chain-shaped near-dup
        # clusters) would otherwise split into several components
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations (a component's diameter exceeds max_iter); "
            "raise max_iter"
        )
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b") -> DataFrame:
    """Collapse near-dup pairs into clusters: returns
    (member, canonical) for every clustered id, canonical being the
    component's min id — the survivor a dedup pass keeps."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(F.col("vertex").alias("member"),
                     F.col("component").alias("canonical"))
