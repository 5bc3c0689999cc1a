"""URI canonicalization via iterative-join connected components
(BASELINE.json north_star; SURVEY.md §2.6 "north-rule additions").

Algorithm: alternating min-label propagation (the large-star/small-star
family, cf. Kiveris et al., "Connected Components in MapReduce and
Beyond"): each node repeatedly adopts the minimum id among itself and
its neighbors' current labels until fixpoint.  Each iteration is one
shuffle (groupBy node -> min label); the frontier is localCheckpointed
every iteration so plan depth stays O(1) — growing lineage is the
standard failure mode of iterative DataFrame algorithms.

Convergence is detected by counting label changes over the
checkpointed frontier (an aggregate on materialized partitions, not a
recompute).  Iterations are capped; for path-shaped graphs
min-label propagation needs O(diameter) rounds — real sameAs graphs are
star-heavy and converge in a handful."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
) -> DataFrame:
    """edges(left_uri, right_uri) -> (uri, component) with component =
    min uri (lexicographic) of the component."""
    sym = (
        edges.select(
            F.col("left_uri").alias("src"), F.col("right_uri").alias("dst")
        )
        .union(
            edges.select(
                F.col("right_uri").alias("src"), F.col("left_uri").alias("dst")
            )
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("uri"))
        .distinct()
        .withColumn("component", F.col("uri"))
    )

    for _ in range(max_iterations):
        # neighbor-min: for each node, min over its neighbors' labels
        neighbor_min = (
            sym.join(
                labels.withColumnRenamed("uri", "dst").withColumnRenamed(
                    "component", "dst_component"
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_component").alias("nbr_component"))
            .withColumnRenamed("src", "uri")
        )
        new_labels = (
            labels.join(neighbor_min, "uri", "left")
            .select(
                "uri",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("new_component"),
                "component",
            )
        )
        # checkpoint EVERY iteration: one materializing job per round
        # (replacing a full-recompute count), so the convergence count
        # and the next round's joins read materialized partitions and
        # the lineage never grows — at cluster scale this is the
        # standard iterate-checkpoint loop with O(1) plan depth.
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(
            F.col("new_component") != F.col("component")
        ).count()
        labels = new_labels.select(
            "uri", F.col("new_component").alias("component")
        )
        if changed == 0:
            break
    return labels


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite subj/obj URIs to their component representative.

    Two broadcast-or-shuffle left joins (components is small relative to
    the triple corpus; Catalyst/AQE picks broadcast when it fits)."""
    subj_map = components.select(
        F.col("uri").alias("subj"), F.col("component").alias("subj_canon")
    )
    obj_map = components.select(
        F.col("uri").alias("obj"), F.col("component").alias("obj_canon")
    )
    out = (
        triples.join(subj_map, "subj", "left")
        .join(obj_map, "obj", "left")
        .select(
            F.coalesce("subj_canon", "subj").alias("subj"),
            F.col("pred"),
            F.when(
                F.col("obj_is_uri"), F.coalesce("obj_canon", "obj")
            ).otherwise(F.col("obj")).alias("obj"),
            "obj_is_uri",
            "lang",
            "dtype",
        )
    )
    return out
