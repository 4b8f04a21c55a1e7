"""Graph algorithms over the exported GDS-layout tables.

The reference streams data INTO Neo4j GDS and lets the server compute;
owning the materialization means basic graph analytics run right here on
the node/edge DataFrames:

- :func:`node_degrees` — in/out/total degree: two partial-aggregated
  groupBys + an outer merge; one shuffle per direction.
- :func:`connected_components` — iterative min-label propagation to a
  fixpoint (the DataFrame form of GraphX/Pregel CC). Each round is a
  join + groupBy on the component frontier; rounds = graph diameter
  (checkpointed every round to truncate lineage — without it the plan
  doubles per iteration). Diameter is small for the star-shaped graphs
  the loader produces; for web-scale graphs swap in the
  large-star/small-star variant with the same DataFrame skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import NODE_ID, SOURCE_ID, TARGET_ID


def node_degrees(edges: DataFrame) -> DataFrame:
    """Per node: out_degree, in_degree, degree (missing side = 0)."""
    out_d = edges.groupBy(F.col(SOURCE_ID).alias(NODE_ID)).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(TARGET_ID).alias(NODE_ID)).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, NODE_ID, "full_outer")
        .na.fill(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(nodeId, component) with component = min nodeId in the component.

    Undirected semantics: edges propagate labels both ways. Converges in
    O(diameter) rounds; raises if max_iter is hit without a fixpoint
    (silent truncation would mislabel components).
    """
    sym = (
        edges.select(F.col(SOURCE_ID).alias("a"), F.col(TARGET_ID).alias("b"))
        .unionByName(
            edges.select(
                F.col(TARGET_ID).alias("a"), F.col(SOURCE_ID).alias("b")
            )
        )
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)  # reused every round — fix it once

    comp = nodes.select(NODE_ID, F.col(NODE_ID).alias("component"))
    for _ in range(max_iter):
        neighbor_min = (
            comp.join(sym, comp[NODE_ID] == sym["a"])
            .groupBy(F.col("b").alias(NODE_ID))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_comp = (
            comp.join(neighbor_min, NODE_ID, "left_outer")
            .select(
                NODE_ID,
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), NODE_ID)
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp
        if changed == 0:
            return comp
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
