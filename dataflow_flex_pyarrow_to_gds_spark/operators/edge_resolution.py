"""Edge-endpoint resolution — a first-class operator here.

The reference *defers* resolving ``sourceNodeId``/``targetNodeId`` against
the node id space to the Neo4j GDS server (which is why nodes must finish
loading before edges start, reference ``pipeline.py:68-87``,
``neo4j_beam/_dofn.py:50-77``). Owning the graph materialization means we
resolve/validate with real Spark joins (SURVEY §7.3 step 3).

Scale notes (100 TB stance):
- Both checks are semi/anti joins on a single long key — Catalyst picks
  broadcast-hash when the distinct node-id side is small and sort-merge
  otherwise; AQE converts to broadcast at runtime if the id set turns out
  tiny, and splits skewed partitions (hot node ids are common in graphs).
- We join against ``nodes.select(nodeId).distinct()`` — pruning to one
  8-byte column keeps the build side minimal and map-side-combinable.
- The same shuffle partitioning (on the id) serves both endpoint checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import NODE_ID, SOURCE_ID, TARGET_ID


def _node_ids(nodes: DataFrame) -> DataFrame:
    # The id universe is referenced by 2 (resolve) / 3 (dangling) joins in
    # the same plan; without a cache each reference re-runs the node scan +
    # distinct shuffle — 2-3 redundant shuffles of the id universe at scale.
    # cache() materializes it once (MEMORY_AND_DISK spills if the id set is
    # huge); Spark evicts it LRU, so not unpersisting is safe.
    return nodes.select(F.col(NODE_ID)).distinct().cache()


def resolve_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Keep only edges whose BOTH endpoints exist in the node set.

    Two successive left-semi joins — no row multiplication, no payload
    shuffle of the node side beyond its distinct ids (computed once,
    cached, reused by both endpoint checks).
    """
    ids = _node_ids(nodes)
    out = edges.join(ids, edges[SOURCE_ID] == ids[NODE_ID], "left_semi")
    return out.join(ids, out[TARGET_ID] == ids[NODE_ID], "left_semi")


def dangling_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Edges with at least one endpoint missing from the node set —
    the validation complement of :func:`resolve_edges`."""
    ids = _node_ids(nodes)
    missing_src = edges.join(ids, edges[SOURCE_ID] == ids[NODE_ID], "left_anti")
    ok_src = edges.join(ids, edges[SOURCE_ID] == ids[NODE_ID], "left_semi")
    missing_tgt = ok_src.join(ids, ok_src[TARGET_ID] == ids[NODE_ID], "left_anti")
    return missing_src.unionByName(missing_tgt)
