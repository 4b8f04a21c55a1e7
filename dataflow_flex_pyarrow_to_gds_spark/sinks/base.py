"""Sink protocol + write telemetry.

Mirrors the reference's sink lifecycle and result model:

- lifecycle ``start → write nodes → nodes_done → write edges → edges_done``
  (reference ``pipeline.py:56-95``; the Beam version needs a DAG trick —
  ``Signal``, ``neo4j_beam/_dofn.py:50-77`` — to order the phases; in
  Spark, actions are synchronous so the plan just calls these in order);
- per-write ``(count, nbytes, kind)`` telemetry summed globally
  (``Neo4jResult`` + ``sum_results``, ``neo4j_beam/_dofn.py:21,34-47``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

from pyspark.sql import DataFrame

from ..model import Edge, Graph, Node


@dataclass(frozen=True)
class WriteResult:
    """≙ reference ``Neo4jResult`` (``neo4j_beam/_dofn.py:21``)."""

    count: int
    nbytes: int
    kind: str  # "node" | "edge" | "final"


def sum_results(results: list[WriteResult], kind: str | None = None) -> WriteResult:
    """Fold write results: sum counts/bytes, keep first kind unless
    overridden (≙ ``sum_results`` + the ``kind="final"`` relabel,
    reference ``neo4j_beam/_dofn.py:34-47``, ``pipeline.py:92-93``)."""
    counts = sum(r.count for r in results)
    nbytes = sum(r.nbytes for r in results)
    k = kind or (results[0].kind if results else "")
    return WriteResult(counts, nbytes, k)


class GraphSink(Protocol):
    """Pluggable sink: Parquet graph export (offline) or Arrow Flight."""

    def start(self, graph: Graph) -> None:
        """≙ ``client.start()`` — create the server-side import
        (reference ``pipeline.py:56,143``)."""
        ...

    def write_nodes(self, df: DataFrame, node: Node) -> WriteResult: ...

    def nodes_done(self) -> None: ...

    def write_edges(self, df: DataFrame, edge: Edge) -> WriteResult: ...

    def edges_done(self) -> None: ...
