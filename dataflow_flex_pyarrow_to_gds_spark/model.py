"""Declarative graph model: JSON → Node/Edge mappings with regex routing.

Re-expresses (from scratch, public semantics only) the model DSL the
reference consumes from the external ``neo4j_arrow.model`` package:

- a ``Graph`` has a ``name``, a ``db``, and lists of ``nodes`` / ``edges``
  (reference ``README.md:92-159``, ``example_models/*.json``);
- each element carries a ``source`` **regex** matched against the origin of
  a batch (file path / table name) — this is the engine's routing predicate
  (reference ``pipeline.py:108,118`` via ``node_for_src``/``edge_for_src``,
  semantics documented ``README.md:164-168``);
- role fields: nodes have ``key_field`` (numeric id, ``README.md:169-170``)
  and optional ``label_field`` (string or list of strings,
  ``README.md:168-169``); edges have ``source_field``/``target_field`` and
  optional ``type_field``; both have a ``properties``
  ``{source_col: target_name}`` mapping (``README.md:164-177``);
- the projected column list per element — properties + role fields, with
  unset fields dropped — mirrors the hand-rolled projection pushdown at
  reference ``pipeline.py:106-127``.

Everything here is driver-side, dependency-free Python; Spark never sees
these objects (closures ship only plain strings/lists).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any


# eq=False → identity hash/eq, so elements can key routing dicts despite
# holding a (mutable, unhashable) properties mapping.
@dataclass(frozen=True, eq=False)
class Node:
    """Mapping from a tabular source to graph nodes."""

    source: str  # regex matched against batch origin (file path / table)
    key_field: str  # column holding the numeric node id
    label_field: str = ""  # column holding label(s): string or list<string>
    properties: dict[str, str] = field(default_factory=dict)  # {src_col: out_name}

    @property
    def pattern(self) -> re.Pattern[str]:
        return re.compile(self.source)

    def matches(self, src: str) -> bool:
        return self.pattern.match(src) is not None

    def fields(self) -> list[str]:
        """Source columns this element needs — the projection pushdown list
        (mirrors reference ``pipeline.py:109-113``: properties + label/key,
        falsy fields filtered)."""
        return list(self.properties.keys()) + [
            f for f in (self.label_field, self.key_field) if f
        ]

    def validate(self) -> None:
        if not self.source:
            raise ValueError("Node.source regex is required")
        if not self.key_field:
            raise ValueError(f"Node(source={self.source!r}) needs key_field")
        re.compile(self.source)  # raises on bad regex


@dataclass(frozen=True, eq=False)
class Edge:
    """Mapping from a tabular source to graph relationships."""

    source: str
    source_field: str  # column holding the source node id
    target_field: str  # column holding the target node id
    type_field: str = ""  # column holding the relationship type
    default_type: str = ""  # static type when type_field is absent
    properties: dict[str, str] = field(default_factory=dict)

    @property
    def pattern(self) -> re.Pattern[str]:
        return re.compile(self.source)

    def matches(self, src: str) -> bool:
        return self.pattern.match(src) is not None

    def fields(self) -> list[str]:
        """Projection list (mirrors reference ``pipeline.py:119-124``)."""
        return list(self.properties.keys()) + [
            f for f in (self.type_field, self.source_field, self.target_field) if f
        ]

    def validate(self) -> None:
        if not self.source:
            raise ValueError("Edge.source regex is required")
        if not self.source_field or not self.target_field:
            raise ValueError(
                f"Edge(source={self.source!r}) needs source_field and target_field"
            )
        re.compile(self.source)


@dataclass(frozen=True)
class Graph:
    """A named collection of node and edge mappings."""

    name: str
    db: str = "neo4j"
    nodes: tuple[Node, ...] = ()
    edges: tuple[Edge, ...] = ()

    # -- construction ------------------------------------------------------
    @classmethod
    def from_json(cls, doc: str | bytes) -> "Graph":
        """Parse the JSON model document (reference ``README.md:92-159``)."""
        raw: dict[str, Any] = json.loads(doc)
        nodes = tuple(
            Node(
                source=n["source"],
                key_field=n.get("key_field", ""),
                label_field=n.get("label_field", ""),
                properties=dict(n.get("properties", {})),
            )
            for n in raw.get("nodes", [])
        )
        edges = tuple(
            Edge(
                source=e["source"],
                source_field=e.get("source_field", ""),
                target_field=e.get("target_field", ""),
                type_field=e.get("type_field", ""),
                default_type=e.get("default_type", ""),
                properties=dict(e.get("properties", {})),
            )
            for e in raw.get("edges", [])
        )
        g = cls(name=raw.get("name", ""), db=raw.get("db", "neo4j"),
                nodes=nodes, edges=edges)
        g.validate()
        return g

    @classmethod
    def from_path(cls, path: str) -> "Graph":
        """Load a model from a local path or remote URI.

        ≙ reference ``load_model_from_path``/``load_model_from_gcs``
        (``pipeline.py:24-45``): remote URIs (gs://, s3://, …) go through
        fsspec when available; reads are capped at 64 KiB like the
        reference (``pipeline.py:40``) — models are tiny.
        """
        if "://" in path:
            try:
                import fsspec
            except ImportError as exc:  # env without remote-FS support
                raise RuntimeError(
                    f"remote model URI {path!r} requires fsspec "
                    "(pip install fsspec gcsfs/s3fs)"
                ) from exc
            with fsspec.open(path, "rb") as f:
                return cls.from_json(f.read(64 * 1024))
        with open(path, "rb") as f:
            return cls.from_json(f.read(64 * 1024))

    def to_json(self) -> str:
        doc: dict[str, Any] = {
            "name": self.name,
            "db": self.db,
            "nodes": [
                {k: v for k, v in {
                    "source": n.source, "key_field": n.key_field,
                    "label_field": n.label_field, "properties": n.properties,
                }.items() if v}
                for n in self.nodes
            ],
            "edges": [
                {k: v for k, v in {
                    "source": e.source, "source_field": e.source_field,
                    "target_field": e.target_field, "type_field": e.type_field,
                    "default_type": e.default_type, "properties": e.properties,
                }.items() if v}
                for e in self.edges
            ],
        }
        return json.dumps(doc, indent=2)

    # -- routing (the engine's WHERE clause over sources) ------------------
    def node_for_src(self, src: str) -> Node | None:
        """First node mapping whose ``source`` regex matches (reference
        ``pipeline.py:108``); ``None`` routes the batch nowhere."""
        return next((n for n in self.nodes if n.matches(src)), None)

    def edge_for_src(self, src: str) -> Edge | None:
        return next((e for e in self.edges if e.matches(src)), None)

    def validate(self) -> None:
        if not self.name:
            raise ValueError("Graph.name is required")
        for n in self.nodes:
            n.validate()
        for e in self.edges:
            e.validate()
