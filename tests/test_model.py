"""Graph model DSL: parsing, routing, projection lists.

Covers the semantics the reference delegates to ``neo4j_arrow.model``
(documented at reference ``README.md:92-177``) plus the field-list
computation from ``pipeline.py:106-127``.
"""

import json

import pytest

from dataflow_flex_pyarrow_to_gds_spark.model import Edge, Graph, Node

ACADEMIC = json.dumps(
    {
        "name": "test",
        "db": "neo4j",
        "nodes": [
            {"source": ".*/papers.*parquet", "label_field": "labels", "key_field": "paper"},
            {"source": ".*/authors.*parquet", "label_field": "labels", "key_field": "author"},
        ],
        "edges": [
            {
                "source": ".*/citations.*parquet",
                "type_field": "type",
                "source_field": "source",
                "target_field": "target",
            }
        ],
    }
)

STACKOVERFLOW = json.dumps(
    {
        "name": "stackoverflow",
        "db": "neo4j",
        "nodes": [
            {
                "source": "users",
                "key_field": "id",
                "properties": {"up_votes": "up_votes", "reputation": "reputation"},
            },
            {
                "source": "posts_answers",
                "key_field": "id",
                "properties": {"score": "score", "comment_count": "comment_count"},
            },
        ],
        "edges": [
            {
                "source": "posts_answers",
                "source_field": "owner_user_id",
                "target_field": "id",
                "properties": {"score": "score"},
            }
        ],
    }
)


def test_from_json_roundtrip():
    g = Graph.from_json(ACADEMIC)
    assert g.name == "test" and g.db == "neo4j"
    assert len(g.nodes) == 2 and len(g.edges) == 1
    g2 = Graph.from_json(g.to_json())
    assert g2.to_json() == g.to_json()


def test_routing_match_semantics():
    g = Graph.from_json(ACADEMIC)
    n = g.node_for_src("file:///data/papers-000.parquet")
    assert n is not None and n.key_field == "paper"
    assert g.node_for_src("file:///data/citations-0.parquet") is None
    e = g.edge_for_src("file:///data/citations-0.parquet")
    assert e is not None and e.type_field == "type"
    # routing miss → None (reference pipeline.py:108-113 emits nothing)
    assert g.node_for_src("file:///data/unrelated.parquet") is None


def test_same_source_feeds_node_and_edge():
    # posts_answers appears in nodes AND edges (so_model.json:15-21,33-40)
    g = Graph.from_json(STACKOVERFLOW)
    assert g.node_for_src("posts_answers") is not None
    assert g.edge_for_src("posts_answers") is not None


def test_field_lists_mirror_projection_pushdown():
    g = Graph.from_json(STACKOVERFLOW)
    users = g.node_for_src("users")
    # properties + key (falsy label_field dropped) — pipeline.py:109-113
    assert set(users.fields()) == {"up_votes", "reputation", "id"}
    e = g.edge_for_src("posts_answers")
    # properties + source/target (no type_field) — pipeline.py:119-124
    assert set(e.fields()) == {"score", "owner_user_id", "id"}


def test_match_is_anchored():
    n = Node(source="users", key_field="id")
    assert n.matches("users")
    assert n.matches("users_extra")  # match, not fullmatch (re.match semantics)
    assert not n.matches("posts_users")


def test_validation_errors():
    with pytest.raises(ValueError):
        Node(source="x", key_field="").validate()
    with pytest.raises(ValueError):
        Edge(source="x", source_field="a", target_field="").validate()
    with pytest.raises(Exception):
        Node(source="[bad", key_field="k").validate()


def test_remote_uri_branch_via_injected_fsspec(monkeypatch):
    """Exercise the fsspec remote-model branch (S8) without a cloud FS:
    inject an in-memory fsspec whose open() serves bytes and records the
    read cap. Verifies the '://' routing, the 64 KiB cap, and a parsed
    Graph identical to the local-path load."""
    import io
    import sys
    import types

    store = {"mem://models/g.json": STACKOVERFLOW.encode()}
    reads = []

    class _F(io.BytesIO):
        def read(self, n=-1):
            reads.append(n)
            return super().read(n)

    fake = types.ModuleType("fsspec")

    class _Ctx:
        def __init__(self, path):
            self.path = path

        def __enter__(self):
            return _F(store[self.path])

        def __exit__(self, *a):
            return False

    fake.open = lambda path, mode="rb": _Ctx(path)
    monkeypatch.setitem(sys.modules, "fsspec", fake)

    g = Graph.from_path("mem://models/g.json")
    assert reads == [64 * 1024]  # capped read, pipeline.py:40 parity
    assert g.name == Graph.from_json(STACKOVERFLOW).name
    assert g.node_for_src("users") is not None


def test_remote_uri_without_fsspec_raises(monkeypatch):
    import builtins
    import sys

    monkeypatch.setitem(sys.modules, "fsspec", None)  # import -> ImportError
    real_import = builtins.__import__

    def blocked(name, *a, **k):
        if name == "fsspec":
            raise ImportError("no fsspec")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", blocked)
    with pytest.raises(RuntimeError, match="fsspec"):
        Graph.from_path("gs://bucket/model.json")
