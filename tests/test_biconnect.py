"""Bridges / articulation points / biconnected components (r15) vs
brute-force removal references — the definitions themselves, replayed
with pure-Python BFS, so the test trusts nothing the operator does:

- bridge (u, v): v unreachable from u in G − {(u,v)}.
- articulation v: some pair of v's neighbors mutually unreachable in
  G − {v}.
- two adjacent edges (a,b), (b,c) share a biconnected component iff a
  reaches c in G − {b}; blocks are the connected components of that
  share-relation (edges sharing a simple cycle are transitively
  grouped — the classic block characterization).
"""

import random
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.biconnect import (
    articulation_points,
    biconnected_components,
    biconnectivity_state,
    bridges,
)


def _bfs(adj, start, banned_node=None, banned_edge=None):
    seen = {start}
    dq = deque([start])
    while dq:
        x = dq.popleft()
        for y in adj[x]:
            if y == banned_node or x == banned_node:
                continue
            if banned_edge and {x, y} == set(banned_edge):
                continue
            if y not in seen:
                seen.add(y)
                dq.append(y)
    return seen


def _ref_all(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    br = {
        (min(u, v), max(u, v))
        for u, v in edges
        if v not in _bfs(adj, u, banned_edge=(u, v))
    }
    art = set()
    for v in list(adj):
        nb = sorted(adj[v])
        if len(nb) < 2:
            continue
        reach = _bfs(adj, nb[0], banned_node=v)
        if any(m not in reach for m in nb[1:]):
            art.add(v)
    # blocks: union-find over the adjacent-edge share-relation
    es = sorted((min(u, v), max(u, v)) for u, v in edges)
    parent = {e: e for e in es}

    def find(e):
        while parent[e] != e:
            parent[e] = parent[parent[e]]
            e = parent[e]
        return e

    by_node = defaultdict(list)
    for e in es:
        by_node[e[0]].append(e)
        by_node[e[1]].append(e)
    for b, inc in by_node.items():
        for i in range(len(inc)):
            for j in range(i + 1, len(inc)):
                e1, e2 = inc[i], inc[j]
                a = e1[0] if e1[1] == b else e1[1]
                c = e2[0] if e2[1] == b else e2[1]
                if c in _bfs(adj, a, banned_node=b):
                    ra, rb = find(e1), find(e2)
                    if ra != rb:
                        parent[ra] = rb
    blocks = defaultdict(set)
    for e in es:
        blocks[find(e)].add(e)
    return br, art, frozenset(frozenset(s) for s in blocks.values())


def _spark_all(spark, edges):
    df = spark.createDataFrame(
        [(u, v) for u, v in edges], "sourceNodeId long, targetNodeId long"
    )
    st = biconnectivity_state(df)
    br = {
        (r.edge_u, r.edge_v) for r in bridges(df, state=st).collect()
    }
    art = {r.nodeId for r in articulation_points(df, state=st).collect()}
    bcc = defaultdict(set)
    for r in biconnected_components(df, state=st).collect():
        bcc[r.bcc_id].add((r.edge_u, r.edge_v))
    return br, art, frozenset(frozenset(s) for s in bcc.values())


FIXTURES = [
    # path: every edge a bridge, every interior node an articulation
    [(1, 2), (2, 3), (3, 4)],
    # cycle: no bridges, no articulation points, one block
    [(1, 2), (2, 3), (3, 4), (4, 1)],
    # two cycles sharing node 3: 3 is an articulation point, 2 blocks
    [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)],
    # cycle with a pendant chain: bridge chain off node 2
    [(1, 2), (2, 3), (3, 1), (2, 10), (10, 11)],
    # disconnected: a path component and a triangle component
    [(1, 2), (2, 3), (20, 21), (21, 22), (22, 20)],
    # single edge
    [(7, 9)],
    # theta graph (two vertices joined by three paths): one block,
    # no bridges, no articulation points — cross edges in any BFS tree
    [(1, 2), (2, 6), (1, 3), (3, 6), (1, 4), (4, 5), (5, 6)],
]


@pytest.mark.parametrize("edges", FIXTURES)
def test_biconnect_fixtures(spark, edges):
    want = _ref_all(edges)
    got = _spark_all(spark, edges)
    assert got[0] == want[0], ("bridges", got[0], want[0])
    assert got[1] == want[1], ("articulation", got[1], want[1])
    assert got[2] == want[2], ("blocks", got[2], want[2])


def test_biconnect_random_graphs(spark):
    for seed in range(5):
        rng = random.Random(1500 + seed)
        n = 40
        m = 55
        edges = set()
        while len(edges) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        edges = sorted(edges)
        want = _ref_all(edges)
        got = _spark_all(spark, edges)
        assert got[0] == want[0], ("bridges", seed, got[0] ^ want[0])
        assert got[1] == want[1], ("articulation", seed, got[1] ^ want[1])
        assert got[2] == want[2], ("blocks", seed)


def test_biconnect_empty_and_guards(spark):
    df = spark.createDataFrame([], "sourceNodeId long, targetNodeId long")
    assert bridges(df).count() == 0
    assert articulation_points(df).count() == 0
    assert biconnected_components(df).count() == 0
    # depth budget raises loudly on a long path
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)],
        "sourceNodeId long, targetNodeId long",
    )
    with pytest.raises(RuntimeError, match="BFS still expanding"):
        biconnectivity_state(path, max_depth=3)
    # exactly-at-budget must NOT trip (the off-by-one class): depth 12
    st = biconnectivity_state(path, max_depth=12)
    assert bridges(path, state=st).count() == 12
