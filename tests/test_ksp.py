"""k_shortest_path_lengths — the data-parallel Yen's relative (r15).

Reference implementation: the textbook k-shortest-walks Dijkstra
variant adapted to DISTINCT costs — pop (d, v) in cost order; skip if
v already recorded d or already holds k distinct costs; otherwise
record and push every out-edge. Each node records at most k times, so
expansions are bounded by k·|E| and distinct costs are visited in
ascending order (non-negative weights), which is exactly the operator's
contract.
"""

from __future__ import annotations

import heapq
import random

import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
    k_shortest_path_lengths,
    shortest_paths,
)

NODE = "nodeId"
SRC = "sourceNodeId"
DST = "targetNodeId"


def _brute(seeds, edges, k, directed=True):
    """dict node -> sorted list of its k smallest distinct walk costs."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        if not directed:
            adj.setdefault(v, []).append((u, w))
    rec: dict[int, list[int]] = {}
    heap = [(0, s) for s in set(seeds)]
    heapq.heapify(heap)
    while heap:
        d, v = heapq.heappop(heap)
        got = rec.setdefault(v, [])
        if d in got or len(got) >= k:
            continue
        got.append(d)
        for nxt, w in adj.get(v, ()):
            nrec = rec.get(nxt, [])
            if len(nrec) < k or d + w < nrec[-1]:
                heapq.heappush(heap, (d + w, nxt))
    return {n: sorted(c) for n, c in rec.items()}


def _run(spark, seeds, edges, k, directed=True, **kw):
    sdf = spark.createDataFrame([(s,) for s in seeds], f"{NODE} long")
    edf = spark.createDataFrame(edges, f"{SRC} long, {DST} long, w long")
    out = k_shortest_path_lengths(
        sdf, edf, "w", k, directed=directed, **kw
    ).collect()
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r[NODE], []).append((r["k_rank"], r["dist"]))
    return {
        n: [d for _rk, d in sorted(pairs)] for n, pairs in got.items()
    }, out


def _rand_graph(rng, n, m, wmax):
    return [
        (rng.randrange(n), rng.randrange(n), rng.randrange(wmax + 1))
        for _ in range(m)
    ]


def test_line_graph_walk_costs(spark):
    # 0 -1-> 1 -1-> 2 plus a 2-cycle 1<->0 of cost 3: walks revisit
    edges = [(0, 1, 1), (1, 2, 1), (1, 0, 2)]
    got, rows = _run(spark, [0], edges, 3)
    assert got[0] == [0, 3, 6]          # 0, 0→1→0, 0→1→0→1→0
    assert got[1] == [1, 4, 7]
    assert got[2] == [2, 5, 8]
    # ranks are 1..k in ascending dist order
    by_node = {}
    for r in rows:
        by_node.setdefault(r[NODE], []).append((r["k_rank"], r["dist"]))
    for pairs in by_node.values():
        pairs.sort()
        assert [rk for rk, _ in pairs] == list(range(1, len(pairs) + 1))
        dists = [d for _, d in pairs]
        assert dists == sorted(set(dists))


def test_matches_brute_force_random(spark):
    rng = random.Random(1507)
    for trial in range(6):
        n = rng.randrange(4, 10)
        edges = _rand_graph(rng, n, rng.randrange(6, 22), 4)
        seeds = rng.sample(range(n), rng.randrange(1, 3))
        k = rng.randrange(1, 5)
        directed = trial % 2 == 0
        want = _brute(seeds, edges, k, directed=directed)
        got, _ = _run(
            spark, seeds, edges, k, directed=directed, max_iter=60
        )
        assert got == want, (seeds, edges, k, directed)


def test_k1_equals_shortest_paths(spark):
    rng = random.Random(42)
    edges = _rand_graph(rng, 8, 20, 5)
    sdf = spark.createDataFrame([(0,), (3,)], f"{NODE} long")
    edf = spark.createDataFrame(edges, f"{SRC} long, {DST} long, w long")
    base = {
        r[NODE]: r["dist"]
        for r in shortest_paths(sdf, edf, "w", max_iter=40).collect()
    }
    got, _ = _run(spark, [0, 3], edges, 1, max_iter=40)
    assert {n: c[0] for n, c in got.items()} == base


def test_seed_rank_one_is_zero(spark):
    got, _ = _run(spark, [5], [(5, 6, 2), (6, 5, 2)], 2)
    assert got[5][0] == 0 and got[6][0] == 2


def test_validation(spark):
    sdf = spark.createDataFrame([(0,)], f"{NODE} long")
    edf = spark.createDataFrame([(0, 1, 1)], f"{SRC} long, {DST} long, w long")
    with pytest.raises(ValueError, match="k must be"):
        k_shortest_path_lengths(sdf, edf, "w", 0)
    with pytest.raises(ValueError, match="max_iter"):
        k_shortest_path_lengths(sdf, edf, "w", 2, max_iter=0)
    fdf = spark.createDataFrame(
        [(0, 1, 1.5)], f"{SRC} long, {DST} long, w double"
    )
    with pytest.raises(TypeError, match="integer type"):
        k_shortest_path_lengths(sdf, fdf, "w", 2)
    ndf = spark.createDataFrame(
        [(0, 1, -1)], f"{SRC} long, {DST} long, w long"
    )
    with pytest.raises(ValueError, match="negative weight"):
        k_shortest_path_lengths(sdf, ndf, "w", 2)


def test_max_iter_raises_loudly(spark):
    # a long path needs one round per hop; max_iter=1 cannot finish
    edges = [(i, i + 1, 1) for i in range(5)]
    sdf = spark.createDataFrame([(0,)], f"{NODE} long")
    edf = spark.createDataFrame(edges, f"{SRC} long, {DST} long, w long")
    with pytest.raises(RuntimeError, match="still improving"):
        k_shortest_path_lengths(sdf, edf, "w", 1, max_iter=1)


def test_fixpoint_in_exactly_max_iter_rounds_ok(spark):
    # 3-hop line: k=1 needs exactly 3 productive rounds; max_iter=3
    # must NOT raise (the exactly-at-budget off-by-one class)
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
    got, _ = _run(spark, [0], edges, 1, max_iter=3)
    assert got == {0: [0], 1: [1], 2: [2], 3: [3]}
