"""5× structure-preserving scale replicas for the round-9 graph family
(VERDICT r9 #4 — rounds 2/4/5 ran this protocol for dedup/quality/
packing; the graph operators had only single-SF points).

Method: materialize the exact graph inputs the catalog rows use at
sf0.1 (thinned co-order edges at both thresholds, the size-50-part seed
set, the customer→order edges), then a 5× replica as FIVE DISJOINT
ID-OFFSET COPIES — per-node degree, component structure, core depth,
triangle counts, and BFS reachability are preserved exactly per copy,
so output rows grow exactly 5× and the iterative operators run the SAME
number of rounds over 5× data per round. That isolates the question the
protocol asks: is per-round cost data-proportional (healthy: wall grows
≤~data, since the ~13-round scheduler floor amortizes) or
pair-quadratic / straggler-bound (wall grows faster than data)?

Both scales read from parquet (replica build cost is not timed). Run:

    python scripts/scale_replica_graph.py [--trials N]

Prints one JSON line per operator: x1/x5 best-of-N seconds, the wall
ratio, and the output row counts (x5 MUST be exactly 5× x1 — asserted,
so a replica that accidentally couples copies is an error, not a
silently-wrong benchmark).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark.queries import _co_order_edges

OFFSET = 100_000_000  # far above any sf0.1 part/order key


def replicate(df, cols, copies=5):
    out = None
    for r in range(copies):
        c = df.select(
            *[(F.col(x) + F.lit(r * OFFSET)).alias(x) for x in cols]
        )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-replica-graph")
    root = tempfile.mkdtemp(prefix="graph_replica_")

    seeds = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("nodeId"))
    )
    co30 = _co_order_edges(spark, sf_dir)
    co43 = _co_order_edges(spark, sf_dir, min_qty=43)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("sourceNodeId"),
        F.col("o_orderkey").alias("targetNodeId"),
    )
    heavy = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 45)
        .select(
            F.col("l_partkey").alias("sourceNodeId"),
            F.col("l_orderkey").alias("targetNodeId"),
        )
    )
    inputs = {
        "seeds": (seeds, ["nodeId"]),
        "co30": (co30, ["sourceNodeId", "targetNodeId"]),
        "co43": (co43, ["sourceNodeId", "targetNodeId"]),
        "orders": (orders, ["sourceNodeId", "targetNodeId"]),
        "heavy": (heavy, ["sourceNodeId", "targetNodeId"]),
    }
    paths: dict[str, dict[int, str]] = {}
    for name, (df, cols) in inputs.items():
        paths[name] = {}
        for scale in (1, 5):
            p = f"{root}/{name}_x{scale}"
            (df if scale == 1 else replicate(df, cols)).write.mode(
                "overwrite"
            ).parquet(p)
            paths[name][scale] = p

    def rd(name, scale):
        return spark.read.parquet(paths[name][scale])

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        bfs_hop_distance,
        kcore,
        local_clustering_coefficient,
        ktruss,
        node2vec_walks,
        node_similarity,
        personalized_pagerank_fixedpoint,
        random_walks,
        sample_neighbors,
        shortest_paths,
        skipgram_pairs,
    )

    def ppr(scale):
        canon = rd("co30", scale)
        edges = canon.unionByName(
            canon.select(
                F.col("targetNodeId").alias("sourceNodeId"),
                F.col("sourceNodeId").alias("targetNodeId"),
            )
        )
        return personalized_pagerank_fixedpoint(
            rd("seeds", scale), edges, iters=4
        )

    def sym(scale):
        canon = rd("co30", scale)
        return canon.unionByName(
            canon.select(
                F.col("targetNodeId").alias("sourceNodeId"),
                F.col("sourceNodeId").alias("targetNodeId"),
            )
        )

    ops = {
        "graph_bfs": lambda s: bfs_hop_distance(
            rd("seeds", s), rd("co30", s), max_hops=3, directed=False
        ),
        "graph_kcore": lambda s: kcore(rd("co43", s), k=3),
        "graph_ppr": ppr,
        "graph_clustering": lambda s: local_clustering_coefficient(
            rd("co30", s)
        ),
        "graph_sample_neighbors": lambda s: sample_neighbors(
            rd("orders", s), k=5, seed=7
        ),
        # r10 additions — walks/skipgrams are hash-deterministic per
        # (start, walk) so replica output rows still scale exactly 5×;
        # node_similarity pairs stay within a replica (disjoint ids)
        "graph_random_walks": lambda s: random_walks(
            sym(s), walks_per_node=2, walk_length=3, seed=7
        ),
        "graph_walk_skipgrams": lambda s: skipgram_pairs(
            random_walks(sym(s), walks_per_node=2, walk_length=3, seed=7),
            window=2,
        ),
        "graph_node_similarity": lambda s: node_similarity(
            rd("heavy", s), threshold=0.3
        ),
        "graph_node2vec_walks": lambda s: node2vec_walks(
            sym(s), walks_per_node=2, walk_length=3,
            w_return=1, w_near=4, w_far=2, seed=7,
        ),
        "graph_ktruss": lambda s: ktruss(rd("co30", s), k=4),
        "graph_shortest_paths": lambda s: shortest_paths(
            rd("seeds", s),
            rd("co30", s).select(
                "sourceNodeId", "targetNodeId",
                (F.lit(1) + (F.col("sourceNodeId")
                             + F.col("targetNodeId")) % 7).alias("w"),
            ),
            "w",
            max_iter=25,
            directed=False,
        ),
    }

    results = {}
    for name, fn in ops.items():
        rows = {}
        best = {1: 1e9, 5: 1e9}
        for scale in (1, 5):
            rows[scale] = fn(scale).count()  # warm + structure check
        if name == "graph_walk_skipgrams":
            # replicas take different (hash-driven) walks, so DISTINCT
            # (center, context) counts vary slightly per copy — assert
            # the ratio, not exactness
            assert 4.5 <= rows[5] / rows[1] <= 5.5, (name, rows)
        else:
            assert rows[5] == 5 * rows[1], (name, rows)
        for _ in range(trials):
            for scale in (1, 5):
                t0 = time.perf_counter()
                fn(scale).write.format("noop").mode("overwrite").save()
                best[scale] = min(best[scale], time.perf_counter() - t0)
        results[name] = {
            "x1_sec": round(best[1], 2),
            "x5_sec": round(best[5], 2),
            "wall_ratio": round(best[5] / best[1], 2),
            "rows_x1": rows[1],
            "rows_x5": rows[5],
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"all": results, "loadavg": os.getloadavg()[0]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
