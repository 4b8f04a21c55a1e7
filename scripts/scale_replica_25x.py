"""25× structure-preserving scale replicas for the heaviest iterative
rows (VERDICT r12 #6): the 5× protocol is green and the graph-family
floor argument ("driver-coordinated rounds dominate at sf0.1")
predicts NEAR-FLAT 25× trajectories — this script measures it, because
a superlinear surprise at 25× is exactly what the 100-TB stance must
catch early.

Replica construction: 25 disjoint id-offset copies of each fixture
input (the r12 protocol's `replicate`) — per-copy degree structure
identical, iteration/round counts IDENTICAL by construction (copies
are disjoint, so fixpoints converge in the same number of rounds; the
wall-clock delta is pure per-round data volume), output rows exactly
25× (asserted). Both scales read from parquet; replica build cost is
untimed.

Rows measured (the r12 bench top of the iterative family):
- graph_k1coloring        — Jones-Plassmann over the min_qty-43 graph
- graph_cc_incremental    — delta fold into a 25×-replicated labeling
- graph_pagerank_weighted — 4 weighted power rounds
- graph_betweenness       — 4-landmark Brandes, hops ≤ 10 (landmarks
  stay in copy 0: cost ∝ landmarks × reachable set by design, so the
  expected ratio is ≪ 25 — the documented 100-TB shape, not a bug)
- graph_scc               — r13's coloring decomposition (color
  fixpoint + backward mark + peel), order-cycle fixture

Run:  python scripts/scale_replica_25x.py [--trials N] [--copies K]
Prints one JSON line per row: x1/xK best-of-N seconds, ratio, row and
edge counts at both scales.
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
from dataflow_flex_pyarrow_to_gds_spark.queries import (
    _BETWEENNESS_ORACLE_HOPS,
    _PRW_ITERS,
    _co_order_edges,
    _scc_edges,
)

OFFSET = 100_000_000


def replicate(df, id_cols, copies):
    out = None
    for r in range(copies):
        c = df.select(
            *[
                (F.col(x) + F.lit(r * OFFSET)).alias(x)
                if x in id_cols
                else F.col(x)
                for x in df.columns
            ]
        )
        out = c if out is None else out.unionByName(c)
    return out


def timed(fn, trials):
    best = 1e9
    for _ in range(trials):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> int:
    trials = 2
    copies = 25
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-replica-25x")
    root = tempfile.mkdtemp(prefix="r13_replica25_")

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        connected_components,
        connected_components_incremental,
        k1_coloring,
        landmark_betweenness,
        pagerank_weighted,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.scc import (
        strongly_connected_components,
    )

    ids2 = ["sourceNodeId", "targetNodeId"]

    # ---- shared fixture inputs (built once, materialized untimed) ----
    co30 = _co_order_edges(spark, sf_dir)
    co43 = _co_order_edges(spark, sf_dir, min_qty=43)
    co42 = _co_order_edges(spark, sf_dir, min_qty=42)
    delta = co42.exceptAll(co43)
    nodes43 = (
        co43.select(F.col("sourceNodeId").alias("nodeId"))
        .unionByName(co43.select(F.col("targetNodeId").alias("nodeId")))
        .distinct()
    )
    labels43 = connected_components(nodes43, co43, max_iter=30)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pw = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wsym = pw.select(
        F.col("u").alias("sourceNodeId"),
        F.col("v").alias("targetNodeId"),
        "w",
    ).unionByName(
        pw.select(
            F.col("v").alias("sourceNodeId"),
            F.col("u").alias("targetNodeId"),
            "w",
        )
    )
    scc_e = _scc_edges(spark, sf_dir)

    def mat(df, name, scale_copies, id_cols):
        path = os.path.join(root, f"{name}_x{scale_copies}")
        (
            df
            if scale_copies == 1
            else replicate(df, id_cols, scale_copies)
        ).write.mode("overwrite").parquet(path)
        return path

    paths = {}
    for nm, df, idc in [
        ("co30", co30, ids2),
        ("co43", co43, ids2),
        ("delta", delta, ids2),
        ("labels43", labels43, ["nodeId", "component"]),
        ("wsym", wsym, ids2),
        ("scc_e", scc_e, ids2),
    ]:
        for sc in (1, copies):
            paths[(nm, sc)] = mat(df, nm, sc, idc)

    def rd(nm, sc):
        return spark.read.parquet(paths[(nm, sc)])

    def run_k1(sc):
        return k1_coloring(rd("co43", sc), seed=0, max_iter=16).count()

    def run_cci(sc):
        return connected_components_incremental(
            rd("labels43", sc), rd("delta", sc)
        ).count()

    def run_prw(sc):
        e = rd("wsym", sc)
        nodes = e.select(F.col("sourceNodeId").alias("nodeId")).distinct()
        return pagerank_weighted(nodes, e, "w", iters=_PRW_ITERS).count()

    def run_btw(sc):
        return landmark_betweenness(
            rd("co30", sc),
            k_landmarks=4,
            max_hops=_BETWEENNESS_ORACLE_HOPS,
        ).count()

    def run_scc(sc):
        return strongly_connected_components(rd("scc_e", sc)).count()

    rows = [
        ("graph_k1coloring", run_k1, "co43"),
        ("graph_cc_incremental", run_cci, "labels43"),
        ("graph_pagerank_weighted", run_prw, "wsym"),
        ("graph_betweenness", run_btw, "co30"),
        ("graph_scc", run_scc, "scc_e"),
    ]
    results = {}
    for name, fn, input_nm in rows:
        e1 = rd(input_nm, 1).count()
        eK = rd(input_nm, copies).count()
        t1, n1 = timed(lambda: fn(1), trials)
        tK, nK = timed(lambda: fn(copies), trials)
        # landmark betweenness scores only nodes REACHED from copy-0
        # landmarks (documented ≪25× expectation applies to rows too);
        # every other row must be exactly copies×
        if name != "graph_betweenness":
            assert nK == copies * n1, (name, n1, nK)
        results[name] = {
            "x1_sec": round(t1, 3),
            f"x{copies}_sec": round(tK, 3),
            "ratio": round(tK / t1, 2),
            "rows_x1": n1,
            f"rows_x{copies}": nK,
            "input_x1": e1,
            f"input_x{copies}": eK,
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(
        json.dumps(
            {"all": results, "copies": copies, "loadavg": os.getloadavg()[0]}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
