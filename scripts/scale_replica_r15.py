"""25× structure-preserving scale replicas for the round-15 operators
(the VERDICT r12 #6 protocol, extended per round): disjoint id-offset
copies keep per-copy structure — and therefore ROUND COUNTS — identical
by construction, so the wall-clock ratio isolates pure per-round data
volume; output rows must be exactly 25× (asserted).

Rows measured:
- pareto_frontier_nd — the SAME 100k-row synthetic 3-d point table as
  scripts/scale_replica_r14.py, re-measured after the r15 second-level
  merge prefilter (VERDICT r14 #5: the r14 ratio was 4.39× because the
  O(S²) merge saw ~P local frontiers; the second local-skyline pass
  over the repartitioned candidates prunes cross-partition dominance
  first). Apples-to-apples with the recorded r14 number.
- graph_bridges — biconnectivity over 25 disjoint copies of a
  structured chains+cycles graph (per-copy tree depth identical, so
  BFS/size/preorder round counts are constant; the ratio is per-level
  join volume + the sparse table's V·log V rows).
- graph_ksp — k smallest distinct walk costs over 25 disjoint copies
  of ring(20)+chord gadgets with copy-invariant LITERAL weights (same
  per-gadget structure everywhere → identical relaxation round count;
  the ratio is pure per-round join + top-k window volume).

Run:  python scripts/scale_replica_r15.py [--trials N] [--copies K]
                                          [--only name,name]
Prints one JSON line per row: x1/xK best-of-N seconds + ratio.
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
from dataflow_flex_pyarrow_to_gds_spark.operators.biconnect import bridges
from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
    k_shortest_path_lengths,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
    pareto_frontier_nd,
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
    argv = sys.argv[1:]
    if "--trials" in argv:
        trials = int(argv[argv.index("--trials") + 1])
    if "--copies" in argv:
        copies = int(argv[argv.index("--copies") + 1])
    spark = get_spark(
        app_name="scale-replica-r15",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    root = tempfile.mkdtemp(prefix="r15rep_")

    # identical to scale_replica_r14's pts — apples-to-apples vs the
    # recorded 4.39× pre-prefilter ratio
    pts = spark.range(100_000).select(
        F.col("id"),
        F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(1000)).alias("a"),
        F.pmod(F.hash(F.col("id") * 13 + 5), F.lit(1000)).alias("b"),
        F.pmod(F.hash(F.col("id") * 31 + 9), F.lit(1000)).alias("c"),
    )
    # chains+cycles graph: 2000 gadgets of 10 nodes each — a 5-path
    # (bridges) whose head crosses (bridge) into a 5-cycle (block);
    # per-gadget tree depth constant → constant BFS/size/preorder rounds
    g = spark.range(2000)
    base_n = g.select((F.col("id") * 100).alias("g0"))
    path = None
    parts = []
    for i in range(4):  # 5-path: edges g0+i — g0+i+1
        parts.append(
            base_n.select(
                (F.col("g0") + i).alias("sourceNodeId"),
                (F.col("g0") + i + 1).alias("targetNodeId"),
            )
        )
    parts.append(  # cross bridge: path head -> cycle head
        base_n.select(
            F.col("g0").alias("sourceNodeId"),
            (F.col("g0") + 10).alias("targetNodeId"),
        )
    )
    for i in range(4):  # 5-cycle chain part: 10..14
        parts.append(
            base_n.select(
                (F.col("g0") + 10 + i).alias("sourceNodeId"),
                (F.col("g0") + 11 + i).alias("targetNodeId"),
            )
        )
    parts.append(  # cycle close: 14 -> 10
        base_n.select(
            (F.col("g0") + 14).alias("sourceNodeId"),
            (F.col("g0") + 10).alias("targetNodeId"),
        )
    )
    ge = parts[0]
    for p in parts[1:]:
        ge = ge.unionByName(p)

    # ksp gadgets: 500 disjoint ring(20)+chord(+7) graphs, weights a
    # LITERAL per local position (copy-invariant — a hash of global
    # node ids would give every copy different weights and break the
    # constant-round-count invariant); seed = node g0 per gadget
    kn = spark.range(500).select((F.col("id") * 20).alias("g0"))
    kparts = []
    for i in range(20):
        kparts.append(
            kn.select(
                (F.col("g0") + i).alias("sourceNodeId"),
                (F.col("g0") + ((i + 1) % 20)).alias("targetNodeId"),
                F.lit((i % 5) + 1).cast("long").alias("w"),
            )
        )
        kparts.append(
            kn.select(
                (F.col("g0") + i).alias("sourceNodeId"),
                (F.col("g0") + ((i + 7) % 20)).alias("targetNodeId"),
                F.lit(((i * 3) % 5) + 2).cast("long").alias("w"),
            )
        )
    ke = kparts[0]
    for p in kparts[1:]:
        ke = ke.unionByName(p)
    ks = kn.select(F.col("g0").alias("nodeId"))

    def mat(df, name, sc, id_cols):
        path = os.path.join(root, f"{name}_x{sc}")
        (df if sc == 1 else replicate(df, id_cols, sc)).write.mode(
            "overwrite"
        ).parquet(path)
        return path

    paths = {}
    for nm, df, idc in [
        ("pts", pts, ["id"]),
        ("ge", ge, ["sourceNodeId", "targetNodeId"]),
        ("ke", ke, ["sourceNodeId", "targetNodeId"]),
        ("ks", ks, ["nodeId"]),
    ]:
        for sc in (1, copies):
            paths[(nm, sc)] = mat(df, nm, sc, idc)

    def rd(nm, sc):
        return spark.read.parquet(paths[(nm, sc)])

    def run_pareto(sc):
        return pareto_frontier_nd(rd("pts", sc), ["a", "b", "c"]).count()

    def run_bridges(sc):
        return bridges(rd("ge", sc)).count()

    def run_ksp(sc):
        return k_shortest_path_lengths(
            rd("ks", sc), rd("ke", sc), "w", 3, max_iter=30, directed=False
        ).count()

    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
    results = {}
    for name, fn, input_nm in [
        ("pareto_frontier_nd", run_pareto, "pts"),
        ("graph_bridges", run_bridges, "ge"),
        ("graph_ksp", run_ksp, "ke"),
    ]:
        if only and name not in only:
            continue
        e1 = rd(input_nm, 1).count()
        eK = rd(input_nm, copies).count()
        t1, n1 = timed(lambda: fn(1), trials)
        tK, nK = timed(lambda: fn(copies), trials)
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
