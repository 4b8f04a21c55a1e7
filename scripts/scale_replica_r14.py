"""25× structure-preserving scale replicas for the round-14 operators
(the VERDICT r12 #6 protocol, extended per round): disjoint id-offset
copies keep per-copy structure — and therefore ROUND COUNTS — identical
by construction, so the wall-clock ratio isolates pure per-round data
volume; output rows must be exactly 25× (asserted).

Rows measured:
- graph_mst — Borůvka over 25 disjoint copies of the sf0.1 supplier
  co-procurement graph (25 independent forests; merge rounds identical
  per copy, so the ratio is the per-round join volume).
- pareto_frontier_nd — 25 offset copies of a 100k-row synthetic 3-d
  point table (dims identical across copies → every copy's frontier
  survives, duplicates kept by the skyline convention → output exactly
  25×; measures the MapInPandas prefilter + bounded merge at volume).
- exact_quantiles_grouped (joined path) — the GROUP axis: 25× the
  groups (suppliers offset per copy → 100 → 2500 groups × 3 ranks),
  per-group data identical → identical rounds; measures the
  broadcast-joined state path's "more tenants" claim directly.

Run:  python scripts/scale_replica_r14.py [--trials N] [--copies K]
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
from dataflow_flex_pyarrow_to_gds_spark.operators.mst import (
    minimum_spanning_forest,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
    exact_quantiles_grouped,
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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="scale-replica-r14",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    root = tempfile.mkdtemp(prefix="r14rep_")

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    co_supp = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pts = spark.range(100_000).select(
        F.col("id"),
        F.pmod(F.hash(F.col("id") * 7 + 1), F.lit(1000)).alias("a"),
        F.pmod(F.hash(F.col("id") * 13 + 5), F.lit(1000)).alias("b"),
        F.pmod(F.hash(F.col("id") * 31 + 9), F.lit(1000)).alias("c"),
    )
    gq_in = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice"
    )

    def mat(df, name, sc, id_cols):
        path = os.path.join(root, f"{name}_x{sc}")
        (df if sc == 1 else replicate(df, id_cols, sc)).write.mode(
            "overwrite"
        ).parquet(path)
        return path

    paths = {}
    for nm, df, idc in [
        ("co_supp", co_supp, ["src", "dst"]),
        ("pts", pts, ["id"]),
        ("gq", gq_in, ["l_suppkey"]),
    ]:
        for sc in (1, copies):
            paths[(nm, sc)] = mat(df, nm, sc, idc)

    def rd(nm, sc):
        return spark.read.parquet(paths[(nm, sc)])

    def run_mst(sc):
        return minimum_spanning_forest(
            rd("co_supp", sc), weight_col="w", src="src", dst="dst"
        ).count()

    def run_pareto(sc):
        return pareto_frontier_nd(
            rd("pts", sc), ["a", "b", "c"]
        ).count()

    def run_gq(sc):
        # max_groups raised for the replica: 25 copies of sf0.1's 1000
        # suppliers = 25k groups, just past the 20k default — the knob
        # is the caller's loud budget, and THIS caller's point is to
        # measure that exact regime
        return exact_quantiles_grouped(
            rd("gq", sc),
            "l_suppkey",
            "l_extendedprice",
            [0.25, 0.5, 0.9],
            local_threshold=200,
            n_buckets=8,
            max_groups=30_000,
        ).count()

    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))
    results = {}
    for name, fn, input_nm in [
        ("graph_mst", run_mst, "co_supp"),
        ("pareto_frontier_nd", run_pareto, "pts"),
        ("exact_quantiles_grouped_hc", run_gq, "gq"),
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
