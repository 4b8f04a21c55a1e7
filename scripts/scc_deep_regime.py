"""SCC deep-regime measurement (VERDICT r13 #5): adversarial fixtures
that stress exactly the dimensions the loud guards bound — condensation
depth (outer peels), component diameter (color/mark fixpoint rounds),
and trivial-mass fraction (the r14 Trim pre-pass's target) — with wall
time and the operator's own round counters (scc.last_run_stats()).

Run: ``python scripts/scc_deep_regime.py`` — prints one table; numbers
are committed into ARCHITECTURE.md's deep-regime section.

Fixtures (synthetic, driver-generated — the testdata co-order graph is
shallow by construction, which is the *normal* regime; these are the
pathological ones):

- chain(K, C): K components of a C-cycle each, linearly chained →
  condensation depth K. Outer rounds should track K; per-round cost is
  the remaining subgraph.
- cycle(L): one L-cycle → color fixpoint needs ~L rounds (graph
  diameter), the documented worst axis; the guard default (64) is the
  regime boundary this measures against.
- star_mass(C, T1, T2): a C-cycle core + T1 depth-1 + T2 depth-2
  trivial periphery (~99% trivial mass) — trim_rounds=2 vs 0 shows
  what the pre-pass buys on the realistic "mostly trivial" shape.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark.operators import scc


def edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(t)) for s, t in pairs],
        "sourceNodeId long, targetNodeId long",
    )


def chain(k: int, c: int):
    pairs = []
    for comp in range(k):
        base = comp * c
        pairs += [(base + i, base + (i + 1) % c) for i in range(c)]
        if comp + 1 < k:
            pairs.append((base, (comp + 1) * c))
    return pairs


def cycle(length: int):
    return [(i, (i + 1) % length) for i in range(length)]


def star_mass(c: int, t1: int, t2: int):
    pairs = [(i, (i + 1) % c) for i in range(c)]
    leaf0 = c
    for i in range(t1):
        pairs.append((leaf0 + i, i % c))  # depth-1 leaves into the core
    leaf1 = c + t1
    for i in range(t2):
        pairs.append((leaf1 + i, leaf0 + (i % t1)))  # depth-2 layer
    return pairs


def run(spark, name, pairs, **kw):
    df = edges_df(spark, pairs)
    t0 = time.perf_counter()
    n = scc.strongly_connected_components(df, **kw).count()
    dt = time.perf_counter() - t0
    st = scc.last_run_stats()
    print(
        f"{name:<28} nodes={n:<7} wall={dt:6.1f}s "
        f"trim={st['trim_rounds']} outer={st['outer_rounds']} "
        f"color={st['color_rounds']} mark={st['mark_rounds']} "
        f"({kw})"
    )
    return dt, st


def main() -> None:
    spark = get_spark(
        app_name="scc-deep-regime",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        shuffle_partitions=8,
    )
    print("== condensation depth (chained 8-cycles) ==")
    for k in (4, 8, 16):
        run(spark, f"chain(K={k}, C=8)", chain(k, 8), max_outer=k + 2)
    print("== component diameter (single L-cycle) ==")
    for length in (32, 64, 128):
        run(
            spark,
            f"cycle(L={length})",
            cycle(length),
            max_rounds=length + 2,
        )
    print("== trivial mass: trim on/off (16-cycle + 3000+3000 periphery) ==")
    pairs = star_mass(16, 3000, 3000)
    run(spark, "star_mass trim=2", pairs, trim_rounds=2)
    run(spark, "star_mass trim=0", pairs, trim_rounds=0, max_outer=16)


if __name__ == "__main__":
    main()
