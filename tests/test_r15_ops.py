"""Round-15 hardening tests: the ADVICE r14 overflow/validation fixes
(mst maximum-key negation, skyline min-dim negation + cap guard,
thread-local SCC stats) and the codegen-sized first-collision-band
rewrite (VERDICT r14 #2)."""

import random
import threading

import pytest
from pyspark.sql import functions as F

LONG_MIN = -(1 << 63)


# ---------------------------------------------------------------------------
# mst: maximum-objective negation overflow guard (ADVICE r14)
# ---------------------------------------------------------------------------

def test_msf_max_long_min_weight_raises(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.mst import (
        minimum_spanning_forest,
    )

    edges = spark.createDataFrame(
        [(1, 2, LONG_MIN), (2, 3, 5)],
        "sourceNodeId long, targetNodeId long, weight long",
    )
    with pytest.raises(ValueError, match="negate an integer weight"):
        minimum_spanning_forest(edges, objective="maximum")
    # the same weights are fine for the minimum objective (no negation)
    got = minimum_spanning_forest(edges, objective="minimum").collect()
    assert {(r.edge_u, r.edge_v) for r in got} == {(1, 2), (2, 3)}


def test_msf_max_decimal_weights_exact(spark):
    """Decimal weights must NOT take the try_multiply path (precision
    widening can round at decimal(38,s)); plain negation is exact."""
    from decimal import Decimal

    from dataflow_flex_pyarrow_to_gds_spark.operators.mst import (
        minimum_spanning_forest,
    )

    edges = spark.createDataFrame(
        [
            (1, 2, Decimal("3.10")),
            (2, 3, Decimal("2.50")),
            (1, 3, Decimal("9.90")),
        ],
        "sourceNodeId long, targetNodeId long, weight decimal(10,2)",
    )
    got = minimum_spanning_forest(
        edges, objective="maximum"
    ).collect()
    assert {(r.edge_u, r.edge_v) for r in got} == {(1, 3), (1, 2)}


# ---------------------------------------------------------------------------
# skyline: validation + overflow guards + second-level merge prefilter
# ---------------------------------------------------------------------------

def test_skyline_local_keep_cap_validated(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="local_keep_cap"):
        pareto_frontier_nd(df, ["a", "b", "c"], local_keep_cap=0)


def test_skyline_min_dim_long_min_raises(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    df = spark.createDataFrame(
        [(1, 10, LONG_MIN), (2, 20, 5)], "id long, x long, y long"
    )
    with pytest.raises(Exception, match="overflowed on negation"):
        pareto_frontier_nd(
            df, ["x", "y"], directions=["max", "min"]
        ).collect()


def test_skyline_mixed_direction_matches_bruteforce(spark):
    """Mixed max/min frontier vs a driver-side brute force across many
    partitions — exercises BOTH prefilter levels (phase 1 per input
    partition, the r15 second-level merge pass across them)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    rng = random.Random(1507)
    rows = [
        (i, rng.randint(0, 30), rng.randint(0, 30), rng.randint(0, 30))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "id long, a long, b long, c long"
    ).repartition(16)
    got = {
        r.id
        for r in pareto_frontier_nd(
            df, ["a", "b", "c"], directions=["max", "min", "max"]
        ).collect()
    }

    def dominated(p, q):  # q dominates p?
        ge = q[1] >= p[1] and q[2] <= p[2] and q[3] >= p[3]
        gt = q[1] > p[1] or q[2] < p[2] or q[3] > p[3]
        return ge and gt

    want = {
        p[0]
        for p in rows
        if not any(dominated(p, q) for q in rows)
    }
    assert got == want


def test_skyline_second_prefilter_lossless_small_cap(spark):
    """With a tiny local_keep_cap (both prefilter levels degrade to
    passthrough mid-batch) the frontier is still exact — correctness
    never depends on either prefilter."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    rng = random.Random(42)
    rows = [(i, rng.randint(0, 15), rng.randint(0, 15)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long").repartition(8)
    got = {
        r.id
        for r in pareto_frontier_nd(
            df, ["x", "y"], local_keep_cap=2
        ).collect()
    }
    want = {
        p[0]
        for p in rows
        if not any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in rows
        )
    }
    assert got == want


# ---------------------------------------------------------------------------
# scc: thread-local run stats (ADVICE r14)
# ---------------------------------------------------------------------------

def test_scc_stats_thread_local(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators import scc

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3)], "sourceNodeId long, targetNodeId long"
    )
    scc.strongly_connected_components(edges).collect()
    here = scc.last_run_stats()
    assert here and "outer_rounds" in here

    seen_other: dict = {"stats": None}

    def other():
        seen_other["stats"] = scc.last_run_stats()

    t = threading.Thread(target=other)
    t.start()
    t.join()
    # a thread that never ran SCC sees empty, not this thread's stats
    assert seen_other["stats"] == {}
    # and the accessor returns a COPY — mutating it can't clobber
    here["outer_rounds"] = -999
    assert scc.last_run_stats()["outer_rounds"] != -999


# ---------------------------------------------------------------------------
# dedup: linear first-collision-band ≡ brute force (VERDICT r14 #2)
# ---------------------------------------------------------------------------

def test_first_collision_band_matches_bruteforce(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        _first_collision_band,
    )

    rng = random.Random(7)
    bands = 24
    rows = []
    for i in range(300):
        l = [rng.randint(0, 3) for _ in range(bands)]
        r = [rng.randint(0, 3) for _ in range(bands)]
        rows.append((i, l, r))
    df = spark.createDataFrame(
        rows, "i long, l array<long>, r array<long>"
    )
    got = {
        row.i: row.fb
        for row in df.select(
            "i",
            _first_collision_band(F.col("l"), F.col("r"), bands).alias(
                "fb"
            ),
        ).collect()
    }
    for i, l, r in rows:
        want = next((b for b in range(bands) if l[b] == r[b]), None)
        assert got[i] == want, (i, got[i], want)


def test_minhash_banded_stage_stays_codegen(spark, sf_dir):
    """The r14 quadratic CASE blew janino's 64 KB method limit and
    silently demoted the fused candidate+verify stage to interpreted
    eval. Guard the fix structurally: the generated first-band filter
    must be LINEAR in bands — count element_at occurrences in the
    optimized plan."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        _first_collision_band,
    )

    bands = 24
    df = spark.createDataFrame(
        [(1, list(range(bands)), list(range(bands)))],
        "i long, l array<long>, r array<long>",
    )
    plan = (
        df.select(
            _first_collision_band(F.col("l"), F.col("r"), bands).alias("fb")
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    n = plan.count("element_at")
    # linear: 2 per band; the r14 quadratic form emitted bands*(bands-1)
    assert n <= 2 * bands, n


# ---------------------------------------------------------------------------
# quantile narrowing engine: r15 one-action rounds (arithmetic bucket
# tag + observed-bounds bookkeeping + rank-balanced skew fallback)
# ---------------------------------------------------------------------------

def test_quantiles_value_skew_sketch_fallback(spark):
    """Exponentially-spaced values are the worst case for the r15
    equi-width arithmetic buckets (most rows land in bucket 0 every
    round); the <4x-shrink sketch fallback must kick in and still
    localize every rank within the default round budget."""
    from fractions import Fraction

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles,
    )

    vals = [float(2 ** (i % 40)) for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    clean = sorted(vals)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = {
        r["quantile"]: (r["rank"], r["value"])
        for r in exact_quantiles(
            df, "x", qs, local_threshold=20, n_buckets=4
        ).collect()
    }
    for q in qs:
        rank = int((len(clean) - 1) * Fraction(str(q))) + 1
        assert got[q] == (rank, clean[rank - 1]), (q, got[q])


def test_quantiles_huge_int64_span_exact(spark):
    """int64 values whose span collapses or rounds under the double
    cast: the arithmetic tag only needs MONOTONICITY (bookkeeping uses
    observed bucket maxes), and a fully degenerate double span falls
    back to exact integer cuts — results must be exact order
    statistics either way."""
    from fractions import Fraction

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles,
    )

    big = (1 << 62)
    vals = (
        [big + i for i in range(50)]          # adjacent under double
        + [-big + i for i in range(50)]       # huge span
        + [i * 7 for i in range(100)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    clean = sorted(vals)
    qs = [0.0, 0.1, 0.5, 0.77, 1.0]
    got = {
        r["quantile"]: (r["rank"], r["value"])
        for r in exact_quantiles(
            df, "x", qs, local_threshold=8, n_buckets=4, max_rounds=12
        ).collect()
    }
    for q in qs:
        rank = int((len(clean) - 1) * Fraction(str(q))) + 1
        assert got[q] == (rank, clean[rank - 1]), (q, got[q])


def test_grouped_quantiles_one_action_per_round(spark):
    """The r15 engine contract: a narrowing round is ONE job (the
    grouped stats pass) — no separate boundary scan. Census the jobs
    of a 2-round grouped narrowing via the status tracker."""
    import random as _random

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles_grouped,
    )

    _random.seed(3)
    rows = [(g, _random.random()) for g in range(3) for _ in range(4000)]
    df = spark.createDataFrame(rows, "g int, x double").localCheckpoint()
    sc = spark.sparkContext
    sc.setJobGroup("qjob_census", "narrowing census")
    out = exact_quantiles_grouped(
        df, "g", "x", [0.5, 0.9], local_threshold=30, n_buckets=4
    )
    out.collect()
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("qjob_census")
    # actions: initial fused counts+minmax (1) + arithmetic narrowing
    # rounds (1 each) + batched finish (1). AQE books each shuffle
    # stage as its own job, so the census over-counts actions — the
    # bound is the REGRESSION tripwire: this exact shape measures 10
    # jobs on the r15 engine vs 23 on the r13-r14 two-action engine
    # (separate count, per-round boundary scan). 12 allows scheduler
    # jitter while still failing if a per-round scan creeps back.
    assert len(jobs) <= 12, len(jobs)
