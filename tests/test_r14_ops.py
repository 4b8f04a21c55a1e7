"""Round-14 operator tests: exact-rational quantile ranks (ADVICE r13
medium), the no-shrink duplicate-skew fallback (ADVICE r13 low), and
the high-cardinality joined-state grouped quantile engine (VERDICT r13
#3)."""

from __future__ import annotations

import random
from collections import defaultdict
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
    _exact_rank,
    exact_quantiles,
    exact_quantiles_grouped,
    exact_weighted_quantiles_grouped,
)


def test_exact_rank_is_rational_not_float():
    # the ADVICE r13 case: n-1 = 90, q = 0.7 — float product 62.999…
    # floors to 62 where the exact 63 is right
    assert _exact_rank(91, 0.7) == 64
    assert int((91 - 1) * 0.7) + 1 == 63  # the bug this replaces
    # exhaustive agreement with exact integer decile arithmetic
    for n in range(1, 2000):
        for i in range(1, 10):
            assert _exact_rank(n, i / 10) == ((n - 1) * i) // 10 + 1


def test_exact_quantiles_rank_regression(spark):
    df = spark.range(91).select((F.col("id") * 2).alias("x"))
    [r] = exact_quantiles(
        df, "x", [0.7], local_threshold=10, n_buckets=4
    ).collect()
    assert (r["rank"], r["value"]) == (64, 126)


def test_narrowing_no_shrink_duplicate_skew(spark):
    # 1 row of value 1 + 4999 rows of value 2: percentile_approx
    # returns only the range max, so bucket 0 equals the whole range
    # with two distinct values — without the forced min-value split
    # the loop makes zero progress and raises after max_rounds
    df = spark.range(5000).select(
        F.when(F.col("id") == 0, 1).otherwise(2).alias("x")
    )
    [r] = exact_quantiles(
        df, "x", [0.5], local_threshold=5, n_buckets=2, max_rounds=6
    ).collect()
    assert r["value"] == 2
    # the mirrored case: rank falls on the rare LOW value
    [r2] = exact_quantiles(
        df, "x", [0.0], local_threshold=5, n_buckets=2, max_rounds=6
    ).collect()
    assert r2["value"] == 1 and r2["rank"] == 1


def test_grouped_quantiles_hc_joined_path_vs_brute_force(spark):
    # 80 groups > _LITERAL_RANGE_BUDGET=64 → broadcast-joined range
    # state; verify every (group, q) against sorted-list brute force
    random.seed(7)
    rows = [
        (g, random.randint(0, 50))
        for g in range(80)
        for _ in range(random.randint(5, 40))
    ]
    gdf = spark.createDataFrame(rows, "g int, x int")
    out = exact_quantiles_grouped(
        gdf, "g", "x", [0.25, 0.5, 0.9], local_threshold=8, n_buckets=4
    )
    got = {
        (r["g"], r["quantile"]): (r["rank"], r["value"])
        for r in out.collect()
    }
    by_group = defaultdict(list)
    for g, x in rows:
        by_group[g].append(x)
    assert len(got) == 3 * len(by_group)
    for g, xs in by_group.items():
        xs.sort()
        for q in (0.25, 0.5, 0.9):
            rk = int((len(xs) - 1) * Fraction(str(q))) + 1
            assert got[(g, q)] == (rk, xs[rk - 1]), (g, q)


def test_grouped_quantiles_joined_equals_literal_path(spark):
    # same data, both engines (forced via group count straddling the
    # budget is awkward — instead run 80 groups joined vs per-group
    # ungrouped narrowing, which is the literal path)
    random.seed(11)
    rows = [(g, random.randint(0, 30)) for g in range(70) for _ in range(12)]
    gdf = spark.createDataFrame(rows, "g int, x int")
    joined = {
        (r["g"], r["quantile"]): (r["rank"], r["value"])
        for r in exact_quantiles_grouped(
            gdf, "g", "x", [0.5], local_threshold=4, n_buckets=4
        ).collect()
    }
    for g in (0, 33, 69):
        [lit] = exact_quantiles(
            gdf.filter(F.col("g") == g),
            "x",
            [0.5],
            local_threshold=4,
            n_buckets=4,
        ).collect()
        assert joined[(g, 0.5)] == (lit["rank"], lit["value"])


def test_weighted_grouped_hc_joined_path(spark):
    random.seed(13)
    rows = [
        (g, random.randint(0, 20), random.randint(1, 5))
        for g in range(66)
        for _ in range(15)
    ]
    gdf = spark.createDataFrame(rows, "g int, x int, w int")
    out = exact_weighted_quantiles_grouped(
        gdf, "g", "x", "w", [0.5], local_threshold=6, n_buckets=4
    )
    got = {r["g"]: (r["rank"], r["value"]) for r in out.collect()}
    by_group = defaultdict(list)
    for g, x, w in rows:
        by_group[g].extend([x] * w)  # weight expansion, the contract
    for g, xs in by_group.items():
        xs.sort()
        rk = int((len(xs) - 1) * Fraction("0.5")) + 1
        assert got[g] == (rk, xs[rk - 1]), g


def test_grouped_quantiles_max_groups_still_loud(spark):
    gdf = spark.createDataFrame(
        [(g, g) for g in range(30)], "g int, x int"
    )
    with pytest.raises(ValueError, match="max_groups"):
        exact_quantiles_grouped(gdf, "g", "x", [0.5], max_groups=10)


def test_colloc_headroom_guard_raises_loud(spark):
    # ADVICE r13: a ppm large enough to overflow DECIMAL(38,0) (or the
    # BIGINT quotient) must raise, never emit a wrapped/NULL score
    from dataflow_flex_pyarrow_to_gds_spark.operators.colloc import (
        bigram_collocations,
    )

    df = spark.createDataFrame(
        [("alpha beta alpha beta",)] * 3, "text string"
    )
    ok = {
        (r["w1"], r["w2"]): r["lift_ppm"]
        for r in bigram_collocations(df, "text", min_count=2).collect()
    }
    assert all(v is not None for v in ok.values()) and ok
    with pytest.raises(Exception, match="headroom"):
        bigram_collocations(df, "text", min_count=2, ppm=10**36).collect()


# ---- d-dimensional Pareto frontier (VERDICT r13 #6) --------------------


def _brute_skyline(points):
    def dom(a, b):  # a weakly dominates b
        return all(x >= y for x, y in zip(a, b)) and any(
            x > y for x, y in zip(a, b)
        )

    return sorted(
        p for p in points if not any(dom(q, p) for q in points)
    )


def test_pareto_nd_matches_brute_force(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    random.seed(17)
    pts = [
        (random.randint(0, 20), random.randint(0, 20), random.randint(0, 20))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pts, "a int, b int, c int").repartition(7)
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in pareto_frontier_nd(df, ["a", "b", "c"]).collect()
    )
    assert got == _brute_skyline(pts)


def test_pareto_nd_duplicates_kept_and_nulls_dropped(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    df = spark.createDataFrame(
        [(5, 5, 5), (5, 5, 5), (1, 1, 1), (None, 9, 9), (9, 9, None)],
        "a int, b int, c int",
    )
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in pareto_frontier_nd(df, ["a", "b", "c"]).collect()
    )
    assert got == [(5, 5, 5), (5, 5, 5)]


def test_pareto_nd_flood_case_passthrough_and_guard(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    # perfectly anticorrelated: EVERY point is on the frontier — the
    # local prefilter hits its keep cap and passes rows through, the
    # exact merge still answers, and the loud budget guard fires when
    # the budget is below the frontier size
    n = 300
    pts = [(i, n - i, i % 7) for i in range(n)]
    df = spark.createDataFrame(pts, "a int, b int, c int").repartition(3)
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in pareto_frontier_nd(
            df, ["a", "b", "c"], local_keep_cap=16
        ).collect()
    )
    assert got == _brute_skyline(pts) and len(got) == n
    with pytest.raises(ValueError, match="max_candidates"):
        pareto_frontier_nd(df, ["a", "b"], max_candidates=10).collect()


def test_pareto_nd_needs_two_dims(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="dimensions"):
        pareto_frontier_nd(df, ["a"])


def test_pareto_nd_mixed_directions(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    random.seed(41)
    pts = [
        (random.randint(0, 15), random.randint(0, 15), random.randint(0, 15))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "a int, b int, c int").repartition(5)
    got = sorted(
        (r["a"], r["b"], r["c"])
        for r in pareto_frontier_nd(
            df, ["a", "b", "c"], directions=["max", "min", "max"]
        ).collect()
    )
    # brute force on (a, -b, c) maximize-all
    flipped = _brute_skyline([(a, -b, c) for a, b, c in pts])
    assert got == sorted((a, -nb, c) for a, nb, c in flipped)
    assert {r[0] for r in got}  # non-empty
    # schema untouched (internal negated columns dropped)
    out = pareto_frontier_nd(
        df, ["a", "b"], directions=["min", "min"]
    )
    assert out.columns == ["a", "b", "c"]
    with pytest.raises(ValueError, match="directions"):
        pareto_frontier_nd(df, ["a", "b"], directions=["max"])
    with pytest.raises(ValueError, match="directions"):
        pareto_frontier_nd(df, ["a", "b"], directions=["max", "down"])


def test_colloc_int64_wrap_guard_raises(spark):
    # the review-confirmed dead-guard case: numerator fits
    # DECIMAL(38,0) but the quotient exceeds int64 — a BIGINT `div`
    # would wrap silently (observed: negative lift scores); the
    # DECIMAL-quotient guard must raise instead
    from dataflow_flex_pyarrow_to_gds_spark.operators.colloc import (
        bigram_collocations,
    )

    df = spark.createDataFrame(
        [("alpha beta alpha beta",)] * 3, "text string"
    )
    with pytest.raises(Exception, match="headroom"):
        bigram_collocations(df, "text", min_count=2, ppm=10**19).collect()


def test_pareto_nd_min_dim_must_be_numeric(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
        pareto_frontier_nd,
    )

    df = spark.createDataFrame([(1, "x")], "a int, b string")
    with pytest.raises(ValueError, match="must be numeric"):
        pareto_frontier_nd(df, ["a", "b"], directions=["max", "min"])
