"""Round-13 operators: KMV set ops, Pareto frontier, collocations."""

import pytest

from dataflow_flex_pyarrow_to_gds_spark.operators.colloc import (
    bigram_collocations,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
    kmv_set_ops,
    kmv_sketch,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.skyline import (
    pareto_frontier,
)

_KMV_SHIFT = (1 << 63) + 1


def test_kmv_set_ops_exact_regime(spark):
    """Both sketches under-full → every count is exact, theta NULL."""
    a = spark.createDataFrame(
        [(i,) for i in (1, 2, 3)], "v long"
    )
    b = spark.createDataFrame(
        [(i,) for i in (2, 3, 4, 5)], "v long"
    )
    k = 16
    sa, sb = kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k)
    row = kmv_set_ops(sa, sb, k=k).collect()[0]
    assert row["theta_hash"] is None
    assert row["union_est"] == 5
    assert row["intersect_est"] == 2
    assert row["only_a_est"] == 1
    assert row["only_b_est"] == 2


def test_kmv_set_ops_estimate_regime_python_replay(spark):
    """Full sketches → theta = smaller k-th minimum; estimates replay
    the strictly-below-theta integer arithmetic exactly."""
    k = 8
    a = spark.createDataFrame([(i,) for i in range(100)], "v long")
    b = spark.createDataFrame([(i,) for i in range(50, 200)], "v long")
    sa, sb = kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k)
    ha = sorted(r["kmv_hash"] for r in sa.collect())
    hb = sorted(r["kmv_hash"] for r in sb.collect())
    assert len(ha) == k and len(hb) == k
    theta = min(ha[-1], hb[-1])
    row = kmv_set_ops(sa, sb, k=k).collect()[0]
    assert row["theta_hash"] == theta
    sa_set, sb_set = set(ha), set(hb)
    below = {h for h in sa_set | sb_set if h < theta}
    den = theta + _KMV_SHIFT

    def est(cnt):
        return (cnt * (1 << 64)) // den

    assert row["union_est"] == est(len(below))
    assert row["intersect_est"] == est(len(below & sa_set & sb_set))
    assert row["only_a_est"] == est(len({h for h in below if h in sa_set and h not in sb_set}))
    assert row["only_b_est"] == est(len({h for h in below if h in sb_set and h not in sa_set}))
    # sanity: true |A∪B| = 200, |A∩B| = 50 — estimates in the ballpark
    assert 80 < row["union_est"] < 500
    with pytest.raises(ValueError, match="k must be"):
        kmv_set_ops(sa, sb, k=1)


def test_kmv_set_ops_empty_sketches(spark):
    """Two empty sketches still yield the single all-zero exact row an
    ANSI aggregate produces (a groupBy would drop it — the r13 edge
    fix); one empty side degrades to counting the other below its θ."""
    empty = spark.createDataFrame([], "v long")
    full = spark.createDataFrame([(i,) for i in (1, 2, 3)], "v long")
    k = 8
    se, sf_ = kmv_sketch(empty, "v", k=k), kmv_sketch(full, "v", k=k)
    row = kmv_set_ops(se, se, k=k).collect()[0]
    assert row["theta_hash"] is None
    assert (
        row["union_est"],
        row["intersect_est"],
        row["only_a_est"],
        row["only_b_est"],
    ) == (0, 0, 0, 0)
    row2 = kmv_set_ops(se, sf_, k=k).collect()[0]
    assert row2["theta_hash"] is None  # both under-full: exact regime
    assert row2["union_est"] == 3 and row2["only_b_est"] == 3
    assert row2["intersect_est"] == 0 and row2["only_a_est"] == 0


def test_kmv_set_ops_k_mismatch_raises(spark):
    a = spark.createDataFrame([(i,) for i in range(40)], "v long")
    sa = kmv_sketch(a, "v", k=16)
    sb = kmv_sketch(a, "v", k=16)
    with pytest.raises(Exception, match="more rows than"):
        kmv_set_ops(sa, sb, k=8).collect()


def test_pareto_frontier_hand_case_and_duplicates(spark):
    rows = [
        (1, 1, 9.0),   # frontier (max y at x=1, nothing above-right)
        (2, 3, 9.0),   # dominates row 1? x=3>1, y equal → yes, kills it
        (3, 3, 9.0),   # duplicate of row 2 — both kept
        (4, 5, 4.0),   # frontier
        (5, 5, 2.0),   # dominated by row 4 (same x, lower y)
        (6, 2, 8.0),   # dominated by rows 2/3
        (7, 6, 1.0),   # frontier (largest x)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    got = sorted(r["id"] for r in pareto_frontier(df, "x", "y").collect())
    assert got == [2, 3, 4, 7]


def test_pareto_frontier_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(20), float(rng.randrange(20)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    got = sorted(
        r["id"]
        for r in pareto_frontier(df, "x", "y", n_buckets=4).collect()
    )
    expect = sorted(
        i
        for i, x, y in rows
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for _, x2, y2 in rows
        )
    )
    assert got == expect


def test_pareto_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3, None), (3, 1, 1.0)],
        "id long, x int, y double",
    )
    got = [r["id"] for r in pareto_frontier(df, "x", "y").collect()]
    assert got == [3]


def test_bigram_collocations_hand_counts(spark):
    docs = [
        ("new york is big. new york never sleeps",),
        ("big data in new york",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = {
        (r["w1"], r["w2"]): (r["pair_count"], r["lift_ppm"])
        for r in bigram_collocations(df, "text", min_count=2).collect()
    }
    # tokens doc1: new york is big. new york never sleeps (8 words —
    # "big." keeps its period under whitespace tokenization)
    # tokens doc2: big data in new york (5 words)  → M = 13
    # bigrams: doc1 7, doc2 4 → N = 11
    # "new york": c_ab=3, c_new=3, c_york=3 → lift = 3·13²·1e6/(11·9)
    assert set(out) == {("new", "york")}
    c_ab, lift = out[("new", "york")]
    assert c_ab == 3
    assert lift == (3 * 13 * 13 * 10**6) // (11 * 3 * 3)
    with pytest.raises(ValueError, match="min_count"):
        bigram_collocations(df, "text", min_count=0)


def test_resample_interp_hand_case(spark):
    """Gap days interpolate linearly in micro-units with truncation
    toward zero on BOTH slopes; observed days copy floor(v*scale);
    multi-event days pick the (ts, order)-max representative; null
    values are not observations."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.resample import (
        resample_interp,
    )

    rows = [
        (1, "2024-01-01 08:00:00", 10.0, 1),
        (1, "2024-01-01 09:00:00", 12.0, 2),   # same-day winner (later ts)
        (1, "2024-01-04 00:00:00", 18.0, 3),   # up-slope gap of 2 days
        (1, "2024-01-06 00:00:00", 11.0, 4),   # down-slope gap of 1 day
        (1, "2024-01-05 12:00:00", None, 9),   # null: not an observation
        (2, "2024-02-01 00:00:00", 5.5, 1),    # single-obs key: 1 row
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "k long, ts string, v double, o long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        (r["k"], str(r["day"])[:10]): (
            r["value_interp_fp"],
            r["is_observed"],
        )
        for r in resample_interp(df, "k", "ts", "v", "o").collect()
    }
    M = 10**6
    # key 1: obs 12.0 @ d1, 18.0 @ d4, 11.0 @ d6
    assert out[(1, "2024-01-01")] == (12 * M, True)
    # gap d2: 12 + (18-12)*1 div 3 = 14; d3: 12 + 6*2 div 3 = 16
    assert out[(1, "2024-01-02")] == (14 * M, False)
    assert out[(1, "2024-01-03")] == (16 * M, False)
    assert out[(1, "2024-01-04")] == (18 * M, True)
    # down-slope gap d5: 18 + sign(-7)*(7*1 div 2) = 18 - 3.5M trunc
    assert out[(1, "2024-01-05")] == (18 * M - 3_500_000, False)
    assert out[(1, "2024-01-06")] == (11 * M, True)
    assert out[(2, "2024-02-01")] == (5_500_000, True)
    assert len(out) == 7
