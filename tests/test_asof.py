"""As-of and range join operators."""

from pyspark.sql import functions as F


def _ts(s):
    return F.lit(s).cast("timestamp")


def test_asof_join_semantics(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 7, "2024-01-01 10:00:00"),
            (2, 7, "2024-01-01 12:00:00"),
            (3, 8, "2024-01-01 10:00:00"),  # user with no clicks at all
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (100, 7, "2024-01-01 09:30:00"),
            (101, 7, "2024-01-01 11:59:00"),
            (102, 7, "2024-01-01 12:00:00"),  # tie: <= matches
            (103, 7, "2024-01-01 13:00:00"),  # future: never matches
        ],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left, right, on="ts", by="user_id", right_cols=["event_id"]
        ).collect()
    }
    assert out[1] == 100  # latest ≤ 10:00 is 09:30
    assert out[2] == 102  # equal timestamps match (>= semantics)
    assert out[3] is None  # no prior right row → left outer null


def test_asof_join_preserves_left_rowcount(spark, sf_dir):
    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join
    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import read_events

    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(purchases, clicks, on="ts", by="user_id", right_cols=["event_id"])
    assert out.count() == purchases.count()  # exactly one row per left row


def test_range_join(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-02-15 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 00:00:00", "2024-01-10 00:00:00"),  # contains id 1
            (11, "2024-01-04 00:00:00", "2024-03-01 00:00:00"),  # contains both
            (12, "2024-03-05 00:00:00", "2024-03-06 00:00:00"),  # contains none
        ],
        "rid long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp")).withColumn(
        "end", F.col("end").cast("timestamp")
    )
    out = range_join(
        left, right, left_ts="ts", right_start="start", right_end="end",
        bucket_seconds=7 * 86_400,
    )
    pairs = sorted((r["id"], r["rid"]) for r in out.collect())
    assert pairs == [(1, 10), (1, 11), (2, 11)]


def test_range_join_bucket_boundary(spark):
    """Intervals spanning many buckets still match (explode covers all)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, "2024-06-01 00:00:00")], "id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(20, "2024-01-01 00:00:00", "2024-12-31 00:00:00")],
        "rid long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp")).withColumn(
        "end", F.col("end").cast("timestamp")
    )
    out = range_join(
        left, right, left_ts="ts", right_start="start", right_end="end",
        bucket_seconds=86_400,  # 365 buckets exploded on the right
    )
    assert [(r["id"], r["rid"]) for r in out.collect()] == [(1, 20)]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check: random data vs pandas merge_asof (the reference
    implementation of as-of semantics)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 200
    left_pd = pd.DataFrame({
        "event_id": np.arange(n_l),
        "user_id": rng.integers(0, 10, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
    })
    right_pd = pd.DataFrame({
        "event_id": np.arange(1000, 1000 + n_r),
        "user_id": rng.integers(0, 10, n_r),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
    })
    # merge_asof needs global ts sort; ties must be unique per key for a
    # deterministic comparison
    right_pd = right_pd.drop_duplicates(subset=["user_id", "ts"])
    left_sorted = left_pd.sort_values("ts", kind="stable")
    right_sorted = right_pd.sort_values("ts", kind="stable")
    expect = pd.merge_asof(
        left_sorted, right_sorted, on="ts", by="user_id",
        direction="backward", suffixes=("", "_r"),
    )
    expect_map = {
        int(r.event_id): (None if pd.isna(r.event_id_r) else int(r.event_id_r))
        for r in expect.itertuples()
    }

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    got = {
        r["event_id"]: r["event_id_asof"]
        for r in asof_join(
            left, right, on="ts", by="user_id", right_cols=["event_id"]
        ).collect()
    }
    assert got == expect_map


def test_asof_join_null_right_columns_stay_together(spark):
    """All output columns must come from the SAME matched right row: a
    null field in the latest right row must NOT be back-filled from an
    older right row (ADVICE r01 — per-column fills mixed rows)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 50, 7.0, "old"), (1, 150, None, "new")],
        "k long, ts long, price double, tag string",
    )
    out = {
        r["ts"]: (r["price_asof"], r["tag_asof"])
        for r in asof_join(
            left, right, on="ts", by="k", right_cols=["price", "tag"]
        ).collect()
    }
    # ts=100 matches the ts=50 row wholesale
    assert out[100] == (7.0, "old")
    # ts=200 matches the ts=150 row: price is GENUINELY null there and
    # must stay null (not resurrect 7.0 from ts=50)
    assert out[200] == (None, "new")


def test_range_join_inverted_interval_dropped(spark):
    """end < start can never match; the guard must drop it before bucket
    fan-out instead of generating a descending bucket sequence."""
    from datetime import datetime

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import range_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 2))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1), datetime(2024, 1, 3)),   # valid, matches
            (11, datetime(2024, 1, 5), datetime(2024, 1, 1)),   # inverted
        ],
        "rid long, start timestamp, end timestamp",
    )
    rows = range_join(
        left, right, left_ts="ts", right_start="start", right_end="end"
    ).collect()
    assert [r["rid"] for r in rows] == [10]


def test_asof_directions_match_pandas_merge_asof(spark):
    """backward/forward/nearest must agree with pd.merge_asof on random
    integer keys (the operator's semantic contract)."""
    import random

    import pandas as pd

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join

    rng = random.Random(11)
    left_rows = [(rng.randrange(3), rng.randrange(1000), i) for i in range(200)]
    right_rows = [(rng.randrange(3), rng.randrange(1000), 100 + i) for i in range(80)]
    lpdf = pd.DataFrame(left_rows, columns=["k", "t", "lid"]).sort_values("t")
    rpdf = (
        pd.DataFrame(right_rows, columns=["k", "t", "rid"])
        .sort_values(["t", "rid"])
        .drop_duplicates(subset=["k", "t"], keep="first")  # unique (k,t)
        .sort_values("t")
    )
    ldf = spark.createDataFrame(lpdf, "k long, t long, lid long")
    rdf = spark.createDataFrame(rpdf, "k long, t long, rid long")

    for direction in ("backward", "forward", "nearest"):
        want = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction=direction, suffixes=("", "_r")
        )
        want_map = dict(zip(want["lid"], want["rid"].astype("Int64")))
        got = asof_join(
            ldf, rdf, on="t", by="k", right_cols=["rid"], direction=direction
        ).collect()
        got_map = {r["lid"]: r["rid_asof"] for r in got}
        for lid, w in want_map.items():
            g = got_map[lid]
            assert (pd.isna(w) and g is None) or g == w, (
                f"{direction} lid={lid}: want {w} got {g}"
            )


def test_asof_join_directions_match_pandas_generative(spark):
    """Property test: all three directions vs pd.merge_asof on random
    data, pinning the boundary rules — equal left/right timestamps
    (backward and forward both match at distance 0), by-groups with no
    right rows at all (left-outer nulls), and nearest-ties at equal
    distance (pandas resolves to backward). Right timestamps are unique
    per group: with duplicates, which co-timed row wins is positional in
    pandas and unspecified in a distributed engine — not a semantic."""
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import asof_join

    left_rows = st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20)),
        min_size=1,
        max_size=12,
    )
    right_groups = st.dictionaries(
        st.integers(0, 3),
        st.sets(st.integers(0, 20), min_size=0, max_size=8),
        max_size=4,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(left_rows=left_rows, right_groups=right_groups)
    def check(left_rows, right_groups):
        left = [
            (i, by, ts) for i, (by, ts) in enumerate(left_rows)
        ]
        right = [
            (by * 10_000 + ts, by, ts, by * 1000 + ts)
            for by, tss in right_groups.items()
            for ts in tss
        ]
        lpdf = pd.DataFrame(left, columns=["lid", "uid", "ts"]).astype("int64")
        rpdf = pd.DataFrame(right, columns=["rid", "uid", "ts", "payload"]).astype(
            "int64"
        )
        ldf = spark.createDataFrame(lpdf, "lid long, uid long, ts long")
        rdf = (
            spark.createDataFrame(rpdf, "rid long, uid long, ts long, payload long")
            if right
            else spark.createDataFrame([], "rid long, uid long, ts long, payload long")
        )
        for direction in ("backward", "forward", "nearest"):
            got = {
                r["lid"]: (r["rid_asof"], r["payload_asof"])
                for r in asof_join(
                    ldf,
                    rdf,
                    on="ts",
                    by="uid",
                    right_cols=["rid", "payload"],
                    direction=direction,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpdf.sort_values(["ts", "lid"], kind="stable"),
                rpdf.sort_values("ts", kind="stable"),
                on="ts",
                by="uid",
                direction=direction,
                suffixes=("", "_r"),
            )
            exp = {
                int(r.lid): (
                    None if pd.isna(r.rid) else int(r.rid),
                    None if pd.isna(r.payload) else int(r.payload),
                )
                for r in exp_df.itertuples()
            }
            assert got == exp, (direction, got, exp, left, right)

    check()


def test_interval_overlap_join_hand_and_once_only(spark):
    """Overlap pairs by hand: touching endpoints count (closed
    ranges), disjoint pairs don't, intersection bounds are exact, and
    a pair spanning MANY shared blocks is emitted exactly once (the
    first-shared-block filter, not a distinct); keys partition the
    candidate space."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [("k1", 100, 0, 100), ("k1", 101, 50, 60), ("k2", 102, 0, 10)],
        "g string, lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            ("k1", 200, 60, 70),    # touches 101 at 60; inside 100
            ("k1", 201, 101, 110),  # disjoint from 100 (ends at 100)
            ("k2", 202, 10, 20),    # touches 102 at 10
            ("k1", 203, 5, 6),      # inside 100 only
        ],
        "g string, rid long, rs long, re long",
    )
    got = {
        (r["g"], r["lid"], r["rid"]): (
            r["overlap_start"], r["overlap_end"]
        )
        for r in interval_overlap_join(
            left, right,
            left_id="lid", left_start="ls", left_end="le",
            right_id="rid", right_start="rs", right_end="re",
            keys=("g",), bucket=7,
        ).collect()
    }
    assert got == {
        ("k1", 100, 200): (60, 70),
        ("k1", 101, 200): (60, 60),
        ("k2", 102, 202): (10, 10),
        ("k1", 100, 203): (5, 6),
    }
    # exactly-once even when the overlap spans many blocks: collect()
    # above already proves no duplicates (dict build would hide them),
    # so assert on the raw row count too
    n = interval_overlap_join(
        left, right,
        left_id="lid", left_start="ls", left_end="le",
        right_id="rid", right_start="rs", right_end="re",
        keys=("g",), bucket=2,  # tiny blocks: 100-wide span = 50 blocks
    ).count()
    assert n == 4
    with _pytest.raises(ValueError, match="bucket"):
        interval_overlap_join(
            left, right,
            left_id="lid", left_start="ls", left_end="le",
            right_id="rid", right_start="rs", right_end="re",
            bucket=0,
        )
