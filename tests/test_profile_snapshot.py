"""Tests for table_profile, corpus_diff, and random_projection (r7)."""

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.profile import table_profile
from dataflow_flex_pyarrow_to_gds_spark.operators.snapshot import corpus_diff
from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
    random_projection,
)


def test_table_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b"), (None, "b")],
        "k long, v string",
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in table_profile(df, ["k", "v"]).collect()
    }
    assert got == {"k": (5, 1, 4), "v": (5, 1, 2)}


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, "doc_id", "text").collect()
    }
    # doc 1 unchanged (dropped by default); doc 5: null text on BOTH
    # sides must read as unchanged, not phantom added/removed
    assert got == {2: "changed", 3: "removed", 4: "added"}
    with_unchanged = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(
            old, new, "doc_id", "text", include_unchanged=True
        ).collect()
    }
    assert with_unchanged[1] == "unchanged"
    assert with_unchanged[5] == "unchanged"


def test_random_projection_linearity_and_determinism(spark):
    """The projection is a fixed linear map: proj(2x) = 2*proj(x)
    exactly (IEEE: doubling is exponent arithmetic), proj(0) = 0, and
    the seed changes the matrix."""
    base = [float(i % 7 - 3) for i in range(64)]
    df = spark.createDataFrame(
        [
            (1, base),
            (2, [2.0 * v for v in base]),
            (3, [0.0] * 64),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: [r[f"p{j}"] for j in range(16)]
        for r in random_projection(
            df, "vec_id", "embedding", 64, 16
        ).collect()
    }
    assert rows[3] == [0.0] * 16
    assert rows[2] == [2.0 * v for v in rows[1]]
    assert any(v != 0.0 for v in rows[1])  # non-trivial map
    reseeded = {
        r["vec_id"]: [r[f"p{j}"] for j in range(16)]
        for r in random_projection(
            df, "vec_id", "embedding", 64, 16, seed=99
        ).collect()
    }
    assert reseeded[1] != rows[1]


def test_contract_violations_counts_ppm_and_null_rule(spark):
    """Known violation counts, exact integer ppm, and the
    NULL-predicate-is-a-violation rule (a row the check cannot
    evaluate has not met the contract)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        contract_violations,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, None),
            (3, 0.0, "B"),
            (4, 2.0, "C"),
        ],
        "id long, price double, status string",
    )
    out = {
        r["rule"]: r
        for r in contract_violations(
            df,
            [
                ("nonpositive_price", F.col("price") <= 0),
                # NULL status -> NULL predicate -> counts as violation
                ("status_len_gate", F.length("status") > 99),
            ],
        ).collect()
    }
    assert out["nonpositive_price"]["n_rows"] == 4
    assert out["nonpositive_price"]["n_violations"] == 2
    assert out["nonpositive_price"]["violation_ppm"] == 500_000
    assert out["status_len_gate"]["n_violations"] == 1
    assert out["status_len_gate"]["violation_ppm"] == 250_000
    with _pytest.raises(ValueError):
        contract_violations(df, [])


def test_apply_corpus_delta_merge_semantics(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.snapshot import (
        apply_corpus_delta,
    )

    base = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(2, "two-v2", "upsert"), (3, None, "delete"), (9, "nine", "upsert")],
        "doc_id long, text string, op string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in apply_corpus_delta(base, delta).collect()
    }
    assert got == {1: "one", 2: "two-v2", 9: "nine"}


def test_apply_corpus_delta_guards(spark):
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.snapshot import (
        apply_corpus_delta,
    )

    base = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bad_cols = spark.createDataFrame(
        [(1, "upsert")], "doc_id long, op string"
    )
    with _pytest.raises(ValueError, match="columns"):
        apply_corpus_delta(base, bad_cols)
    bad_op = spark.createDataFrame(
        [(1, "x", "replace")], "doc_id long, text string, op string"
    )
    with _pytest.raises(ValueError, match="op must be"):
        apply_corpus_delta(base, bad_op)
    dup_ids = spark.createDataFrame(
        [(1, "a", "upsert"), (1, "b", "upsert")],
        "doc_id long, text string, op string",
    )
    with _pytest.raises(ValueError, match="unique"):
        apply_corpus_delta(base, dup_ids)


def test_apply_corpus_delta_roundtrips_corpus_diff(spark):
    """diff(base, apply(base, delta)) re-derives exactly the delta's
    intent — the two operators are inverse views of the same change."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.snapshot import (
        apply_corpus_delta,
        corpus_diff,
    )

    base = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(3, "t3-v2", "upsert"), (7, None, "delete"), (42, "new", "upsert")],
        "doc_id long, text string, op string",
    )
    merged = apply_corpus_delta(base, delta)
    statuses = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(base, merged, "doc_id", "text").collect()
    }
    assert statuses == {3: "changed", 7: "removed", 42: "added"}


def test_time_decayed_sum_exact_staircase(spark):
    """Hand-computed: whole-halflife staircase weights (shift per
    halflife), floor micro-units, future rows poison with NULL, and the
    >62-halflife tail contributes exactly 0."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        time_decayed_sum,
    )

    rows = [
        ("a", "2024-01-31 12:00:00", 10.0),   # age 1d  → k=0 → 10_000_000
        ("a", "2024-01-20 00:00:00", 10.0),   # age 12d → k=1 → 5_000_000
        ("a", "2020-01-01 00:00:00", 10.0),   # age ~1493d → k=213 > 62 → 0
        ("b", "2024-01-25 09:00:00", 0.015),  # floor(15000)>>1 = 7_500
    ]
    df = spark.createDataFrame(
        rows, "g string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["g"]: (r["decayed_sum_fp"], r["n_rows"])
        for r in time_decayed_sum(
            df, "ts", "value", ["g"], halflife_days=7,
            ref_date="2024-02-01",
        ).collect()
    }
    assert got["a"] == (15_000_000, 3)
    assert got["b"] == (7_500, 1)

    # a future event makes the group's sum NULL — never silently wrong
    fut = spark.createDataFrame(
        [("a", "2024-03-01 00:00:00", 1.0)], "g string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = time_decayed_sum(
        fut, "ts", "value", ["g"], halflife_days=7, ref_date="2024-02-01"
    ).collect()[0]
    assert out["decayed_sum_fp"] is None

    # r10 regression (the r9 judge's finding): a future row in a group
    # that ALSO has valid rows must still NULL the whole group — SQL SUM
    # skips per-row NULLs, so the poison must be a group-level flag, not
    # a NULL contribution. Under the old bug this returned 15_000_000.
    mixed = spark.createDataFrame(
        rows + [("a", "2024-03-01 00:00:00", 1.0)],
        "g string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got_mixed = {
        r["g"]: (r["decayed_sum_fp"], r["n_rows"])
        for r in time_decayed_sum(
            mixed, "ts", "value", ["g"], halflife_days=7,
            ref_date="2024-02-01",
        ).collect()
    }
    assert got_mixed["a"] == (None, 4)   # poisoned, count still honest
    assert got_mixed["b"] == (7_500, 1)  # untouched group unaffected

    # >62-halflife cap is load-bearing, not cosmetic: Java's shift is
    # mod-64, so an uncapped shiftright(micro, 245) would wrap to
    # shiftright(micro, 245 % 64 = 53) and contribute ~888 from this
    # row. micro = 8e12·1e6 = 8e18 ≈ 2^62.8 maximizes the wrap damage.
    ancient = spark.createDataFrame(
        [("c", "2023-06-01 00:00:00", 8.0e12),     # age 245d, k=245
         ("c", "2024-01-31 00:00:00", 1.0)],       # k=1 → 500_000
        "g string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out_c = time_decayed_sum(
        ancient, "ts", "value", ["g"], halflife_days=1,
        ref_date="2024-02-01",
    ).collect()[0]
    assert out_c["decayed_sum_fp"] == 500_000

    import pytest as _pytest

    with _pytest.raises(ValueError, match="halflife"):
        time_decayed_sum(
            df, "ts", "value", ["g"], halflife_days=0, ref_date="2024-02-01"
        )


def _phash(t: str) -> int:
    import hashlib

    hx = hashlib.md5(t.encode()).hexdigest()
    hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
    if hi >= 1 << 31:
        hi -= 1 << 32
    return hi * (1 << 32) + lo


def test_cms_sketch_python_replay_and_overestimate(spark):
    """The sketch replayed counter-for-counter in python, plus the CMS
    contract: every estimate >= the exact count, with equality when the
    width is collision-free for the value set."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        cms_estimate,
        cms_sketch,
    )

    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    depth, width, seed = 3, 8, 2
    sk = cms_sketch(df, "v", depth=depth, width=width, seed=seed)
    got = {(r["cms_row"], r["cms_bucket"]): r["cnt"] for r in sk.collect()}

    expect = {}
    for v in vals:
        for r in range(depth):
            b = _phash(f"{v}#{r}#{seed}") % width
            expect[(r, b)] = expect.get((r, b), 0) + 1
    assert got == expect, (got, expect)

    cands = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "v string"
    )
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(
            sk, cands, "v", depth=depth, width=width, seed=seed
        ).collect()
    }
    exact = {"a": 5, "b": 3, "c": 2, "d": 1}
    for v, e in exact.items():
        assert est[v] >= e, (v, est[v], e)  # the one-sided guarantee
    # a wide sketch is collision-free for 4 values: estimates exact
    sk2 = cms_sketch(df, "v", depth=depth, width=4096, seed=seed)
    est2 = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(
            sk2, cands, "v", depth=depth, width=4096, seed=seed
        ).collect()
    }
    assert est2 == exact, est2


def test_cms_sketch_mergeable_and_weighted(spark):
    """sketch(A) + sketch(B) summed on (row, bucket) == sketch(A ∪ B) —
    the property per-day incremental maintenance rides; weight_col
    counts mass, not rows."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        cms_sketch,
    )

    a = spark.createDataFrame([("x",), ("y",), ("x",)], "v string")
    b = spark.createDataFrame([("y",), ("z",)], "v string")
    merged = (
        cms_sketch(a, "v", depth=2, width=16, seed=1)
        .unionByName(cms_sketch(b, "v", depth=2, width=16, seed=1))
        .groupBy("cms_row", "cms_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(a.unionByName(b), "v", depth=2, width=16, seed=1)
    lhs = {(r["cms_row"], r["cms_bucket"]): r["cnt"] for r in merged.collect()}
    rhs = {(r["cms_row"], r["cms_bucket"]): r["cnt"] for r in whole.collect()}
    assert lhs == rhs

    w = spark.createDataFrame([("x", 10), ("x", 5)], "v string, n long")
    skw = cms_sketch(w, "v", depth=1, width=16, seed=1, weight_col="n")
    assert sorted(r["cnt"] for r in skw.collect()) == [15]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="depth"):
        cms_sketch(a, "v", depth=0)


def test_cms_estimate_zero_for_absent_and_empty_counters(spark):
    """ADVICE r11: the sketch stores only non-empty counters, so the
    estimate join must be left_outer with a zero fill — a candidate
    hashing into any empty counter gets the canonical CMS answer 0
    (an empty counter PROVES count = 0), and a candidate absent from
    every stored counter still gets an output row."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    depth, width, seed = 3, 4096, 7  # wide: no collisions among 2 vals
    sk = cms_sketch(df, "v", depth=depth, width=width, seed=seed)
    cands = spark.createDataFrame(
        [("a",), ("b",), ("never-seen",)], "v string"
    )
    est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(
            sk, cands, "v", depth=depth, width=width, seed=seed
        ).collect()
    }
    assert est == {"a": 2, "b": 1, "never-seen": 0}, est


def _bloom_py(vals, *, m_bits, k, seed):
    """Python twin of bloom_sketch: {word_idx: signed-int64 bits}."""
    words: dict[int, int] = {}
    for v in vals:
        for i in range(k):
            bit = _phash(f"{v}#{i}#{seed}") % m_bits
            w, p = bit // 64, bit % 64
            mask = -(1 << 63) if p == 63 else (1 << p)
            cur = words.get(w, 0)
            # signed-int64 OR: python ints are unbounded, so OR then
            # re-wrap the sign bit exactly like the JVM long does
            acc = (cur | mask) & ((1 << 64) - 1)
            if acc >= 1 << 63:
                acc -= 1 << 64
            words[w] = acc
    return words


def test_bloom_sketch_python_replay_and_no_false_negatives(spark):
    """The filter replayed word-for-word in python, plus the Bloom
    contract: EVERY inserted value probes maybe_present=true (no false
    negatives, the property decontamination rides), and a wide filter
    is collision-free for a small value set (absent values probe
    false)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_probe,
        bloom_sketch,
    )

    vals = ["a", "b", "c", "d", "a"]  # duplicate insert is a no-op
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    m_bits, k, seed = 256, 3, 7
    sk = bloom_sketch(df, "v", m_bits=m_bits, k=k, seed=seed)
    got = {r["bloom_word"]: r["bits"] for r in sk.collect()}
    assert got == _bloom_py(vals, m_bits=m_bits, k=k, seed=seed)

    cands = spark.createDataFrame(
        [(v,) for v in ["a", "b", "c", "d", "x", "y", "zebra"]],
        "v string",
    )
    probed = {
        r["v"]: r["maybe_present"]
        for r in bloom_probe(
            sk, cands, "v", m_bits=m_bits, k=k, seed=seed
        ).collect()
    }
    for v in ["a", "b", "c", "d"]:
        assert probed[v] is True, (v, probed)  # structural invariant
    # 4 values * 3 hashes in 4096 bits: fp odds ~(12/4096)^3 — these
    # specific absent probes are deterministic given the fixed hashes
    sk_wide = bloom_sketch(df, "v", m_bits=4096, k=k, seed=seed)
    probed_wide = {
        r["v"]: r["maybe_present"]
        for r in bloom_probe(
            sk_wide, cands, "v", m_bits=4096, k=k, seed=seed
        ).collect()
    }
    assert probed_wide == {
        "a": True, "b": True, "c": True, "d": True,
        "x": False, "y": False, "zebra": False,
    }, probed_wide


def test_bloom_sketch_merge_idempotent_and_grouped(spark):
    """OR-merge of per-part filters == single-pass filter bit-exactly,
    re-merging a part twice changes NOTHING (idempotence — the replay
    tolerance CMS lacks), and group_cols yields one independent filter
    per group."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_sketch,
    )

    df = spark.createDataFrame(
        [(i, f"u{i % 17}") for i in range(100)], "k long, v string"
    )
    m_bits, k, seed = 512, 4, 1
    single = {
        r["bloom_word"]: r["bits"]
        for r in bloom_sketch(
            df, "v", m_bits=m_bits, k=k, seed=seed
        ).collect()
    }
    a = bloom_sketch(
        df.filter(F.col("k") % 2 == 0), "v", m_bits=m_bits, k=k, seed=seed
    )
    b = bloom_sketch(
        df.filter(F.col("k") % 2 == 1), "v", m_bits=m_bits, k=k, seed=seed
    )
    merged = {
        r["bloom_word"]: r["bits"]
        for r in a.unionByName(b)
        .groupBy("bloom_word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    assert merged == single
    # idempotence: replaying part b into the union is a no-op
    remerged = {
        r["bloom_word"]: r["bits"]
        for r in a.unionByName(b).unionByName(b)
        .groupBy("bloom_word")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    assert remerged == single
    # grouped: each group's filter equals the filter of its slice
    g = bloom_sketch(
        df.withColumn("grp", F.col("k") % 2),
        "v",
        m_bits=m_bits,
        k=k,
        seed=seed,
        group_cols=("grp",),
    )
    got0 = {
        r["bloom_word"]: r["bits"]
        for r in g.filter(F.col("grp") == 0).collect()
    }
    exp0 = {r["bloom_word"]: r["bits"] for r in a.collect()}
    assert got0 == exp0


def test_bloom_validation_and_missing_word_is_absent(spark):
    """Bad geometry raises; a candidate whose words are all absent from
    the sketch (sparse store) must read absent via the zero-fill, not
    error or drop."""
    import pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_probe,
        bloom_sketch,
    )

    df = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_sketch(df, "v", m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom_sketch(df, "v", k=0)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_probe(df, df, "v", m_bits=100)
    sk = bloom_sketch(df, "v", m_bits=65536, k=2, seed=0)
    cands = spark.createDataFrame([("nope",), ("a",)], "v string")
    got = {
        r["v"]: r["maybe_present"]
        for r in bloom_probe(sk, cands, "v", m_bits=65536, k=2, seed=0)
        .collect()
    }
    assert got == {"a": True, "nope": False}


def test_bloom_no_false_negatives_randomized(spark):
    """Generative sweep of the structural invariant: across random
    value sets, geometries, and seeds, EVERY inserted value probes
    maybe_present=true — one Spark job per config, python-twin checked
    word-for-word so a miss localizes to build vs probe."""
    import random

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_probe,
        bloom_sketch,
    )

    rng = random.Random(99)
    for trial in range(4):
        n_vals = rng.randrange(5, 60)
        vals = [
            "v" + str(rng.randrange(10**9)) for _ in range(n_vals)
        ]
        m_bits = 64 * rng.randrange(1, 9)
        k = rng.randrange(1, 6)
        seed = rng.randrange(100)
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        sk = bloom_sketch(df, "v", m_bits=m_bits, k=k, seed=seed)
        got = {r["bloom_word"]: r["bits"] for r in sk.collect()}
        assert got == _bloom_py(vals, m_bits=m_bits, k=k, seed=seed), (
            trial, m_bits, k, seed,
        )
        probed = {
            r["v"]: r["maybe_present"]
            for r in bloom_probe(
                sk, df.distinct(), "v", m_bits=m_bits, k=k, seed=seed
            ).collect()
        }
        assert all(probed[v] for v in set(vals)), (trial, probed)


def test_exact_quantiles_python_replay_and_narrowing(spark):
    """Order statistics match python's sorted()[rank-1] exactly for
    edge and interior q, with local_threshold forced tiny so the
    range-narrowing loop (not the local fallback) produces the answer;
    the all-equal fast path and the guards fail loud."""
    import random

    import pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles,
    )

    rng = random.Random(5)
    vals = [rng.randrange(0, 10_000) for _ in range(5_000)] + [None] * 7
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    clean = sorted(v for v in vals if v is not None)
    n = len(clean)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["quantile"]: (r["rank"], r["value"])
        for r in exact_quantiles(
            df, "x", qs, n_buckets=8, local_threshold=50
        ).collect()
    }
    for q in qs:
        rank = int((n - 1) * q) + 1
        assert got[q] == (rank, clean[rank - 1]), (q, got[q])

    ones = spark.createDataFrame([(7,)] * 100, "x long")
    got1 = exact_quantiles(
        ones, "x", [0.5], n_buckets=4, local_threshold=10
    ).collect()[0]
    assert (got1["rank"], got1["value"]) == (50, 7)

    with pytest.raises(ValueError, match="no quantiles"):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(df, "x", [1.5])
    nulls = spark.createDataFrame([(None,)], "x long")
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(nulls, "x", [0.5])


def test_kmv_sketch_python_replay_and_grouped(spark):
    """The bottom-k sketch replayed hash-for-hash in python (rank,
    order, and the distinct-before-rank), globally and per group."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_sketch,
    )

    vals = [("g1", f"v{i % 7}") for i in range(30)] + [
        ("g2", f"w{i}") for i in range(3)
    ]
    df = spark.createDataFrame(vals, "g string, v string")
    k, seed = 4, 5
    got = [
        (r["g"], r["kmv_pos"], r["kmv_hash"])
        for r in kmv_sketch(
            df, "v", k=k, seed=seed, group_cols=("g",)
        ).collect()
    ]

    expect = []
    for g, pool in (
        ("g1", {f"v{i % 7}" for i in range(30)}),
        ("g2", {f"w{i}" for i in range(3)}),
    ):
        hs = sorted({_phash(f"{v}#{seed}") for v in pool})[:k]
        expect += [(g, i + 1, h) for i, h in enumerate(hs)]
    assert sorted(got) == sorted(expect), (got, expect)

    # global (no group): same replay
    got_g = [
        (r["kmv_pos"], r["kmv_hash"])
        for r in kmv_sketch(df, "v", k=k, seed=seed).collect()
    ]
    all_h = sorted(
        {_phash(f"{v}#{seed}") for _, v in vals}
    )[:k]
    assert sorted(got_g) == [(i + 1, h) for i, h in enumerate(all_h)]


def test_kmv_estimate_regimes_and_python_replay(spark):
    """Below k distinct the estimate is EXACT (= distinct count seen);
    at/above k the integer estimator replays in python to the digit and
    lands within the ~2/sqrt(k) KMV error band on a 1000-distinct
    stream."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_estimate,
        kmv_sketch,
    )

    k, seed = 64, 0
    small = spark.createDataFrame(
        [(f"s{i}",) for i in range(10)], "v string"
    )
    est = kmv_estimate(
        kmv_sketch(small, "v", k=k, seed=seed), k=k
    ).collect()[0]
    assert est["est_distinct"] == 10  # exact regime
    assert est["kmv_k"] == k

    big = spark.createDataFrame(
        [(f"b{i}",) for i in range(1000)], "v string"
    )
    got = kmv_estimate(
        kmv_sketch(big, "v", k=k, seed=seed), k=k
    ).collect()[0]
    hs = sorted({_phash(f"b{i}#{seed}") for i in range(1000)})
    kth = hs[k - 1]
    expect = ((k - 1) * (1 << 64)) // (kth + (1 << 63) + 1)
    assert got["kth_hash"] == kth
    assert got["est_distinct"] == expect  # integer replay, bit-exact
    assert abs(expect - 1000) / 1000 <= 2 / (k ** 0.5), expect


def test_kmv_merge_is_min_of_mins_and_idempotent(spark):
    """bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B), and
    re-merging a duplicated partial changes nothing — the
    associative/commutative/idempotent algebra the KMV store rides."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_sketch,
    )

    import pytest as _pytest

    a = spark.createDataFrame([(f"x{i}",) for i in range(200)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(100, 300)], "v string"  # overlap
    )
    k = 16
    sa, sb = kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k)
    # merging = distinct + re-bottom-k on the RAW hashes (no re-hash);
    # sa appears twice = an at-least-once replay, dropped by the distinct
    from pyspark.sql.window import Window

    w = Window.orderBy(F.asc("kmv_hash"))
    merged = (
        sa.unionByName(sb).unionByName(sa)
        .select("kmv_hash")
        .distinct()
        .select("kmv_hash", F.row_number().over(w).alias("kmv_pos"))
        .filter(F.col("kmv_pos") <= k)
    )
    single = kmv_sketch(a.unionByName(b), "v", k=k)
    got = {(r["kmv_pos"], r["kmv_hash"]) for r in merged.collect()}
    want = {(r["kmv_pos"], r["kmv_hash"]) for r in single.collect()}
    assert got == want

    with _pytest.raises(ValueError, match="k must be"):
        kmv_sketch(a, "v", k=0)
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_estimate,
    )

    with _pytest.raises(ValueError, match="k must be"):
        kmv_estimate(sa, k=1)


def test_scale_properties_hand_computed_and_degenerate(spark):
    """The three exact scalers replayed by hand — negatives truncate
    toward zero through the sign split, a constant column yields 0
    (the GDS zero-variance convention), and max scales against |max|."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        scale_properties,
    )

    rows = [(1, -200), (2, 0), (3, 100), (4, 600)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: (r["minmax_ppm"], r["mean_ppm"], r["max_ppm"])
        for r in scale_properties(df, "id", "v").collect()
    }
    mn, mx, s, n = -200, 600, 500, 4
    for i, v in rows:
        minmax = (abs(v - mn) * 10**6) // (mx - mn)
        if v - mn < 0:
            minmax = -minmax
        num = v * n - s
        mean = (abs(num) * 10**6) // ((mx - mn) * n)
        if num < 0:
            mean = -mean
        mxs = (abs(v) * 10**6) // abs(mx)
        if v < 0:
            mxs = -mxs
        assert got[i] == (minmax, mean, mxs), (i, got[i])
    # spot values: minmax spans exactly [0, 1e6]
    assert got[1][0] == 0 and got[4][0] == 10**6
    # constant column: both range scalers 0, max scaler x/|x| = 1e6
    const = spark.createDataFrame([(1, 7), (2, 7)], "id long, v long")
    for r in scale_properties(const, "id", "v").collect():
        assert (r["minmax_ppm"], r["mean_ppm"], r["max_ppm"]) == (
            0, 0, 10**6,
        )
    # ADVICE r12: GDS's Max scaler divides by max(|x|), not |max(x)| —
    # an all-negative column (|min| > max) must land in [-1e6, 0], not
    # overshoot past -1e6 the way an abs(max)=100 divisor would
    neg = spark.createDataFrame(
        [(1, -500), (2, -100), (3, -250)], "id long, v long"
    )
    got_neg = {
        r["id"]: r["max_ppm"] for r in scale_properties(neg, "id", "v").collect()
    }
    assert got_neg == {1: -(10**6), 2: -200_000, 3: -500_000}
    assert all(-(10**6) <= v <= 0 for v in got_neg.values())


def test_drift_buckets_hand_computed_and_guards(spark):
    """Drift table replayed by hand: bucket hashes, exact chi-square
    terms (floor-quantized per bucket), ppm proportion gaps; identical
    distributions yield all-zero terms; an empty side raises loud."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        drift_buckets,
    )

    a_vals = ["x"] * 6 + ["y"] * 2
    b_vals = ["x"] * 2 + ["y"] * 6
    a = spark.createDataFrame([(v,) for v in a_vals], "v string")
    b = spark.createDataFrame([(v,) for v in b_vals], "v string")
    nb_, seed, scale = 8, 3, 10**6
    got = {
        r["bucket"]: (r["o_a"], r["o_b"], r["chi2_term_fp"],
                      r["p_diff_ppm"])
        for r in drift_buckets(
            a, b, "v", n_buckets=nb_, seed=seed, scale=scale
        ).collect()
    }

    expect = {}
    cnt = {}
    for v in a_vals:
        k = _phash(f"{v}#{seed}") % nb_
        cnt.setdefault(k, [0, 0])[0] += 1
    for v in b_vals:
        k = _phash(f"{v}#{seed}") % nb_
        cnt.setdefault(k, [0, 0])[1] += 1
    na = sum(o[0] for o in cnt.values())
    nbt = sum(o[1] for o in cnt.values())
    for k, (oa, ob) in cnt.items():
        num = oa * nbt - ob * na
        chi = (num * num * scale) // (na * nbt * (oa + ob))
        pd = oa * 10**6 // na - ob * 10**6 // nbt
        expect[k] = (oa, ob, chi, pd)
    assert got == expect, (got, expect)
    # drift actually registered (x and y land in different buckets
    # with these counts — if they collided the test fixture is wrong)
    assert len(got) == 2 and any(t[2] > 0 for t in got.values())

    # identical distributions: every term and every gap exactly 0
    same = {
        r["bucket"]: (r["chi2_term_fp"], r["p_diff_ppm"])
        for r in drift_buckets(a, a, "v", n_buckets=nb_, seed=seed).collect()
    }
    assert all(t == (0, 0) for t in same.values())

    empty = spark.createDataFrame([], "v string")
    with _pytest.raises(Exception, match="side is empty"):
        drift_buckets(a, empty, "v", n_buckets=nb_).collect()
    with _pytest.raises(ValueError, match="n_buckets"):
        drift_buckets(a, b, "v", n_buckets=1)


def test_value_histogram_hand_computed_and_degenerate(spark):
    """Edges and counts by hand: max lands in the last bucket with no
    special case (the +1 width), every value falls inside its bucket's
    inclusive [lo, hi] range, bucket ranges tile without overlap, and
    a constant column degenerates to one bucket."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        value_histogram,
    )

    vals = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 10, 10]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    nb = 4
    got = {
        r["bucket"]: (r["lo_fp"], r["hi_fp"], r["cnt"])
        for r in value_histogram(df, "x", n_buckets=nb).collect()
    }
    mn, mx = 0, 10
    width = mx - mn + 1
    expect = {}
    for v in vals:
        b = (v - mn) * nb // width
        lo = mn + (b * width + nb - 1) // nb
        hi = mn + ((b + 1) * width + nb - 1) // nb - 1
        assert lo <= v <= hi, (v, b, lo, hi)
        k = expect.setdefault(b, [lo, hi, 0])
        k[2] += 1
    assert got == {b: tuple(v) for b, v in expect.items()}
    # ranges tile [mn, mx] without gaps or overlap
    edges = sorted(got.values())
    for (l1, h1, _), (l2, h2, _) in zip(edges, edges[1:]):
        assert h1 + 1 == l2, (h1, l2)
    assert edges[0][0] == mn and edges[-1][1] >= mx

    const = spark.createDataFrame([(7,), (7,), (7,)], "x long")
    crow = value_histogram(const, "x", n_buckets=8).collect()
    assert len(crow) == 1 and crow[0]["cnt"] == 3
    assert crow[0]["lo_fp"] <= 7 <= crow[0]["hi_fp"]
    with _pytest.raises(ValueError, match="n_buckets"):
        value_histogram(df, "x", n_buckets=0)


def test_robust_outliers_hand_computed_and_mad_zero(spark):
    """Median/MAD flags replay by hand (type-1 lower medians), the
    z-gate is strict (> not >=), and the MAD=0 majority-constant column
    flags exactly the non-median values — the documented estimator
    behavior."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        robust_outliers,
    )

    # values: median 10 (type-1 on 9 rows = rank 5), devs
    # [0,0,0,1,1,2,2,30,90] -> MAD = dev rank 5 = 1
    vals = [10, 10, 10, 9, 11, 8, 12, 40, 100]
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    got = {
        r["id"]: (r["v"], r["dev"])
        for r in robust_outliers(df, "id", "v", z_num=3, z_den=1).collect()
    }
    # flagged: dev > 3*1 -> the 40 (dev 30) and 100 (dev 90) only
    assert set(got) == {7, 8}
    assert got[7] == (40.0, 30.0) and got[8] == (100.0, 90.0)

    # strictness: dev == z*MAD is NOT flagged
    strict = {
        r["id"]
        for r in robust_outliers(
            df, "id", "v", z_num=30, z_den=1
        ).collect()
    }
    assert strict == {8}  # dev 30 == 30*1 stays; 90 > 30 flags

    # MAD = 0: majority-constant column flags every non-median value
    const = spark.createDataFrame(
        [(i, 5.0) for i in range(6)] + [(9, 5.5)], "id long, v double"
    )
    flagged = {
        r["id"] for r in robust_outliers(const, "id", "v").collect()
    }
    assert flagged == {9}
    with _pytest.raises(ValueError, match="z_num"):
        robust_outliers(df, "id", "v", z_num=-1)


def test_exact_weighted_quantiles_python_replay_and_paths(spark):
    """Weighted type-1 statistics replayed against an explicit
    weight-expansion, through BOTH the bounded finish and the
    narrowing path (threshold forced below the input), plus the heavy
    single-value fast path and the positive-weight guard."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_weighted_quantiles,
    )

    rows = [(10.0, 1), (20.0, 3), (30.0, 2), (5.0, 4)]
    df = spark.createDataFrame(rows, "x double, w long")
    expanded = sorted(
        [x for x, w in rows for _ in range(w)]
    )  # the multiset the weights stand for
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    for local_threshold in (100, 2):  # bounded finish, then narrowing
        got = {
            r["quantile"]: (r["rank"], r["value"])
            for r in exact_weighted_quantiles(
                df, "x", "w", qs, local_threshold=local_threshold,
                n_buckets=4, max_rounds=12,
            ).collect()
        }
        for q in qs:
            rank = int((len(expanded) - 1) * q) + 1
            assert got[q] == (rank, expanded[rank - 1]), (
                local_threshold, q, got[q],
            )

    # one heavy value dominating every rank: the can't-split fast path
    heavy = spark.createDataFrame(
        [(7.0, 1000), (1.0, 1), (9.0, 1)], "x double, w long"
    )
    out = {
        r["quantile"]: r["value"]
        for r in exact_weighted_quantiles(
            heavy, "x", "w", [0.5], local_threshold=1, n_buckets=4,
        ).collect()
    }
    assert out[0.5] == 7.0

    bad = spark.createDataFrame([(1.0, 0)], "x double, w long")
    with _pytest.raises(ValueError, match="positive"):
        exact_weighted_quantiles(bad, "x", "w", [0.5])
    with _pytest.raises(ValueError, match="no quantiles"):
        exact_weighted_quantiles(df, "x", "w", [])


def test_new_operator_null_and_contract_guards(spark):
    """The r12 edge contracts, exercised: nulls are invisible to the
    KMV sketch / histogram / scalers / drift buckets (concat_ws and
    ANSI concat disagree about null hashing — the one cross-engine
    divergence, so nulls are defined away on both sides), and
    kmv_estimate raises on a sketch larger than its k instead of
    silently mis-estimating."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        drift_buckets,
        kmv_estimate,
        kmv_sketch,
        scale_properties,
        value_histogram,
    )

    withnull = spark.createDataFrame(
        [("a",), (None,), ("b",), ("a",)], "v string"
    )
    nonull = withnull.filter(F.col("v").isNotNull())
    assert sorted(
        r["kmv_hash"] for r in kmv_sketch(withnull, "v", k=8).collect()
    ) == sorted(
        r["kmv_hash"] for r in kmv_sketch(nonull, "v", k=8).collect()
    )

    ints = spark.createDataFrame(
        [(1, 5), (2, None), (3, 9)], "id long, x long"
    )
    hist = value_histogram(ints.select("x"), "x", n_buckets=4).collect()
    assert sum(r["cnt"] for r in hist) == 2  # the null never buckets
    scaled = scale_properties(ints, "id", "x").collect()
    assert {r["id"] for r in scaled} == {1, 3}

    d = {
        r["bucket"]: (r["o_a"], r["o_b"])
        for r in drift_buckets(withnull, nonull, "v", n_buckets=8).collect()
    }
    assert sum(oa for oa, _ in d.values()) == 3  # null dropped side a

    three = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "v string"
    )
    sk = kmv_sketch(three, "v", k=8)  # holds 3 rows
    with _pytest.raises(Exception, match="more rows than k"):
        kmv_estimate(sk, k=2).collect()


def test_interval_overlap_reversed_interval_raises(spark):
    """end < start is a contract violation, not a quiet mis-join."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 10, 5)], "lid long, ls long, le long"  # reversed
    )
    right = spark.createDataFrame(
        [(2, 0, 100)], "rid long, rs long, re long"
    )
    with _pytest.raises(Exception, match="end < start"):
        interval_overlap_join(
            left, right,
            left_id="lid", left_start="ls", left_end="le",
            right_id="rid", right_start="rs", right_end="re",
        ).collect()


def test_exact_quantiles_grouped_python_replay_and_guards(spark):
    """Per-group batched narrowing (r13): every (group, q) rank matches
    the brute-force per-group sorted()[rank-1] with narrowing FORCED
    (threshold below the group sizes); guards raise loudly."""
    import random

    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles_grouped,
    )

    rng = random.Random(11)
    rows = [
        (rng.choice("abc"), float(rng.randrange(500)))
        for _ in range(3000)
    ] + [("solo", 42.0)]  # a 1-row group hits the immediate finish
    df = spark.createDataFrame(rows, "g string, v double")
    got = exact_quantiles_grouped(
        df, "g", "v", [0.25, 0.5, 0.9], local_threshold=150
    ).collect()
    assert len(got) == 4 * 3
    from collections import defaultdict

    by = defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    for r in got:
        vs = sorted(by[r["g"]])
        rank = int((len(vs) - 1) * r["quantile"]) + 1
        assert r["rank"] == rank, r
        assert r["value"] == vs[rank - 1], r
    with _pytest.raises(ValueError, match="max_groups"):
        exact_quantiles_grouped(df, "g", "v", [0.5], max_groups=2)
    with _pytest.raises(ValueError, match="no quantiles"):
        exact_quantiles_grouped(df, "g", "v", [])
    with _pytest.raises(ValueError, match="outside"):
        exact_quantiles_grouped(df, "g", "v", [1.5])


def test_exact_weighted_quantiles_grouped_replay_and_guards(spark):
    """Group × weight composition (r13): each (group, q) value equals
    the brute-force weight-expanded per-group order statistic with
    narrowing forced; shared weight contract raises loudly."""
    import random

    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_weighted_quantiles_grouped,
    )

    rng = random.Random(5)
    rows = [
        (rng.choice("xy"), float(rng.randrange(300)), rng.randrange(1, 6))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = exact_weighted_quantiles_grouped(
        df, "g", "v", "w", [0.5, 0.9], local_threshold=100
    ).collect()
    assert len(got) == 2 * 2
    from collections import defaultdict

    by = defaultdict(list)
    for g, v, w in rows:
        by[g].extend([v] * w)  # explicit weight expansion
    for r in got:
        vs = sorted(by[r["g"]])
        rank = int((len(vs) - 1) * r["quantile"]) + 1
        assert r["rank"] == rank, r
        assert r["value"] == vs[rank - 1], r
    bad = spark.createDataFrame(
        [("x", 1.0, 0)], "g string, v double, w long"
    )
    with _pytest.raises(ValueError, match="positive"):
        exact_weighted_quantiles_grouped(bad, "g", "v", "w", [0.5])
    with _pytest.raises(ValueError, match="max_groups"):
        exact_weighted_quantiles_grouped(
            df, "g", "v", "w", [0.5], max_groups=1
        )
