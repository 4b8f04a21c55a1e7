"""Deterministic sampling: per-group caps and hash-mod subsamples."""

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_of_id_col,
)


def test_cap_per_group_sizes_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = cap_per_group(docs, "source", "doc_id", cap=5)
    sizes = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in sizes.items():
        assert n == min(5, full[src])
    # determinism: same survivors under a different partitioning
    again = cap_per_group(docs.repartition(13), "source", "doc_id", cap=5)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_cap_per_group_picks_lowest_hashes(spark):
    df = spark.createDataFrame(
        [(i, "g") for i in range(20)], "doc_id long, source string"
    )
    capped = cap_per_group(df, "source", "doc_id", cap=3)
    got = {r["doc_id"] for r in capped.collect()}
    by_hash = df.select(
        "doc_id", hash_of_id_col("doc_id").alias("h")
    ).collect()
    expected = {r["doc_id"] for r in sorted(by_hash, key=lambda r: (r["h"], r["doc_id"]))[:3]}
    assert got == expected


def test_deterministic_sample_rate_and_consistency(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    s = deterministic_sample(docs, "doc_id", rate=0.3)
    k = s.count()
    assert 0.15 * n < k < 0.45 * n  # uniform hash → rate within wide bounds
    # partitioning-independent: identical survivor set
    k2 = deterministic_sample(docs.repartition(7), "doc_id", rate=0.3)
    assert sorted(r["doc_id"] for r in s.collect()) == sorted(
        r["doc_id"] for r in k2.collect()
    )
    # subset property: a lower rate's survivors are a subset
    s_small = deterministic_sample(docs, "doc_id", rate=0.1)
    assert {r["doc_id"] for r in s_small.collect()} <= {
        r["doc_id"] for r in s.collect()
    }


def test_cap_per_group_matches_python_twin_generative(spark):
    """Random (group, id) tables vs a pure-Python recomputation of the
    lowest-cap-by-(md5hash, id) survivor set."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def py_hash(i):
        hx = hashlib.md5(str(i).encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        if hi >= 1 << 31:
            hi -= 1 << 32
        return hi * (1 << 32) + lo

    rows_strategy = st.lists(
        st.tuples(st.integers(0, 200), st.sampled_from(["g1", "g2", "g3"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows_strategy)
    def check(rows):
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = {
            (r["doc_id"], r["source"], r["sample_rank"])
            for r in cap_per_group(df, "source", "doc_id", cap=3).collect()
        }
        expect = set()
        by_group = {}
        for i, g in rows:
            by_group.setdefault(g, []).append(i)
        for g, ids in by_group.items():
            ranked = sorted(ids, key=lambda i: (py_hash(i), i))[:3]
            expect |= {(i, g, rank + 1) for rank, i in enumerate(ranked)}
        assert got == expect

    check()


def test_cap_per_group_two_phase_equivalence(spark, sf_dir):
    """The skew-resistant two-phase cap must produce EXACTLY the
    single-window output — on the real table and on a skewed fixture
    (one group with 5000 rows vs caps of 7), including the
    quantile-undershoot fallback path at a tiny safety factor."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        cap_per_group_two_phase,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, cap_per_group(docs, "source", "doc_id", cap=5).collect()))
    b = sorted(
        map(tuple, cap_per_group_two_phase(docs, "source", "doc_id", cap=5).collect())
    )
    assert a == b

    skewed = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4900, "hot").otherwise(
            F.concat(F.lit("g"), (F.col("id") % 7).cast("string"))
        ).alias("source"),
    )
    a = sorted(map(tuple, cap_per_group(skewed, "source", "doc_id", cap=7).collect()))
    for safety in (4.0, 1.05):  # 1.05 forces the undershoot fallback path
        b = sorted(
            map(
                tuple,
                cap_per_group_two_phase(
                    skewed, "source", "doc_id", cap=7, safety=safety
                ).collect(),
            )
        )
        assert a == b, f"safety={safety}"
    # zero-survivor regression: an absurdly small safety makes the hash
    # filter keep nothing for most groups — they must still re-rank via
    # the counts-anchored fallback instead of vanishing from the output
    a1 = sorted(map(tuple, cap_per_group(skewed, "source", "doc_id", cap=1).collect()))
    b1 = sorted(
        map(
            tuple,
            cap_per_group_two_phase(
                skewed, "source", "doc_id", cap=1, safety=0.01
            ).collect(),
        )
    )
    assert a1 == b1


def test_stratified_split_deterministic_and_cosplitting(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        stratified_split,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(2000)], "doc_id long, source string"
    )
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    a = {
        r["doc_id"]: r["split"]
        for r in stratified_split(df, "doc_id", splits).collect()
    }
    # deterministic across invocations and partitionings
    b = {
        r["doc_id"]: r["split"]
        for r in stratified_split(
            df.repartition(7), "doc_id", splits
        ).collect()
    }
    assert a == b
    # proportions land near the weights (binomial concentration)
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03
    # co-splitting: another table sharing ids gets the same assignment
    other = spark.createDataFrame(
        [(i, i * 2) for i in range(0, 2000, 5)], "doc_id long, x long"
    )
    o = {
        r["doc_id"]: r["split"]
        for r in stratified_split(other, "doc_id", splits).collect()
    }
    assert all(a[k] == v for k, v in o.items())
    # weights normalize; single split assigns everything
    one = stratified_split(df, "doc_id", [("all", 3.0)]).collect()
    assert {r["split"] for r in one} == {"all"}


def test_grouped_split_coassigns_components_and_leakage_audit(spark):
    """grouped_split puts every member of a near-dup component in the
    representative's split (leakage 0 by construction); split_leakage
    counts cross-split pairs correctly for an arbitrary assignment."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        grouped_split,
        split_leakage,
        stratified_split,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # components: {0..9} rep 0, {100,101} rep 100; rest singletons
    groups = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(100, 100), (101, 100)],
        "doc_id long, keep_id long",
    )
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    safe = grouped_split(df, groups, "doc_id", splits)
    assign = {r["doc_id"]: r["split"] for r in safe.collect()}
    assert len(assign) == 200
    assert len({assign[i] for i in range(10)}) == 1
    assert assign[100] == assign[101]
    # members inherit the REPRESENTATIVE's split, singletons their own
    naive = {
        r["doc_id"]: r["split"]
        for r in stratified_split(df, "doc_id", splits).collect()
    }
    assert all(assign[i] == naive[0] for i in range(10))
    assert assign[150] == naive[150]
    # leakage audit: pairs within each component
    pairs = spark.createDataFrame(
        [(a, b) for a in range(10) for b in range(a + 1, 10)]
        + [(100, 101)],
        "id_a long, id_b long",
    )
    row = split_leakage(pairs, safe).collect()[0]
    assert (row["total_pairs"], row["cross_split_pairs"]) == (46, 0)
    # a deliberately mixed assignment is counted, not hidden
    mixed = df.withColumn(
        "split",
        F.when(F.col("doc_id") % 2 == 0, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )
    row = split_leakage(pairs, mixed).collect()[0]
    # within {0..9}: 5 even, 5 odd -> 25 cross pairs; (100,101) crosses
    assert (row["total_pairs"], row["cross_split_pairs"]) == (46, 26)


def test_banded_sample_rates_and_determinism(spark):
    """Per-band rates hold in expectation, rate-1.0 bands pass whole,
    absent bands drop entirely, and the decision is id-deterministic."""
    from pyspark.sql import functions as F
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        banded_sample,
    )

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("band"),
    )
    rates = {"a": 1.0, "b": 0.3}
    kept = banded_sample(df, "doc_id", "band", rates).collect()
    by_band = {}
    for r in kept:
        by_band.setdefault(r["band"], set()).add(r["doc_id"])
    assert len(by_band.get("a", ())) == 1000      # rate 1.0: all pass
    assert "c" not in by_band                     # absent band drops
    assert 200 < len(by_band["b"]) < 400          # ~300 expected
    again = {
        r["doc_id"]
        for r in banded_sample(df, "doc_id", "band", rates).collect()
    }
    assert again == by_band["a"] | by_band["b"]   # pure function of id


def test_training_order_permutation_partition_invariance_and_seed(spark):
    """position is a 0..n-1 permutation, identical under any input
    partitioning (the distributed scaffold can't leak layout into the
    order), equal to the single-window reference rank, and re-drawn by
    the seed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        portable_hash64_col,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        training_order,
    )

    df = spark.createDataFrame([(i,) for i in range(101)], "doc_id long")
    a = {
        r["doc_id"]: r["position"]
        for r in training_order(df, "doc_id", seed=3, n_buckets=4).collect()
    }
    assert sorted(a.values()) == list(range(101))
    b = {
        r["doc_id"]: r["position"]
        for r in training_order(
            df.repartition(7), "doc_id", seed=3, n_buckets=4
        ).collect()
    }
    assert a == b
    # single-window reference (the oracle shape): same total order
    h = portable_hash64_col(
        F.concat(F.col("doc_id").cast("string"), F.lit("#3"))
    )
    ref = {
        r["doc_id"]: r["rn"] - 1
        for r in df.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(h.asc(), F.col("doc_id").asc()))
            .alias("rn"),
        ).collect()
    }
    assert a == ref
    reseeded = {
        r["doc_id"]: r["position"]
        for r in training_order(df, "doc_id", seed=4, n_buckets=4).collect()
    }
    assert reseeded != a
    assert sorted(reseeded.values()) == list(range(101))


def test_temperature_sample_rates_and_determinism(spark):
    """Skewed two-group corpus: rates follow √n weights exactly (python
    integer twin), survival is partitioning-independent, and the big
    group thins harder than the small one."""
    import math

    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(400)] + [
        (i + 1000, "small") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    budget = 100
    n = {"big": 400, "small": 25}
    w = {g: math.floor(math.sqrt(v * 10**6)) for g, v in n.items()}
    tw = sum(w.values())
    rate = {
        g: min(10**6, (budget * w[g] // tw) * 10**6 // n[g]) for g in n
    }
    out = temperature_sample(
        df, "grp", "doc_id", budget_docs=budget, seed=0
    )
    got_rates = {
        r["grp"]: r["rate_ppm"]
        for r in out.select("grp", "rate_ppm").distinct().collect()
    }
    assert got_rates == rate
    assert rate["small"] > rate["big"]  # √-scaling favors the tail
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in temperature_sample(
            df.repartition(13), "grp", "doc_id", budget_docs=budget, seed=0
        ).collect()
    }
    assert a == b
    # kept counts concentrate near rate·n (binomial; generous bounds)
    kept_big = sum(1 for i in a if i < 1000)
    assert 0 < kept_big < 2 * (rate["big"] * 400 // 10**6 + 10)


def test_temperature_sample_caps_and_guards(spark):
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, "only") for i in range(20)], "doc_id long, grp string"
    )
    # budget >= corpus → rate caps at 1e6 and everything survives
    out = temperature_sample(df, "grp", "doc_id", budget_docs=1000)
    assert out.count() == 20
    assert out.select("rate_ppm").distinct().collect()[0][0] == 10**6
    # zero budget → empty
    assert (
        temperature_sample(df, "grp", "doc_id", budget_docs=0).count() == 0
    )
    with _pytest.raises(ValueError, match="budget"):
        temperature_sample(df, "grp", "doc_id", budget_docs=-1)


def test_top_fraction_per_group_exact_cut_and_ties(spark):
    """ceil(fraction·n) per group, ranked (score DESC, id ASC): a
    3-row group at 0.3 keeps ceil(0.9)=1; score ties cut by id."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        top_fraction_per_group,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10), (2, "a", 30), (3, "a", 20),
            (10, "b", 5), (11, "b", 5), (12, "b", 5), (13, "b", 5),
        ],
        "doc_id long, grp string, score long",
    )
    got = {
        r["doc_id"]: r["quality_rank"]
        for r in top_fraction_per_group(
            df, "grp", "score", "doc_id", fraction=0.3
        ).collect()
    }
    # group a: ceil(0.9)=1 → best score (30); group b: ceil(1.2)=2 →
    # all scores tie, lowest two ids survive
    assert got == {2: 1, 10: 1, 11: 2}

    # fraction bounds
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        top_fraction_per_group as tf,
    )

    assert tf(df, "grp", "score", "doc_id", fraction=1.0).count() == 7
    assert tf(df, "grp", "score", "doc_id", fraction=0.0).count() == 0
    with _pytest.raises(ValueError, match="fraction"):
        tf(df, "grp", "score", "doc_id", fraction=1.5)


def test_importance_weights_python_twin(spark):
    """DSIR-linear weights replayed in python: hashed bigram buckets,
    add-one smoothed floor-div probabilities, per-doc weighted sums —
    every integer identical."""
    import hashlib

    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        importance_weights,
    )

    def phash(t: str) -> int:
        hx = hashlib.md5(t.encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        if hi >= 1 << 31:
            hi -= 1 << 32
        return hi * (1 << 32) + lo

    raw_docs = [
        (1, "the cat sat on the mat"),
        (2, "stock market crash wipes billions"),
        (3, "the cat chased the dog"),
        (4, "tiny"),  # < 2 words: no bigrams, omitted
    ]
    tgt_docs = [
        (10, "the cat sat on the sofa"),
        (11, "a cat and a dog"),
    ]
    raw = spark.createDataFrame(raw_docs, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_docs, "doc_id long, text string")
    nb, scale, seed = 64, 10**6, 3
    got = {
        r["doc_id"]: (r["n_feats"], r["importance_fp"])
        for r in importance_weights(
            raw, tgt, "doc_id", "text", n_buckets=nb, scale=scale, seed=seed
        ).collect()
    }

    def bigrams(t):
        ws = t.lower().split()
        return [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]

    def bucket(g):
        return phash(f"{g}#{seed}") % nb

    raw_cnt, tgt_cnt = {}, {}
    for _, t in raw_docs:
        for g in bigrams(t):
            raw_cnt[bucket(g)] = raw_cnt.get(bucket(g), 0) + 1
    for _, t in tgt_docs:
        for g in bigrams(t):
            tgt_cnt[bucket(g)] = tgt_cnt.get(bucket(g), 0) + 1
    rt, tt = sum(raw_cnt.values()), sum(tgt_cnt.values())
    expect = {}
    for i, t in raw_docs:
        bs = [bucket(g) for g in bigrams(t)]
        if not bs:
            continue
        score = sum(
            ((tgt_cnt.get(b, 0) + 1) * scale) // (tt + nb)
            - ((raw_cnt[b] + 1) * scale) // (rt + nb)
            for b in bs
        )
        expect[i] = (len(bs), score)
    assert got == expect, (got, expect)
    # the cat docs look more target-like than the finance doc
    assert got[1][1] > got[2][1] and got[3][1] > got[2][1]


def test_importance_weights_identical_corpora_and_guards(spark):
    """target == raw → p̂_t == p̂_r bucket-for-bucket → every document
    scores exactly 0; parameter guards raise."""
    import pytest as _pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        importance_weights,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    got = importance_weights(docs, docs, "doc_id", "text").collect()
    assert len(got) == 2
    assert all(r["importance_fp"] == 0 for r in got)
    with _pytest.raises(ValueError, match="n_buckets"):
        importance_weights(docs, docs, "doc_id", "text", n_buckets=0)
    with _pytest.raises(ValueError, match="ngram"):
        importance_weights(docs, docs, "doc_id", "text", ngram=0)
