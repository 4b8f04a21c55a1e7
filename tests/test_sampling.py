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
