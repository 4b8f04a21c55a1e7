"""Partitioned table layout + dynamic partition pruning (DPP).

The 100-TB claim under test: a fact table hive-partitioned on a routing
column, joined against a runtime-filtered dimension, scans ONLY the
surviving partition directories — Spark inserts a
``dynamicpruningexpression`` into the fact scan's PartitionFilters and
skips whole directories at execution time. Verified against the physical
plan AND the runtime partition-read metric, not just the result
(VERDICT r8 #2: the module's headline feature must be asserted, the
test_bucketing.py precedent).
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def part_tables(spark, tmp_path_factory):
    """A 4-partition managed fact table + a tiny parquet dimension whose
    filter column (k) is NOT the join key, so partition membership is
    only knowable at runtime — static predicate inference cannot
    replace DPP here."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.layout import (
        write_partitioned_table,
    )

    fact = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(400)],
        "id long, pc int, v double",
    )
    write_partitioned_table(spark, fact, "layout_fact_t", "pc")
    dim_path = str(tmp_path_factory.mktemp("dim") / "dim.parquet")
    spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3), (40, 0)], "k int, pc int"
    ).write.mode("overwrite").parquet(dim_path)
    yield spark.table("layout_fact_t"), spark.read.parquet(dim_path)
    spark.sql("DROP TABLE IF EXISTS layout_fact_t")


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dpp_expression_in_partition_filters(part_tables):
    fact, dim = part_tables
    j = (
        fact.join(dim.filter(F.col("k") == 10), "pc")
        .groupBy("pc")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _plan(j)
    assert "dynamicpruningexpression" in plan, plan
    assert [(r["pc"], r["n"]) for r in j.collect()] == [(1, 100)]


def test_dpp_skips_partition_directories(spark, part_tables):
    """Runtime proof, not just the plan: the fact scan's
    ``number of partitions read`` metric must be 1 of 4 after the
    dimension filter resolves. AQE is disabled for the probe so the
    executed plan tree (and its metrics) is directly walkable."""
    fact, dim = part_tables
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = fact.join(dim.filter(F.col("k") == 10), "pc").select("id")
        assert j.count() == 100
        j.collect()
        leaves = j._jdf.queryExecution().executedPlan().collectLeaves()
        reads = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            metrics = leaf.metrics()
            if metrics.contains("numPartitions"):
                reads.append(int(metrics.apply("numPartitions").value()))
        assert reads, "no partitioned scan metric found in executed plan"
        assert min(reads) == 1, reads  # 1 of the 4 directories
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_write_repartitions_to_one_file_per_partition(spark, part_tables):
    """The write repartitions BY THE PARTITION COLUMN first — without
    it every task holds a sliver of every partition value and the sink
    emits tasks × partitions small files (the write_token_shards
    lesson). One shuffle partition per value → one data file per
    directory."""
    import os

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    root = os.path.join(wh, "layout_fact_t")
    part_dirs = [d for d in os.listdir(root) if d.startswith("pc=")]
    assert sorted(part_dirs) == ["pc=0", "pc=1", "pc=2", "pc=3"]
    for d in part_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(root, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)


def test_qualified_table_name_rejected(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.layout import (
        write_partitioned_table,
    )

    df = spark.range(1).withColumn("pc", F.lit(0))
    with pytest.raises(ValueError):
        write_partitioned_table(spark, df, "db.qualified", "pc")
