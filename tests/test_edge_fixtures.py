"""FIXTURES.md §3 edge cases: tiny batches, empty inputs, string labels,
unmatched sources — through the full pipeline."""

import os

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.model import Edge, Graph, Node
from dataflow_flex_pyarrow_to_gds_spark.plans import GraphLoadPipeline
from dataflow_flex_pyarrow_to_gds_spark.sinks import ParquetGraphSink


def test_many_tiny_files_coalesce(spark, tmp_path):
    """Many small parquet files → one scan, correct totals (the reference
    needs explicit ≥50k-row coalescing, ``_dofn.py:184-202``; Spark's
    scan planner packs small files into shared tasks via
    maxPartitionBytes/openCostInBytes)."""
    src = str(tmp_path / "tiny")
    spark.range(0, 1000).select(
        F.col("id").alias("source"),
        (F.col("id") + 1).alias("target"),
        F.lit("CITES").alias("type"),
    ).repartition(50).write.parquet(src)  # 50 files of ~20 rows
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 40

    df = spark.read.parquet(src)
    assert df.count() == 1000
    # scan packs tiny files: far fewer partitions than files
    assert df.rdd.getNumPartitions() < n_files


def test_empty_input_through_pipeline(spark, tmp_path):
    """0-row input with a valid schema flows scan → project → sink."""
    src = str(tmp_path / "empty.parquet")
    spark.createDataFrame(
        [], "paper long, labels array<string>, title string"
    ).write.parquet(src)
    g = Graph(
        name="g",
        nodes=(Node(source=".*/empty.parquet", key_field="paper",
                    label_field="labels", properties={"title": "title"}),),
    )
    report = GraphLoadPipeline(
        spark, g, ParquetGraphSink(str(tmp_path / "out"))
    ).run([src])
    assert report.nodes.count == 0
    assert report.final.kind == "final"
    out = spark.read.parquet(str(tmp_path / "out/nodes/element_000"))
    assert out.columns == ["nodeId", "labels", "title"] and out.count() == 0


def test_dangling_edges_fixture(spark, tmp_path):
    """Edges referencing absent node ids are catchable pre-sink."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.edge_resolution import (
        dangling_edges,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "nodeId long")
    edges = spark.createDataFrame(
        [(1, 2, "CITES"), (3, 99, "CITES"), (98, 99, "CITES")],
        "sourceNodeId long, targetNodeId long, relationshipType string",
    )
    bad = dangling_edges(edges, nodes)
    assert bad.count() == 2


def test_mixed_label_models_one_graph(spark, tmp_path):
    """String-label and no-label node elements coexist with a stable
    array<string> labels column in the export."""
    p1 = str(tmp_path / "with_label.parquet")
    p2 = str(tmp_path / "no_label.parquet")
    spark.createDataFrame([(1, "Paper")], "id long, kind string").write.parquet(p1)
    spark.createDataFrame([(2,)], "id long").write.parquet(p2)
    g = Graph(
        name="g",
        nodes=(
            Node(source=".*/with_label.parquet", key_field="id", label_field="kind"),
            Node(source=".*/no_label.parquet", key_field="id"),
        ),
    )
    report = GraphLoadPipeline(
        spark, g, ParquetGraphSink(str(tmp_path / "out2"))
    ).run([p1, p2])
    assert report.nodes.count == 2
    both = spark.read.parquet(str(tmp_path / "out2/nodes/*"))
    got = {r["nodeId"]: r["labels"] for r in both.collect()}
    assert got[1] == ["Paper"] and got[2] == []


def test_salted_aggregate_equals_naive(spark, sf_dir):
    """Salting must not change results (associativity)."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.skew import salted_aggregate

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = {
        r["l_returnflag"]: (round(r["q"], 2), r["n"])
        for r in salted_aggregate(
            df, ["l_returnflag"], sums={"l_quantity": "q"}, count_alias="n",
            salt_buckets=8,
        ).collect()
    }
    naive = {
        r["l_returnflag"]: (round(r["q"], 2), r["n"])
        for r in df.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == naive


def test_csv_source_through_pipeline(spark, tmp_path):
    """The graph pipeline reads any Spark batch source — CSV here."""
    src = str(tmp_path / "csv_nodes")
    spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0)], "id long, label string, score double"
    ).write.option("header", "true").csv(src)
    g = Graph(
        name="g",
        nodes=(Node(source=".*/csv_nodes.*", key_field="id",
                    label_field="label", properties={"score": "score"}),),
    )
    report = GraphLoadPipeline(
        spark, g, ParquetGraphSink(str(tmp_path / "csv_out")),
        source_format="csv",
        source_options={"header": "true", "inferSchema": "true"},
    ).run([src])
    assert report.nodes.count == 2
    out = spark.read.parquet(str(tmp_path / "csv_out/nodes/element_000"))
    got = {r["nodeId"]: (r["labels"], r["score"]) for r in out.collect()}
    assert got[1] == (["A"], 10.0)


def test_json_source_through_pipeline(spark, tmp_path):
    src = str(tmp_path / "json_edges")
    spark.createDataFrame(
        [(1, 2, "REL"), (2, 3, "REL")],
        "src long, dst long, kind string",
    ).write.json(src)
    g = Graph(
        name="g",
        edges=(Edge(source=".*/json_edges.*", source_field="src",
                    target_field="dst", type_field="kind"),),
    )
    report = GraphLoadPipeline(
        spark, g, ParquetGraphSink(str(tmp_path / "json_out")),
        source_format="json",
    ).run([src])
    assert report.edges.count == 2
