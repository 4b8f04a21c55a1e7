"""CLI surface: both modes end-to-end against testdata."""

import json

from dataflow_flex_pyarrow_to_gds_spark.cli import main
from dataflow_flex_pyarrow_to_gds_spark.examples import tpch_graph


def _write_model(tmp_path):
    p = tmp_path / "model.json"
    p.write_text(tpch_graph().to_json())
    return str(p)


def _write_table_model(tmp_path):
    model = {
        "name": "tbl",
        "db": "neo4j",
        "nodes": [{"source": "customer", "key_field": "c_custkey"}],
        "edges": [
            {
                "source": "orders",
                "source_field": "o_custkey",
                "target_field": "o_orderkey",
                "default_type": "PLACED",
            }
        ],
    }
    p = tmp_path / "tbl_model.json"
    p.write_text(json.dumps(model))
    return str(p)


def test_cli_gcs_mode(spark, sf_dir, tmp_path, capsys):
    rc = main(
        [
            "--mode", "gcs",
            "--graph_json", _write_model(tmp_path),
            "--node_pattern", f"{sf_dir}/customer.parquet",
            "--node_pattern", f"{sf_dir}/orders.parquet",
            "--edge_pattern", f"{sf_dir}/lineitem.parquet",
            "--sink", "parquet",
            "--output_dir", str(tmp_path / "out"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "final: WriteResult" in out and "kind='final'" in out


def test_cli_bigquery_fake_mode(spark, sf_dir, tmp_path, capsys):
    rc = main(
        [
            "--mode", "bigquery",
            "--graph_json", _write_table_model(tmp_path),
            "--node_tables", "customer",
            "--edge_tables", "orders",
            "--bq_fake_dataset", sf_dir,
            "--sink", "parquet",
            "--output_dir", str(tmp_path / "bqout"),
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "nodes: WriteResult(count=150" in out
    assert "edges: WriteResult(count=1500" in out


def test_cli_missing_patterns_is_usage_error(tmp_path, capsys):
    rc = main(["--mode", "gcs", "--graph_json", _write_model(tmp_path)])
    assert rc == 2
    assert "node_pattern" in capsys.readouterr().err
