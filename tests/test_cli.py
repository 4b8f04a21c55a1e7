"""CLI surface: both modes end-to-end against testdata."""

import json

import pytest

from dataflow_flex_pyarrow_to_gds_spark.cli import main
from dataflow_flex_pyarrow_to_gds_spark.examples import tpch_graph


@pytest.fixture(autouse=True)
def _restore_session_conf(spark):
    """cli.main() calls get_spark(), and since Spark 3.4 getOrCreate()
    rewrites runtime SQL confs on the EXISTING session from its builder
    defaults (cpus=32 → shuffle.partitions=32, vs the test session's 8).
    Snapshot and restore so the leak can't skew later tests."""
    keys = ("spark.sql.shuffle.partitions",)
    saved = {k: spark.conf.get(k, None) for k in keys}
    yield
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


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
