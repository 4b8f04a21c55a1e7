"""SQL API parity: ANSI-compatible oracle strings run through spark.sql
produce the same results as the DataFrame-API catalog queries (Catalyst
yields one plan for both surfaces — this proves the SQL front door works)."""

import pytest

from dataflow_flex_pyarrow_to_gds_spark import queries as catalog

# oracle strings that are valid Spark SQL as-is (no DuckDB-only syntax)
SPARK_COMPATIBLE = [
    "q1_pricing_summary",
    "window_top_orders",
    "agg_distinct_parts",
    "rollup_lineitem",
    "sort_limit",
    "set_ops_nations",
    "exists_big_customers",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for t in ["customer", "supplier", "orders", "lineitem", "nation", "region"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark


@pytest.mark.parametrize("name", SPARK_COMPATIBLE)
def test_sql_matches_dataframe_api(views, spark, sf_dir, name):
    specs = catalog._specs()
    key = lambda row: tuple(map(repr, row))  # null-safe ordering (rollup rows)
    df_rows = sorted(map(tuple, specs[name].fn(spark, sf_dir).collect()), key=key)
    sql_rows = sorted(map(tuple, spark.sql(specs[name].oracle).collect()), key=key)
    assert df_rows == sql_rows
