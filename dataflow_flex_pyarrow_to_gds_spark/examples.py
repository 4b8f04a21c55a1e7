"""Example graph models over the synthetic TPC-H-ish testdata.

The scale fixture from FIXTURES.md: nodes = customer/orders/part/supplier
(all int64 keys, satisfying the numeric-key constraint, reference
``README.md:169-170``); edges = customer→orders (PLACED, from the orders
table) and orders→part (CONTAINS, from lineitem). The orders table feeds
BOTH a node and an edge element — the same legal double-routing the
stackoverflow model exercises (reference ``so_model.json:15-21,33-40``).

Note: like the reference, the model does not namespace key spaces — id
uniqueness across node elements is the model author's responsibility.
"""

from __future__ import annotations

from .model import Edge, Graph, Node


def tpch_graph() -> Graph:
    return Graph(
        name="tpch",
        db="neo4j",
        nodes=(
            Node(
                source=r".*/customer\.parquet",
                key_field="c_custkey",
                properties={"c_name": "name", "c_acctbal": "acctbal"},
            ),
            Node(
                source=r".*/orders\.parquet",
                key_field="o_orderkey",
                properties={"o_totalprice": "totalprice"},
            ),
            Node(
                source=r".*/part\.parquet",
                key_field="p_partkey",
                properties={"p_name": "name", "p_retailprice": "retailprice"},
            ),
            Node(
                source=r".*/supplier\.parquet",
                key_field="s_suppkey",
                properties={"s_name": "name"},
            ),
        ),
        edges=(
            Edge(
                source=r".*/orders\.parquet",
                source_field="o_custkey",
                target_field="o_orderkey",
                default_type="PLACED",
            ),
            Edge(
                source=r".*/lineitem\.parquet",
                source_field="l_orderkey",
                target_field="l_partkey",
                default_type="CONTAINS",
                properties={"l_quantity": "quantity", "l_extendedprice": "price"},
            ),
        ),
    )


def tpch_graph_sources(sf_dir: str) -> list[str]:
    return [
        f"{sf_dir}/{t}.parquet"
        for t in ("customer", "orders", "part", "supplier", "lineitem", "region")
    ]  # region deliberately unmatched → exercises routing-miss reporting
