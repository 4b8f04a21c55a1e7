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


def test_frequent_pair_rules_hand_computed_and_cap(spark):
    """Association rules on a hand fixture: supports, integer percent
    confidences, and ppm lift replay by hand; the mega-basket cap
    EXCLUDES the degenerate basket entirely (its pairs and its
    contribution to item supports and n_baskets all vanish — the
    contract the oracle replays); duplicate (basket, item) rows dedup
    before counting."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.itemsets import (
        frequent_pair_rules,
    )

    rows = (
        [("b1", "x"), ("b1", "y"), ("b1", "x")]   # dup (b1, x)
        + [("b2", "x"), ("b2", "y")]
        + [("b3", "x")]
        + [("b4", "m1"), ("b4", "m2"), ("b4", "m3"), ("b4", "m4")]
    )
    df = spark.createDataFrame(rows, "bk string, it string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_pair_rules(
            df, "bk", "it", min_support=2, max_basket_items=3
        ).collect()
    }
    # the 4-item basket b4 is excluded; only (x, y) clears min_support
    assert set(got) == {("x", "y")}
    r = got[("x", "y")]
    # over the surviving baskets {b1, b2, b3}: supp(x)=3, supp(y)=2,
    # supp(xy)=2, n=3
    assert (r["supp_ab"], r["supp_a"], r["supp_b"]) == (2, 3, 2)
    assert r["conf_a_to_b_pct"] == 100 * 2 // 3 == 66
    assert r["conf_b_to_a_pct"] == 100
    assert r["lift_ppm"] == 2 * 3 * 1_000_000 // (3 * 2) == 1_000_000

    # without the cap, b4's pairs appear (all support 1 < min_support)
    # and supports/n change
    got2 = {
        (r["item_a"], r["item_b"]): r
        for r in frequent_pair_rules(df, "bk", "it", min_support=1).collect()
    }
    assert got2[("x", "y")]["supp_ab"] == 2
    assert got2[("m1", "m2")]["supp_ab"] == 1
    assert got2[("x", "y")]["lift_ppm"] == 2 * 4 * 1_000_000 // (3 * 2)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_support"):
        frequent_pair_rules(df, "bk", "it", min_support=0)
    with _pytest.raises(ValueError, match="max_basket_items"):
        frequent_pair_rules(df, "bk", "it", max_basket_items=1)
