"""Bucketed tables co-locate join keys → shuffle-free joins.

The 100-TB pattern: pay the shuffle once at write time (bucketBy), then
every later join/agg on that key skips its Exchange. Verified against the
physical plan, not just the result.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # a previously crashed run can leave the managed location behind even
    # after DROP TABLE (dir without catalog entry) — clear it
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # hint merge: at test scale Catalyst would broadcast the tiny side
    # (which also skips the shuffle, but is not the property under test —
    # at 100 TB both sides are huge and SMJ is the strategy in play)
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b").hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = _plan(joined)
    # both sides scan bucketed layouts; the join needs no Exchange at all
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    # and the result is still correct
    n = joined.count()
    li = spark.table("lineitem_b").count()
    assert n == li  # every lineitem matches exactly one order


def test_unbucketed_join_does_shuffle(warehouse, spark, sf_dir):
    """Control: the same join on raw parquet shuffles both sides."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = _plan(
        li.join(orders, li.l_orderkey == orders.o_orderkey).hint("merge")
    )
    assert "Exchange" in plan
