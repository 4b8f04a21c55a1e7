"""salted_join (r7): result parity with the plain join, and the salt
must actually vary within a hot key."""

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, float(i)) for i in range(400)],
        "row_id long, k long, v double",
    )  # key 1 is hot (360 rows)
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, name string"
    )
    salted = salted_join(fact, dim, "k", salt_buckets=4)
    plain = fact.join(dim, "k")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # contract: same columns, no salt residue
    assert sorted(salted.columns) == sorted(plain.columns)


def test_salted_join_salt_varies_within_hot_key(spark):
    """A key-derived salt would fix nothing: across enough input
    partitions, the hot key's rows must land in >1 salt bucket."""
    fact = spark.range(0, 1000, 1, 8).select(
        F.col("id").alias("row_id"), F.lit(7).alias("k")
    )
    salted = fact.withColumn(
        "_salt", (F.spark_partition_id() % 4).cast("long")
    )
    assert salted.select("_salt").distinct().count() > 1
