"""Skew-mitigation operators: salted two-stage aggregation.

A low-cardinality or hot-key ``groupBy`` funnels everything into a few
reducers; salting spreads the partial aggregation over
``salt_buckets × |keys|`` groups, then merges. Correct for any
decomposable aggregate (sum/count/min/max — the partial and final
functions match; count re-merges with sum).

AQE's skew-join splitting covers *joins*; salting remains the tool for
skewed *aggregations* at 100 TB. Results are identical to the naive
groupBy (associativity), so the DuckDB oracle for a salted query is just
the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = None,
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage groupBy: partial agg on (keys + salt), final merge on keys.

    ``sums`` maps input column → output alias; ``count_alias`` adds a row
    count. The salt is ``spark_partition_id() % salt_buckets`` — zero
    compute, already-distributed, and it cannot affect results (stage two
    merges all salts).
    """
    sums = sums or {}
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    partial_aggs: list[Column] = [
        F.sum(src).alias(f"_p_{dst}") for src, dst in sums.items()
    ]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("_p_cnt"))
    partial = df.groupBy(*keys, salt).agg(*partial_aggs)

    final_aggs: list[Column] = [
        F.sum(f"_p_{dst}").alias(dst) for dst in sums.values()
    ]
    if count_alias:
        final_aggs.append(F.sum("_p_cnt").cast("long").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
