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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: each FACT row gets a salt that varies
    WITHIN a key (``spark_partition_id() % n`` — zero compute, already
    spread, the :func:`salted_aggregate` choice; a key-derived salt
    would put every row of the hot key in the same bucket and fix
    nothing), and the DIM side replicates each row across all salts via
    one ``explode(sequence(...))``. Joining on (key, salt) splits a hot
    key's rows across ``salt_buckets`` reducers instead of funnelling
    them into one straggler task. The salt assignment cannot affect the
    RESULT — every fact row meets every matching dim row exactly once
    (its own salt replica) under ANY assignment — so the output is
    engine/partitioning-deterministic even though the salt is not.

    Results are EXACTLY the plain join's, so the oracle for a salted
    query is the unsalted join. Cost model: the dim
    shuffle grows ``salt_buckets``×; use it when the fact side's key
    histogram is heavy-tailed and the dim side is small-ish but above
    the broadcast threshold — the regime where neither broadcast nor
    AQE's size-based skew splitting (which needs the skew to show up in
    map output sizes, and cannot split a single hot KEY finer than its
    partition) fully covers. Returns the joined frame with internal
    salt columns dropped.
    """
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be ≥ 1, got {salt_buckets}")
    f = fact.withColumn(
        "_salt", (F.spark_partition_id() % salt_buckets).cast("long")
    )
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return f.join(d, [key, "_salt"]).drop("_salt")
