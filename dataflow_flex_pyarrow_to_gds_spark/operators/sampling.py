"""Deterministic sampling operators for corpus curation.

Production pipelines downsample over-represented groups (domains,
sources, languages) and take reproducible corpus subsamples. Random
``sample()``/``sampleBy()`` are seed-and-partitioning dependent — results
change when the cluster layout changes, and no external engine can
re-derive them. Everything here orders by a CONTENT hash instead: the
same rows survive on any cluster, any partitioning, any engine — and a
DuckDB oracle can recompute the exact survivor set (the md5-derived
portable hash has a verbatim ANSI-SQL twin, see the simhash oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import portable_hash64_col


def hash_of_id_col(id_col: str) -> Column:
    """Portable 64-bit hash of a (numeric or string) id column."""
    return portable_hash64_col(F.col(id_col).cast("string"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the lowest ``cap`` by
    (portable_hash(id), id): a uniform, reproducible choice, not "first
    cap rows some scan happened to produce".

    One shuffle on the group key + a bounded rank window. At extreme
    group skew (one domain = half the corpus) the window partition for
    that group is a straggler; the scale remedy is a two-phase threshold
    pass — keep rows with hash below ≈ (cap / |group|)-quantile (narrow
    filter, survivors ≈ 2·cap), then rank only the survivors. The
    single-window form is kept here because it is exact by construction
    and the oracle checks it row-for-row.
    """
    w = W.partitionBy(group_col).orderBy(hash_of_id_col(id_col), F.col(id_col))
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= cap)
    )


def deterministic_sample(
    df: DataFrame, id_col: str, *, rate: float, buckets: int = 10_000
) -> DataFrame:
    """Reproducible ~``rate`` Bernoulli sample: keep rows whose
    ``pmod(portable_hash(id), buckets)`` falls under ``rate·buckets``.
    Engine- and partitioning-independent, narrow (no shuffle), and
    consistent across tables sharing the id (a join of two sampled
    tables keeps exactly the co-sampled rows)."""
    return df.filter(
        F.pmod(hash_of_id_col(id_col), F.lit(buckets)) < int(rate * buckets)
    )
