"""Table profiling — the data-quality reconnaissance pass a pipeline
runs before trusting a new 100-TB drop: per-column null and exact
distinct counts in ONE aggregation over the table.

The reference has no profiling surface (its only aggregate is the
global row/byte sum, ``_dofn.py`` result counting); this generalizes
that "describe what I just read" idea to per-column statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """``(col_name, n_rows, n_nulls, n_distinct)`` — one row per
    profiled column, all counts EXACT (the approximate twin is Spark's
    built-in ``approx_count_distinct``, already exercised by the
    approx_stats catalog row; exact distincts are what schema-contract
    checks diff against).

    Scale shape: a single ``agg`` with one ``countDistinct`` per column
    — Catalyst plans an Expand (|cols| single-column streams, each
    map-side partially aggregated), so the shuffle carries ~|cols| ×
    |distinct values| skinny rows, NOT |cols| full-width copies of the
    table; the null counts ride the same pass as conditional sums. The
    1-row result is then unpivoted driver-light via ``stack``. Column
    amplification is the documented cost — profile the columns you
    care about, not ``df.columns``, when the table is wide.
    """
    if not cols:
        raise ValueError("table_profile: cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `_nn_{c}`, `_nd_{c}`" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)",
        "_n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")
