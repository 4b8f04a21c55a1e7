"""Pareto frontier (skyline) over two maximize dimensions.

The skyline operator of Börzsönyi, Kossmann & Stocker (ICDE 2001):
a row is on the frontier iff NO other row is ≥ in both dimensions and
strictly greater in at least one. The multi-objective shortlist pass a
curation pipeline runs before a single-score rank would throw away the
trade-off structure (quality vs. freshness, size vs. price, relevance
vs. diversity): every frontier row is an optimal trade-off; everything
else is strictly worse than something kept. The reference has no
analytics surface (it defers compute to its GDS server); this is part
of the mandated extension tier, public semantics only.

Scale shape — never the O(n²) dominance join the ORACLE replays:

1. per-x reduction: only rows carrying their x-value's MAX y can
   survive (a same-x row with larger y dominates); one
   partially-aggregated groupBy + an equi-join keep-filter.
2. cross-x sweep WITHOUT a global window: the distinct-x candidate
   table range-buckets on x (:func:`~.packing.range_bucketed` — the
   shared scaffold), per-bucket max-y partial-aggregates to ≤
   n_buckets rows, an EXCLUSIVE suffix max over that driver-scale
   bucket table (the one place a global window is right —
   :func:`~.packing.bucket_offsets`' documented trade) broadcasts
   back, and a per-bucket window ordered by x DESC computes the
   strictly-greater-x running max (one row per distinct x inside a
   bucket, so rowsBetween(…, -1) IS strict dominance).
3. a row survives iff max(y over x' > x) < y (NULL = nothing above).

Duplicate (x, y) points do not dominate each other (neither is
strictly better) and are ALL kept — the standard skyline convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .packing import range_bucketed


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    n_buckets: int = 32,
) -> DataFrame:
    """→ the input rows (original schema) on the maximize-maximize
    Pareto frontier of ``(x_col, y_col)``. NULL in either dimension
    disqualifies a row (an incomparable point neither dominates nor
    survives a dominance test — the scale_properties null contract).
    """
    x, y = F.col(x_col), F.col(y_col)
    rows = df.filter(x.isNotNull() & y.isNotNull())
    # 1) one candidate (x, max y) per distinct x
    cand = rows.groupBy(x.alias("_x")).agg(F.max(y).alias("_my"))
    # 2) bucketed strictly-greater-x running max
    b = range_bucketed(cand, F.col("_x"), n_buckets=n_buckets)
    bmax = b.groupBy("_pb").agg(F.max("_my").alias("_bm"))
    # constant partition spec: the input is ≤ n_buckets rows by
    # construction. pmod(col, 1) because a foldable literal is
    # optimized out of the spec and the unpartitioned-window warning
    # (r12 #5) would still fire.
    w_suf = (
        W.partitionBy(F.pmod(F.col("_pb"), F.lit(1)))
        .orderBy(F.desc("_pb"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    suf = bmax.select(
        "_pb", F.max("_bm").over(w_suf).alias("_suf")
    )  # max y over strictly LATER buckets (NULL for the top bucket)
    w_loc = (
        W.partitionBy("_pb")
        .orderBy(F.desc("_x"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    keep_x = (
        b.join(F.broadcast(suf), "_pb")
        .withColumn("_loc", F.max("_my").over(w_loc))
        # greatest() ignores NULLs, returns NULL only when both are
        .withColumn("_dom", F.greatest("_suf", "_loc"))
        .filter(F.col("_dom").isNull() | (F.col("_dom") < F.col("_my")))
        .select("_x", "_my")
    )
    # 3) frontier rows: x kept AND y is that x's max. Plain equi-semi
    # join, no broadcast hint: the frontier is usually tiny (AQE
    # broadcasts it at runtime) but anticorrelated data can put EVERY
    # row on it, so a forced broadcast would be the 100-TB footgun.
    return rows.join(
        keep_x,
        (x == F.col("_x")) & (y == F.col("_my")),
        "semi",
    )
