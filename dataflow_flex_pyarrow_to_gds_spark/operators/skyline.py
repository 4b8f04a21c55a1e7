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

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .packing import range_bucketed
from ._materialize import materialize


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


def pareto_frontier_nd(
    df: DataFrame,
    cols: list[str],
    *,
    directions: list[str] | None = None,
    max_candidates: int = 200_000,
    local_keep_cap: int = 4096,
) -> DataFrame:
    """d-dimensional maximize-all Pareto frontier (r14, VERDICT r13
    #6) → the input rows (original schema) no other row weakly
    dominates (≥ in every listed dimension, > in at least one). Real
    curation shortlists run 3-5 objectives (quality × freshness ×
    length × dedup-distance) where the 2-D suffix-max sweep of
    :func:`pareto_frontier` no longer applies.

    Algorithm — the classic local-then-merge skyline (the
    grid/partition family of Börzsönyi et al.; dominance is transitive,
    so a row dominated ANYWHERE is dominated by some survivor):

    1. **Local prefilter** (``mapInPandas``, Arrow-batched): each batch
       keeps its own skyline via sort-filter-skyline — rows sorted
       descending by all dims; a row can only be dominated by an
       EARLIER row in that order, checked vectorized against the kept
       set. LOSSLESS by the transitivity argument, and deliberately
       allowed to degrade: past ``local_keep_cap`` survivors the batch
       passes rows through UNFILTERED (anticorrelated floods make
       local skylines quadratic — correctness never depends on the
       prefilter, so it stops paying when it stops pruning).
    2. **Bounded exact merge**: surviving candidates are counted —
       more than ``max_candidates`` raises LOUDLY (the IVF/PQ bounded-
       budget contract: an anticorrelated 100-TB flood where *nothing*
       prunes is a different problem than a shortlist) — then one
       broadcast anti-join eliminates candidates dominated by any
       other candidate. The O(S²) dominance test runs on the BOUNDED
       candidate set only, never the corpus (the oracle replays it as
       NOT EXISTS over all rows).

    NULL in any listed dimension disqualifies the row (the
    :func:`pareto_frontier` contract). Duplicate points do not
    dominate each other and are ALL kept. Comparisons stay in each
    column's native type end-to-end (pandas object/Decimal included) —
    no float coercion, so decimals survive bit-exact.

    ``directions`` (r14) mixes objectives — one of ``"max"``/``"min"``
    per listed column (default all-max): real shortlists maximize
    quality while MINIMIZING toxicity or age. Minimized dimensions
    ride internally as their numeric negation (one codegen projection;
    the whole maximize engine then applies unchanged), so they must be
    numeric — the all-max path touches nothing and keeps working on
    any orderable type.
    """
    if len(cols) < 2:
        raise ValueError(
            f"pareto_frontier_nd: need >= 2 dimensions, got {cols}"
        )
    if max_candidates < 1:
        raise ValueError("pareto_frontier_nd: max_candidates must be >= 1")
    if local_keep_cap < 1:
        # a non-positive cap would silently degrade phase 1 to full
        # passthrough and shift all pruning (and the loud
        # max_candidates failure) onto the merge — ADVICE r14
        raise ValueError("pareto_frontier_nd: local_keep_cap must be >= 1")
    if directions is None:
        directions = ["max"] * len(cols)
    if len(directions) != len(cols) or any(
        d not in ("max", "min") for d in directions
    ):
        raise ValueError(
            f"pareto_frontier_nd: directions must be one 'max'/'min' "
            f"per column, got {directions!r} for {cols}"
        )
    orig_cols = None
    rows = df.filter(
        reduce(lambda a, b: a & b, [F.col(c).isNotNull() for c in cols])
    )
    if any(d == "min" for d in directions):
        from pyspark.sql.types import IntegralType, NumericType

        # the negation trick requires numeric min-dims — Spark would
        # otherwise silently cast (a string column negates to DOUBLE,
        # even under ANSI), breaking both the documented contract and
        # the no-float-coercion guarantee
        for c, d in zip(cols, directions):
            if d == "min" and not isinstance(
                df.schema[c].dataType, NumericType
            ):
                raise ValueError(
                    f"pareto_frontier_nd: minimized dimension {c!r} "
                    f"must be numeric, got "
                    f"{df.schema[c].dataType.simpleString()}"
                )

        def _neg(c: str) -> Column:
            # INTEGRAL negation wraps silently at Long.MIN_VALUE-class
            # values in non-ANSI mode (ADVICE r14, the mst.py edge):
            # try_multiply yields NULL on overflow in EVERY SQL mode,
            # and the prefilter raises LOUDLY on a null dim (nulls were
            # filtered before negation, so one there IS the overflow
            # sentinel). Fractional/decimal negation is exact — and
            # decimal must NOT take try_multiply (the multiply widens
            # precision, which can round at decimal(38,s)).
            if isinstance(df.schema[c].dataType, IntegralType):
                return F.try_multiply(F.col(c), F.lit(-1))
            return -F.col(c)

        orig_cols = list(df.columns)
        dims = [f"_nd{i}" for i in range(len(cols))]
        rows = rows.withColumns(
            {
                nd: (F.col(c) if d == "max" else _neg(c))
                for nd, c, d in zip(dims, cols, directions)
            }
        )
        # only the try_multiply'd dims can carry the overflow sentinel;
        # scoping the prefilter's null check to them keeps genuine
        # float NaNs in other dims behaving as before (ordered, kept)
        overflow_dims = [
            nd
            for nd, c, d in zip(dims, cols, directions)
            if d == "min"
            and isinstance(df.schema[c].dataType, IntegralType)
        ]
    else:
        dims = list(cols)
        overflow_dims = []
    cand = _local_skyline_df(
        rows, dims, local_keep_cap, overflow_dims=overflow_dims
    ).transform(materialize)
    # Second-level prefilter (VERDICT r14 #5): phase 1 prunes only
    # WITHIN each input partition, so survivors from different
    # partitions never see each other — on a wide cluster the candidate
    # set is ~P local frontiers and the O(S²) merge pays (P·f)². One
    # more local-skyline pass over the candidates, round-robin
    # REPARTITIONED so every batch mixes survivors from many original
    # partitions, prunes cross-partition dominance first — lossless by
    # the same transitivity argument (a dominated candidate is dominated
    # by a surviving one). Cheap: input is already ≤ the candidate set,
    # and batches are frontier-scale, not corpus-scale.
    merge_width = max(1, min(8, cand.rdd.getNumPartitions()))
    cand = _local_skyline_df(
        cand.repartition(merge_width), dims, local_keep_cap
    ).transform(materialize)
    n_cand = cand.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"pareto_frontier_nd: {n_cand} candidates survived the "
            f"local prefilter (> max_candidates={max_candidates}) — "
            "the frontier itself is corpus-scale (anticorrelated "
            "dimensions), not a shortlist; raise the budget knowingly "
            "or reduce dimensions"
        )
    rd = cand.select(
        *[F.col(c).alias(f"_r{i}") for i, c in enumerate(dims)]
    )
    ge = reduce(
        lambda a, b: a & b,
        [rd[f"_r{i}"] >= cand[c] for i, c in enumerate(dims)],
    )
    gt = reduce(
        lambda a, b: a | b,
        [rd[f"_r{i}"] > cand[c] for i, c in enumerate(dims)],
    )
    out = cand.join(F.broadcast(rd), ge & gt, "left_anti")
    if orig_cols is not None:  # drop the internal negated-dim columns
        out = out.select(*orig_cols)
    return out


def _local_skyline_df(
    rows: DataFrame,
    dims: list[str],
    local_keep_cap: int,
    *,
    overflow_dims: list[str] | None = None,
) -> DataFrame:
    """Phase-1 prefilter as an un-materialized plan (factored out so
    the plan audit can pin the MapInPandas + pruned-scan shape that
    the caller's localCheckpoint would otherwise truncate away).
    ``overflow_dims``: negated-integral dims whose nulls are
    try_multiply overflow sentinels — raised on LOUDLY (nulls were
    filtered before negation, so none can occur legitimately)."""
    schema = rows.schema
    ovf = list(overflow_dims or [])

    def _local_skyline(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if ovf and pdf[ovf].isna().any().any():
                raise ValueError(
                    "pareto_frontier_nd: a minimized integral "
                    "dimension overflowed on negation (type-minimum "
                    "value — ADVICE r14) — rescale or widen the column"
                )
            p = pdf.sort_values(
                dims, ascending=[False] * len(dims), kind="mergesort"
            ).reset_index(drop=True)
            vals = p[dims].to_numpy(dtype=object)
            # preallocated kept buffer: re-materializing vals[kept] on
            # every append would be O(K²·d) per batch (the r14 review
            # finding) — filling rows in place keeps it O(K·d)
            buf = np.empty(
                (min(local_keep_cap, len(p)), vals.shape[1]),
                dtype=object,
            )
            kept: list[int] = []
            passthrough = len(p)  # rows from here on pass unfiltered
            for i in range(len(p)):
                if len(kept) >= local_keep_cap:
                    passthrough = i
                    break
                if kept:
                    v = vals[i]
                    k_np = buf[: len(kept)]
                    ge = (k_np >= v).all(axis=1)
                    gt = (k_np > v).any(axis=1)
                    if bool((ge & gt).any()):
                        continue
                buf[len(kept)] = vals[i]
                kept.append(i)
            idx = kept + list(range(passthrough, len(p)))
            yield p.iloc[idx]

    return rows.mapInPandas(_local_skyline, schema)
