"""Temporal joins Spark lacks natively: as-of and range (interval) joins.

Both are expressed as compositions of built-in operators (SURVEY's custom-
operator preference order: composition first, Pandas UDF only if semantics
demand it — they don't here):

- **As-of join** (latest right row with ts ≤ left ts, per key): the
  union + ordered-window + last-ignoring-nulls pattern. One shuffle on
  (key), one sort — same cost shape as a sort-merge join, no UDF, no
  per-group pandas. This is the scalable form of ``pd.merge_asof``.
- **Range join** (left ts within [right start, right end]): bucketize the
  time axis, equi-join on (key, bucket), exact filter. Turns an
  unbounded-nested-loop plan into a bounded equi-join with
  ``range/bucket_width`` fan-out per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the matched right row, matching on
    ``by``. Left rows with no match keep nulls (LEFT OUTER asof).

    ``direction`` mirrors ``pd.merge_asof``:

    - ``backward`` (default): latest right row with ``right.on <=
      left.on`` — DuckDB ``ASOF JOIN`` ``>=`` semantics;
    - ``forward``: earliest right row with ``right.on >= left.on``;
    - ``nearest``: whichever of the two is closer in ``on`` (tie →
      backward, like pandas).

    All directions are the same union + ordered-window pass (forward is
    the backward fill over the reversed ordering; nearest computes both
    fills and picks per row) — no extra shuffle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    lcols = left.columns
    # All right columns ride in ONE struct filled by ONE last(ignorenulls):
    # per-column fills would back-fill a null field of the matched row from
    # an older right row, mixing columns of different right rows. The struct
    # itself is non-null for every right row, so genuine nulls survive.
    # ``__on`` rides along for the nearest-direction distance comparison.
    r_aligned = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(on).alias("__on"), *[F.col(c) for c in right_cols]
        ).alias("_rrow"),
        F.lit(None).alias("_lrow"),
    )
    l_aligned = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_aligned.schema["_rrow"].dataType).alias("_rrow"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
    )
    r_aligned = r_aligned.withColumn(
        "_lrow", F.lit(None).cast(l_aligned.schema["_lrow"].dataType)
    )
    unioned = l_aligned.unionByName(r_aligned)

    # right rows sort before left rows at equal `on` in BOTH orderings, so
    # ties match in every direction
    w_back = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if direction == "backward":
        match = F.last("_rrow", ignorenulls=True).over(w_back)
    elif direction == "forward":
        match = F.last("_rrow", ignorenulls=True).over(w_fwd)
    else:
        b = F.last("_rrow", ignorenulls=True).over(w_back)
        f = F.last("_rrow", ignorenulls=True).over(w_fwd)
        dist_b = F.col(on).cast("double") - b["__on"].cast("double")
        dist_f = f["__on"].cast("double") - F.col(on).cast("double")
        match = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            .when(dist_f < dist_b, f)
            .otherwise(b)
        )
    filled = unioned.withColumn("_match", match)
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
            *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_start: str,
    right_end: str,
    by: str | None = None,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Rows of left × right where ``right_start <= left_ts <= right_end``
    (optionally also matching on ``by``).

    The left side explodes to its single bucket; the right side explodes
    to every bucket its interval overlaps; the equi-join on (bucket [+by])
    bounds the comparison set, and the exact predicate filters within.
    Pick ``bucket_seconds`` ≈ the typical interval length: fan-out stays
    O(interval/bucket + 1) while each bucket pairs only co-bucketed rows.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_seconds).cast("long")
    rb_start = F.floor(F.unix_timestamp(F.col(right_start)) / bucket_seconds).cast("long")
    rb_end = F.floor(F.unix_timestamp(F.col(right_end)) / bucket_seconds).cast("long")

    l = left.withColumn("_bucket", lb)
    # An inverted interval (end < start) can never satisfy the exact
    # predicate, but F.sequence would happily generate a *descending*
    # bucket range for it — wasted fan-out that only dies in the filter.
    # Explode an empty array instead: invalid intervals drop here, cheaply.
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.when(rb_end >= rb_start, F.sequence(rb_start, rb_end)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )

    join_keys = ["_bucket"] + ([by] if by else [])
    out = l.join(r, join_keys)
    return out.filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    ).drop("_bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    left_start: str,
    left_end: str,
    right_id: str,
    right_start: str,
    right_end: str,
    keys: tuple[str, ...] | list[str] = (),
    bucket: int = 16,
) -> DataFrame:
    """Interval × interval OVERLAP join → one row per pair whose closed
    ranges intersect: ``(keys…, left_id, right_id, overlap_start,
    overlap_end)`` with ``overlap_* = [max(starts), min(ends)]``. The
    temporal sibling of :func:`range_join` (point-in-interval) and
    :func:`asof_join` (nearest-at-or-before) — the shape behind
    "which promotions ran while this order was open", concurrent
    sessions, conflicting reservations.

    Bounds are INTEGER columns (days-since-epoch, unix seconds — the
    caller picks the unit; a domain fact, like the scaler fixed-point
    convention). Both engines then agree exactly and the full pair set
    hash-matches.

    Scale shape — the classic bucketized overlap join, because Spark's
    only native plan for a pure inequality ON-clause is a nested loop:
    each interval explodes to the ``bucket``-width blocks it covers,
    candidates come from ONE equi-join on (keys…, block), and each
    genuine pair is emitted EXACTLY ONCE — not deduped but filtered to
    the FIRST SHARED block, ``block == max(start_l, start_r) div
    bucket`` (the pair's earliest co-covered block; a distinct would
    shuffle pair-sized data, the filter is free). Fan-out per row is
    ``span/bucket + 1`` — size ``bucket`` to the TYPICAL interval so
    the explode is a small constant; degenerate open-ended intervals
    should be capped by the caller before the join.
    """
    if bucket < 1:
        raise ValueError(
            f"interval_overlap_join: bucket must be >= 1, got {bucket}"
        )
    ks = list(keys)

    def blocks(df, ident, start, end, side):
        if ident in ks:
            raise ValueError(
                f"interval_overlap_join: id column {ident} collides "
                "with a join key"
            )
        # a reversed interval (end < start) would explode a DESCENDING
        # block sequence and silently mis-join — raise loud instead
        lo = F.expr(
            f"CASE WHEN CAST({end} AS BIGINT) < CAST({start} AS BIGINT) "
            f"THEN CAST(raise_error('interval_overlap_join: interval "
            f"with end < start on the {side} side') AS BIGINT) "
            f"ELSE CAST({start} AS BIGINT) div {bucket} END"
        )
        return df.select(
            *ks,
            F.col(ident).alias(f"_{side}id"),
            F.col(start).cast("long").alias(f"_{side}s"),
            F.col(end).cast("long").alias(f"_{side}e"),
            F.explode(
                F.sequence(
                    lo,
                    F.expr(f"CAST({end} AS BIGINT) div {bucket}"),
                )
            ).alias("_blk"),
        )

    lb = blocks(left, left_id, left_start, left_end, "l")
    rb = blocks(right, right_id, right_start, right_end, "r")
    return (
        lb.join(rb, [*ks, "_blk"])
        .filter(
            (F.col("_ls") <= F.col("_re"))
            & (F.col("_rs") <= F.col("_le"))
            & (
                F.col("_blk")
                == F.expr(
                    f"greatest(_ls, _rs) div {bucket}"
                )
            )
        )
        .select(
            *ks,
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.greatest("_ls", "_rs").alias("overlap_start"),
            F.least("_le", "_re").alias("overlap_end"),
        )
    )
