"""Linear-interpolation time-series resampling — the gap-fill twin of
:func:`~..streaming.events.resample_locf`.

LOCF answers "what was the state on day d" (step signals: balances,
settings); linear interpolation answers "what was the level on day d"
for quantities that move continuously between observations (prices,
meter readings, sensor levels) — the other half of the standard
time-series regularization toolbox (pandas ``interpolate`` /
``ffill``). Same daily grid, same per-day representative convention
(the (ts, order)-max event of the day), same null-is-not-an-
observation contract.

Exactness: observed days emit ``floor(value·scale)`` in integer
micro-units; an interior gap day d between the previous observed day
p (value v_p) and the next observed day n (value v_n) emits::

    fp(d) = fp(p) + sign · (|fp(n) − fp(p)| · (d − p)) div (n − p)

with a SIGN-SPLIT truncating division (the scale_properties
discipline) because Spark's ``div`` truncates toward zero while
DuckDB's ``//`` floors — they differ on negative slopes, and the
sign split makes both engines compute the identical integer. The
grid spans [first obs, last obs] per key, so every gap day has both
neighbors by construction — no extrapolation policy to get wrong.

Scale shape (the LOCF scaffold): per-day representatives from ONE
partial-agg ``max(struct)`` (bursts collapse map-side — never a
per-event window), the grid exploded from a 2-column bounds row, and
four ``last/first(ignorenulls)`` windows over the ALREADY-REGULARIZED
daily grid, all partitioned by key — a hot key costs its day span,
not its event count. Values beyond the neighbor lookups never move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def day_representatives(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """→ ``(_k, day, _ts, _o, _v)``: each (key, day)'s
    (ts, order)-max observation — the RE-REDUCIBLE partial the
    streaming store persists (r14, VERDICT r13 #7): ``max(struct)`` is
    associative and commutative, so per-micro-batch representatives
    re-reduce across batches to exactly the single-pass representative,
    however the stream was chopped and however late a day's events
    arrive. Null values are not observations (the shared contract)."""
    day = F.to_date(F.col(ts_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("_k"),
            day.alias("day"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(order_col).alias("o"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("_s"),
        )
        .groupBy("_k", "day")
        .agg(F.max("_s").alias("_s"))
        .select(
            "_k",
            "day",
            F.col("_s.ts").alias("_ts"),
            F.col("_s.o").alias("_o"),
            F.col("_s.v").alias("_v"),
        )
    )


def interp_from_representatives(
    reps: DataFrame, key_col: str, *, scale: int = 10**6
) -> DataFrame:
    """The interpolation core over an already-reduced representative
    table (:func:`day_representatives`' schema) — shared verbatim by
    the batch operator and the streaming store's merge-on-read rollup,
    so the two paths cannot drift. See :func:`resample_interp`."""
    from pyspark.sql.window import Window

    if scale < 1:
        raise ValueError(
            f"resample_interp: scale must be >= 1, got {scale}"
        )
    obs = reps.select(
        "_k",
        "day",
        F.floor(F.col("_v") * F.lit(float(scale)))
        .cast("long")
        .alias("_fp"),
    )
    bounds = obs.groupBy("_k").agg(
        F.min("day").alias("_mn"), F.max("day").alias("_mx")
    )
    grid = bounds.select(
        "_k", F.explode(F.sequence("_mn", "_mx")).alias("day")
    )
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("_k")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("_fp").isNotNull(), F.col("day"))
    g = (
        grid.join(obs, ["_k", "day"], "left_outer")
        .select(
            "_k",
            "day",
            "_fp",
            F.last("_fp", ignorenulls=True).over(w_prev).alias("_pv"),
            F.last(obs_day, ignorenulls=True).over(w_prev).alias("_pd"),
            F.first("_fp", ignorenulls=True).over(w_next).alias("_nv"),
            F.first(obs_day, ignorenulls=True).over(w_next).alias("_nd"),
        )
    )
    num = (F.col("_nv") - F.col("_pv")) * F.datediff("day", "_pd")
    # sign-split truncating division: Spark div truncates toward zero,
    # DuckDB // floors — they disagree on negative slopes; splitting
    # the sign makes both engines compute the identical integer. The
    # div only evaluates on GAP days (the CASE below short-circuits
    # observed days), where datediff(_nd, _pd) >= 2 by construction.
    absq = F.expr(
        "abs((_nv - _pv) * datediff(day, _pd)) div datediff(_nd, _pd)"
    )
    step = F.when(num < 0, -absq).otherwise(absq)
    interp = F.when(F.col("_fp").isNotNull(), F.col("_fp")).otherwise(
        F.col("_pv") + step
    )
    return g.select(
        F.col("_k").alias(key_col),
        F.col("day").cast("timestamp").alias("day"),
        interp.cast("long").alias("value_interp_fp"),
        F.col("_fp").isNotNull().alias("is_observed"),
    )


def resample_interp(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_col: str,
    *,
    scale: int = 10**6,
) -> DataFrame:
    """→ ``(key, day, value_interp_fp, is_observed)`` for every day in
    each key's [first obs, last obs] span: observed days carry
    ``floor(value·scale)`` exactly, gap days the sign-split linear
    interpolation between their observed neighbors (module docstring).
    ``day`` is a midnight TIMESTAMP (the resample_locf dtype-identity
    convention). Composition of :func:`day_representatives` and
    :func:`interp_from_representatives` — the streaming twin
    (:func:`~..streaming.events.interp_store_rollup`) rides the same
    two pieces around a persisted store."""
    return interp_from_representatives(
        day_representatives(df, key_col, ts_col, value_col, order_col),
        key_col,
        scale=scale,
    )
