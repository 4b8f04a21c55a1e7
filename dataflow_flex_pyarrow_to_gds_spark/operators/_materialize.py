"""Lineage-AND-stats truncation for iterative DataFrame loops (r15).

``localCheckpoint(eager=True)`` truncates *lineage* but Spark 4's
``LogicalRDD.fromDataset`` (``sql/execution/ExistingRDD.scala``,
``rewriteStatsAndConstraints``) deliberately CARRIES the optimized
plan's estimated ``Statistics`` onto the checkpoint node, so the next
round's size estimate builds on the previous round's — and
``SizeInBytesOnlyStatsPlanVisitor.visitJoin`` estimates a join as the
PRODUCT of its children's ``sizeInBytes``. Any round-iterated
SELF-join therefore roughly SQUARES the carried estimate per round:
after K checkpointed self-join rounds the carried BigInt is
``S^(2^K)`` — 2^K·digits(S) decimal digits. Harmless at unit-test
round counts; at scale-dependent round counts (the biconnectivity
sparse table runs ⌈log₂ V⌉ levels) the driver ends up spending HOURS
inside ``BigInteger.multiplyToomCook3`` during stats estimation
(``InjectRuntimeFilter``/``canBroadcastBySize``), single-threaded,
before ``java.math.BigInteger`` finally throws
``ArithmeticException: BigInteger would overflow supported range``.
Observed live on the 25× bridges replica (500k nodes → 19 sparse
levels); jstack pinned the spin to exactly this path.

:func:`materialize` is the repo-wide fix: eager localCheckpoint (pay
the materialization, truncate lineage) followed by re-wrapping the
checkpointed ``RDD[InternalRow]`` in a FRESH ``LogicalRDD`` via
``SparkSession.internalCreateDataFrame`` — which carries NO stats, so
the node reads as ``spark.sql.defaultSizeInBytes`` and every round's
stats estimation stays constant-size (measured: 19 digits forever vs
968 digits after just 8 self-join rounds). Estimation-quality
trade-off: none in practice — the compounded estimate it replaces was
astronomically WORSE (products of products), and both it and the
default disable auto-broadcast equally; every deliberate broadcast in
this repo is an explicit ``F.broadcast`` hint, which stats never
override.

``internalCreateDataFrame`` is ``private[sql]`` in Scala, which
compiles to a public JVM method — reachable from py4j, but a Spark
upgrade could move it, so the helper degrades LOUDLY-BUT-SOFTLY: one
``warnings.warn`` per process and plain localCheckpoint behavior
(correct, just re-exposed to the compounding pathology).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_WARNED = False


def materialize_count(df: DataFrame) -> tuple[DataFrame, int]:
    """:func:`materialize`, but the action that materializes the
    checkpoint IS a ``count()`` whose value is returned — ONE Spark job
    for checkpoint + row count instead of the two an iterative loop
    pays when it probes emptiness/size after checkpointing (r15, guide
    §1.2/§2.4: the probe was a whole extra driver-coordinated job per
    round, and in local mode per-job overhead is the floor cost of
    every iterative operator).

    Same stats/lineage truncation contract as :func:`materialize`; the
    loud-but-soft fallback pays the extra count job but stays correct.
    """
    global _WARNED
    try:
        # eager=False: Dataset.localCheckpoint row-COPIES the internal
        # RDD (UnsafeRows are buffer-reused per partition — caching
        # them un-copied aliases every row in a partition to the last
        # one) and MARKS it for local checkpointing without running the
        # materializing count; our count below is that action.
        ck = df.localCheckpoint(eager=False)
        jdf = ck._jdf
        spark = ck.sparkSession
        jrdd = jdf.queryExecution().toRdd()
        n = jrdd.count()  # the materializing action — count for free
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        return _CDF(fresh, spark), int(n)
    except Exception as exc:  # noqa: BLE001 — private-API drift guard
        if not _WARNED:
            _WARNED = True
            warnings.warn(
                "materialize_count: fused checkpoint+count unavailable "
                f"({exc!r}); falling back to localCheckpoint + a "
                "separate count job per loop round",
                RuntimeWarning,
                stacklevel=2,
            )
        ck = df.localCheckpoint(eager=True)
        return ck, ck.count()


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` (localCheckpoint) and return a frame
    whose logical plan carries neither lineage NOR compounded size
    statistics. Drop-in for ``.localCheckpoint(eager=True)`` in
    iterative loops — chain as ``.transform(materialize)``."""
    ck = df.localCheckpoint(eager=True)
    global _WARNED
    try:
        jdf = ck._jdf
        spark = ck.sparkSession
        jrdd = jdf.queryExecution().toRdd()
        fresh = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        return _CDF(fresh, spark)
    except Exception as exc:  # noqa: BLE001 — private-API drift guard
        if not _WARNED:
            _WARNED = True
            warnings.warn(
                "materialize: stats truncation unavailable "
                f"({exc!r}); falling back to plain localCheckpoint — "
                "iterative self-join loops regain the compounding "
                "size-estimate pathology (see operators/_materialize.py)",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck
