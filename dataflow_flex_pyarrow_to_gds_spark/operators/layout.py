"""Storage layout operators: hive partitioning + DPP, Z-order
clustering, small-file compaction.

The 100-TB fact-table pattern the bucketed-edge module
(:func:`~.graph_algo.write_bucketed_edges`) doesn't cover: a fact
table hive-PARTITIONED on a low-cardinality routing column (event
type, date, source) so that a join against a runtime-filtered
dimension scans only the surviving partition directories — Spark
inserts a ``dynamicpruningexpression`` into the fact scan's
``PartitionFilters`` and skips whole directories at execution time,
which no static predicate could do when the dimension's filter value
set is only known at runtime. At 100 TB this is the difference
between scanning the full fact table and scanning the 3 % of
partitions the dimension actually selects.

The reference has no storage-layout surface at all (it streams
Arrow batches out of Beam, ``neo4j_beam/_dofn.py``); this module owns
the materialization side the way ``write_bucketed_edges`` does for
bucketing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_table(
    spark,
    df: DataFrame,
    table: str,
    partition_col: str,
) -> DataFrame:
    """Persist ``df`` as a managed parquet table partitioned on
    ``partition_col`` and return the partitioned scan.

    Same contract and crash hygiene as
    :func:`~.graph_algo.write_bucketed_edges` (ADVICE r6): ``table``
    must be an unqualified name in the default database — the
    leftover cleanup derives the managed location as
    ``<warehouse.dir>/<lowercase name>``, valid only for that case and
    only on a plain local-path warehouse.

    The write repartitions BY THE PARTITION COLUMN first: without it
    every task holds a sliver of every partition value and the sink
    emits tasks × partitions small files (the
    ``write_token_shards``/bucketed-edge lesson).
    """
    if "." in table:
        raise ValueError(
            f"write_partitioned_table requires an unqualified table name "
            f"in the default database, got {table!r}"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    if wh.startswith("file:") or "://" not in wh:
        leftover = os.path.join(wh.removeprefix("file:"), table.lower())
        shutil.rmtree(leftover, ignore_errors=True)
    (
        df.repartition(F.col(partition_col))
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return spark.table(table)


def zorder_value(
    df: DataFrame, cols: list[str], *, bits: int = 16, out_col: str = "_z"
) -> DataFrame:
    """Add a Morton (Z-order) key interleaving the ranked bit patterns
    of ``cols`` — the multi-dimensional clustering key behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``: rows close in EVERY listed
    dimension get close z-values, so a range-partitioned, min/max-
    indexed layout skips files for predicates on ANY of the dimensions
    (a single-column sort can only serve its own column; at 100 TB
    "filter by date AND customer" against a date-sorted table reads
    everything the date filter leaves).

    Each column is affine-scaled to ``bits`` bits off its global
    min/max (one tiny aggregate, broadcast back — the SQ8 floor-based
    recipe, so the scaled codes are bit-identical on any engine), then
    the codes interleave bitwise: bit ``b`` of column ``i`` lands at
    position ``b·n + i``. Pure JVM shift/mask expressions — narrow,
    zero shuffle, no UDF; ``bits · len(cols)`` must fit a signed
    int64. NULLs rank lowest (scaled to 0), a degenerate min==max
    column contributes 0 — both documented, both mirrored in the
    oracle twin.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_value: need at least one column")
    if bits * n > 62:
        raise ValueError(
            f"zorder_value: {bits} bits x {n} cols exceeds int64"
        )
    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    )
    top = (1 << bits) - 1
    scaled = df.crossJoin(F.broadcast(stats))
    codes = []
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        code = F.when(
            F.col(c).isNull() | (mx <= mn), F.lit(0).cast("long")
        ).otherwise(
            F.floor(
                (F.col(c).cast("double") - mn) * F.lit(float(top)) / (mx - mn)
            ).cast("long")
        )
        codes.append(code)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, code in enumerate(codes):
            z = z + F.shiftleft(
                F.shiftright(code, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return scaled.select(*df.columns, z.alias(out_col))


def write_zorder_table(
    spark,
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Persist ``df`` as ``files`` parquet files range-partitioned and
    sorted by the Z-order key of ``cols``, and return the re-opened
    scan.

    Because the layout clusters on the interleaved key, each file's
    parquet footer covers a tight min/max RECTANGLE in every listed
    dimension — so both Spark's row-group pushdown and any
    footer-stats planner skip ~√(selectivity) of the files for a range
    predicate on EITHER column (measured in tests against a
    single-column-sorted control where the second dimension's filter
    skips nothing). One range shuffle (``files`` partitions) + an
    in-partition sort; the z column itself is dropped from the stored
    table — it is layout, not data.
    """
    zdf = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return spark.read.parquet(path)


def compact_table(
    spark,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ``ceil(total_bytes /
    target_file_bytes)`` files and return the new file count — the
    small-file remediation every long-running ingest needs: streaming
    epochs, per-task sinks, and incremental merges each leave files far
    below the scan-efficient size, and at 100 TB a million 1-MB files
    turns scan planning and open() overhead into the bottleneck
    (HDFS/S3 listing + footer reads dominate the query).

    Safe rewrite order: write to a sibling temp dir, then swap — never
    overwrite a directory while a job is still reading it. Row
    contents are untouched (compaction is layout, not data — asserted
    by tests); the coalesce is a NARROW repartitioning (no shuffle)
    since it only concatenates partitions.

    Scope guard: ``path`` must be a FLAT parquet directory. A
    hive-partitioned layout (``col=value`` subdirectories, e.g.
    :func:`write_partitioned_table` output) would be silently
    flattened by a whole-tree rewrite — compact each partition
    directory individually instead; refused loudly here.
    """
    import math

    part_dirs = [
        d
        for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d)) and "=" in d
    ]
    if part_dirs:
        raise ValueError(
            f"compact_table: {path} is hive-partitioned "
            f"({part_dirs[:3]}…) — compact each partition directory "
            f"individually, a whole-tree rewrite would flatten the layout"
        )
    sizes = [
        os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    if not sizes:
        raise ValueError(f"compact_table: no parquet files under {path}")
    n_files = max(1, math.ceil(sum(sizes) / target_file_bytes))
    tmp = path.rstrip("/") + ".compacting.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    spark.read.parquet(path).coalesce(n_files).write.mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
