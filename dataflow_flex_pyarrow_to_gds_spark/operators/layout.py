"""Partitioned table layout + dynamic partition pruning (DPP).

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
