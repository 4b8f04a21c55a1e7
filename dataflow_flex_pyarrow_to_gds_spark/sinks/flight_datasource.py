"""``df.write.format("gds_flight")`` — the Flight sink as a PySpark 4
Python DataSource (V2 writer surface).

Same wire behavior as :class:`~.flight_sink.FlightGraphSink` (coalesced
Arrow batches → ``do_put`` per partition, per-partition connections), but
exposed through the idiomatic writer API so any Spark job can target a
GDS Flight endpoint without importing this package's pipeline classes:

    spark.dataSource.register(GDSFlightDataSource)
    (df.write.format("gds_flight")
       .option("location", "grpc://host:8491")
       .option("path", "node/customer")     # Flight descriptor path
       .option("chunk_rows", "50000")
       .mode("append").save())

Scale notes: the writer is an ``DataSourceArrowWriter`` — Spark hands each
partition to ``write`` as Arrow record batches with zero row-level Python
cost; batches are coalesced to ≥chunk_rows before each PUT (GDS ingest
throughput depends on batch size). Connections are created inside
``write`` on the executor: the writer instance is pickled to executors and
must never capture a live client (reference ``_dofn.py:58`` discipline).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    WriterCommitMessage,
)

from .flight_sink import DEFAULT_CHUNK_ROWS, coalesce_batches


@dataclass
class FlightCommit(WriterCommitMessage):
    rows: int
    nbytes: int
    puts: int


class GDSFlightWriter(DataSourceArrowWriter):
    def __init__(self, options: dict):
        self.location = options.get("location", "grpc://localhost:8491")
        self.path = options.get("path", "data")
        self.chunk_rows = int(options.get("chunk_rows", DEFAULT_CHUNK_ROWS))

    def write(self, iterator: Iterator[pa.RecordBatch]) -> FlightCommit:
        import pyarrow.flight as flight

        client = flight.connect(self.location)
        try:
            rows = nbytes = puts = 0
            desc = flight.FlightDescriptor.for_path(self.path)
            for table in coalesce_batches(iterator, self.chunk_rows):
                writer, _ = client.do_put(desc, table.schema)
                writer.write_table(table)
                writer.close()
                rows += table.num_rows
                nbytes += table.nbytes
                puts += 1
            return FlightCommit(rows=rows, nbytes=nbytes, puts=puts)
        finally:
            client.close()


class GDSFlightDataSource(DataSource):
    """Register with ``spark.dataSource.register(GDSFlightDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "gds_flight"

    def writer(self, schema, overwrite: bool) -> GDSFlightWriter:
        if overwrite:
            raise ValueError(
                "gds_flight supports append only (GDS import streams are "
                "not truncatable); use mode('append')"
            )
        return GDSFlightWriter(self.options)


def totals(messages: list[FlightCommit]) -> tuple[int, int, int]:
    """Aggregate per-partition commit messages → (rows, nbytes, puts)."""
    return (
        sum(m.rows for m in messages),
        sum(m.nbytes for m in messages),
        sum(m.puts for m in messages),
    )
