from .parquet import read_parquet_tagged, read_table, read_tables
from .bigquery import BigQuerySource, ParquetBackedBigQuerySource

__all__ = [
    "read_parquet_tagged",
    "read_table",
    "read_tables",
    "BigQuerySource",
    "ParquetBackedBigQuerySource",
]
