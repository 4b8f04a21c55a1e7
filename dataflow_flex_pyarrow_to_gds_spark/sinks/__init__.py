from .base import GraphSink, WriteResult, sum_results
from .parquet_sink import ParquetGraphSink

__all__ = ["GraphSink", "WriteResult", "sum_results", "ParquetGraphSink"]
