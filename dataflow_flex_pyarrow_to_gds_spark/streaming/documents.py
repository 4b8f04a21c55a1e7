"""Streaming document-ingest curation.

A continuously-ingesting corpus (crawler output landing as files) runs
its arrival-time curation as a stream: quality-gate each document, scan
and redact PII, attach token stats — all STATELESS narrow expressions,
so the streaming plan is the batch plan under ``readStream`` and the
results match row-for-row with no watermark or state store involved
(asserted by the batch-parity test). Cross-document work (dedup,
boilerplate, packing) stays in scheduled batch passes over the
accumulated corpus — that split (stateless on arrival, corpus-wide in
batch) is how production ingest pipelines are actually layered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def curate_documents_batch(docs: DataFrame) -> DataFrame:
    """The arrival-time curation pass as a batch expression:
    ``(doc_id, source, n_tokens, n_pii, keep, text_redacted)`` where
    ``keep`` = Gopher rules AND pii-free-after-redaction is not
    required (redaction handles PII; the gate is quality-only).
    One narrow projection chain — no shuffle, no UDF.
    """
    from ..operators.pii import PATTERNS, pii_count_col, redact_pii
    from ..operators.quality import with_gopher_keep
    from ..operators.text import token_count_col

    gated = with_gopher_keep(docs, "text")
    red = redact_pii(gated, "text", out_col="text_redacted")
    n_pii = None
    for kind in PATTERNS:
        c = pii_count_col(F.col("text"), kind)
        n_pii = c if n_pii is None else n_pii + c
    return red.select(
        "doc_id",
        "source",
        token_count_col(F.col("text")).alias("n_tokens"),
        n_pii.alias("n_pii"),
        "keep",
        "text_redacted",
    )


def curate_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin: the same stateless expression chain over a file
    stream. Append-mode safe (no aggregation), so micro-batch output
    equals the batch run over the same files."""
    docs = spark.readStream.schema(DOCS_SCHEMA).parquet(path)
    return curate_documents_batch(docs)
