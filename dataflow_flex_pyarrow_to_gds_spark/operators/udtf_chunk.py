"""Python UDTF surface (SURVEY §2.10) — the one Spark UDF kind the repo
had not yet exercised natively: the reference's Beam DoFn generators
(``_dofn.py:50-202``) are 1→N row expanders, and Spark 4's ``@udtf`` is
the direct modern analog (the repo's production expanders use
``posexplode``/``mapInArrow``/``mapInPandas`` instead — JVM-side or
Arrow-batched, the fast paths).

``chunk_documents_udtf`` re-expresses :func:`~.text.chunk_documents`
through that boundary: an API-SURFACE demonstration row, deliberately
row-at-a-time Python (the documented slow path — it is held to the SAME
DuckDB oracle as the vectorized operator, and a parity test pins the
two outputs row-for-row, so the demonstration costs no correctness).
Production chunking stays on the narrow JVM pass.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


def make_chunk_udtf(chunk_tokens: int, overlap: int, *, use_arrow: bool = False):
    """Build the UDTF class for a (chunk_tokens, overlap) config —
    parameters are baked into the class because UDTF constructors take
    no user arguments at call sites. Semantics mirror
    ``chunk_documents`` exactly: lowercase whitespace words, windows of
    ``chunk_tokens`` every ``chunk_tokens - overlap`` words, every
    chunk after the first contributes ≥1 new token, empty/null docs
    emit nothing.

    ``use_arrow=True`` builds the Spark 4 ARROW-OPTIMIZED variant
    (``@udtf(useArrow=True)``): same eval contract, but rows cross the
    Python boundary in Arrow batches instead of pickled one-at-a-time
    — the sanctioned fast(er) path when a UDTF is unavoidable. Output
    is bit-identical (parity-tested and held to the same oracle)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap

    @udtf(
        returnType=(
            "doc_id bigint, chunk_id bigint, n_tokens bigint, "
            "text_chunk string"
        ),
        useArrow=use_arrow,
    )
    class ChunkDocs:
        def eval(self, doc_id, text):  # noqa: ANN001 — UDTF contract
            if text is None:
                return
            # ASCII \s to mirror the JVM operator and the oracle: Java
            # regex \s is [ \t\n\x0b\f\r] while Python's default is
            # Unicode-aware (U+00A0 etc. would tokenize differently);
            # no strip() — empty tokens filter out anyway, and Python
            # strip() is Unicode-aware too
            words = [
                w
                for w in _re.split(r"\s+", text.lower(), flags=_re.ASCII)
                if w
            ]
            n = len(words)
            if n == 0:
                return
            n_chunks = max(n - overlap - 1, 0) // stride + 1
            for i in range(n_chunks):
                chunk = words[i * stride : i * stride + chunk_tokens]
                yield doc_id, i, len(chunk), " ".join(chunk)

    return ChunkDocs


def chunk_documents_udtf(
    spark: SparkSession,
    df: DataFrame,
    *,
    chunk_tokens: int,
    overlap: int = 0,
    use_arrow: bool = False,
) -> DataFrame:
    """Apply the chunking UDTF laterally to ``df``'s (doc_id, text).

    Registered + invoked through SQL ``LATERAL`` — the standard UDTF
    call shape. Temp views are session-scoped; the config-derived name
    only keeps same-session calls with DIFFERENT configs from clobbering
    each other (same-config calls overwrite the view, which is safe
    because ``spark.sql`` analyzes the LATERAL plan eagerly — a deferred
    sql() refactor would need per-call unique names). Scale note: each Python worker
    sees one row at a time (Arrow only batches the transport when
    ``spark.sql.execution.pythonUDTF.arrow.enabled`` is set) — this is
    the measured-slow path and exists to prove the boundary, not to
    run production chunking.
    """
    cls = make_chunk_udtf(chunk_tokens, overlap, use_arrow=use_arrow)
    fn = f"chunk_docs_{chunk_tokens}_{overlap}_{int(use_arrow)}"
    spark.udtf.register(fn, cls)
    view = f"_udtf_chunk_src_{chunk_tokens}_{overlap}_{int(use_arrow)}"
    df.select("doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT c.doc_id, c.chunk_id, c.n_tokens, c.text_chunk "
        f"FROM {view}, LATERAL {fn}(doc_id, text) AS c"
    )
