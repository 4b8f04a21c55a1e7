"""Corpus snapshot comparison — the bookkeeping operator every
incremental pipeline needs before it can BE incremental: given two
versions of a corpus, classify every document as added / removed /
changed so downstream stages (dedup index maintenance, re-embedding,
re-tokenization) run on the delta only.

The reference has no versioning notion (it re-streams the whole input,
``pipeline.py:48-96``); this follows the repo's incremental-dedup stance
(``dedup.py`` ``incremental_near_dup_filter``): per-run cost must be
proportional to the delta, and the operators that make that possible are
first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64_col


def apply_corpus_delta(
    base: DataFrame,
    delta: DataFrame,
    *,
    id_col: str = "doc_id",
    op_col: str = "op",
    broadcast_delta: bool = True,
) -> DataFrame:
    """Produce the next corpus version from ``base`` plus a ``delta``
    table of ``upsert`` / ``delete`` operations — the write side of
    :func:`corpus_diff` and the MERGE-INTO shape every incremental
    pipeline needs: yesterday's snapshot + today's changes → today's
    snapshot, without rewriting rows that didn't change hands.

    ``delta`` carries the base's columns plus ``op_col`` ∈
    {'upsert', 'delete'}: upserts replace-or-insert their id, deletes
    drop it. Ids must be unique within the delta (the corpus-key
    contract; a duplicated delta id would make the result
    order-dependent — guarded). Unknown op values raise rather than
    silently passing through.

    Scale shape: the delta is the small side by definition (a day's
    changes vs a 100-TB corpus), so with ``broadcast_delta`` the
    delta's id set BROADCASTS into a hash anti-join and the base never
    shuffles — the whole merge is one narrow pass over the corpus plus
    a union of the (tiny) upsert set. Set ``broadcast_delta=False``
    only when the delta itself is shuffle-worthy; then the anti-join
    keys on 8-byte ids and base text rides exactly one shuffle.
    """
    extra = set(delta.columns) - set(base.columns) - {op_col}
    missing = set(base.columns) - set(delta.columns)
    if extra or missing or op_col not in delta.columns:
        raise ValueError(
            "apply_corpus_delta: delta columns must be base columns + "
            f"'{op_col}' (extra={sorted(extra)}, missing={sorted(missing)})"
        )
    bad_op = delta.filter(~F.col(op_col).isin("upsert", "delete"))
    if bad_op.limit(1).count() > 0:
        raise ValueError("apply_corpus_delta: op must be upsert|delete")
    dup = (
        delta.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
    )
    if dup.limit(1).count() > 0:
        raise ValueError("apply_corpus_delta: delta ids must be unique")
    ids = delta.select(id_col).distinct()
    if broadcast_delta:
        ids = F.broadcast(ids)
    kept = base.join(ids, id_col, "left_anti")
    upserts = delta.filter(F.col(op_col) == "upsert").select(*base.columns)
    return kept.unionByName(upserts)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    include_unchanged: bool = False,
) -> DataFrame:
    """``(id, status)`` with status ∈ added | removed | changed (and
    unchanged, opt-in) comparing two corpus snapshots by CONTENT
    fingerprint.

    Scale shape: each side reduces to 17-B ``(id, fingerprint)`` rows in
    a narrow pass — document text never rides the full-outer join's
    shuffle — and the default output is |delta|-sized: diffing a 100-TB
    corpus against yesterday moves ~2 × 16 B × |corpus| through one
    shuffle and emits only what changed. The fingerprint is the portable
    md5-derived 64-bit hash (:func:`~.dedup.portable_hash64_col`), so an
    external system (or the DuckDB oracle, which compares raw text —
    an INDEPENDENT formulation equivalent up to md5 collision) agrees
    on every status. Null and empty text hash identically (coalesce) —
    presence is tracked by a marker column, not fingerprint nullness,
    so a null-text document present on both sides is 'unchanged', not
    phantom-'added'. Ids must be unique within each snapshot (the
    corpus-key contract everywhere in this repo); duplicate ids would
    fan the full-outer join out multiplicatively.
    """

    def side(df: DataFrame, fp: str, mark: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("_id"),
            portable_hash64_col(
                F.coalesce(F.col(text_col), F.lit(""))
            ).alias(fp),
            F.lit(1).alias(mark),
        )

    j = side(old, "_fo", "_po").join(
        side(new, "_fn", "_pn"), "_id", "full_outer"
    )
    status: Column = (
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(F.col("_fo") != F.col("_fn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col("_id").alias(id_col), status.alias("status"))
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
