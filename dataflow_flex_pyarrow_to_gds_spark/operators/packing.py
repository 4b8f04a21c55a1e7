"""Sequence packing for LLM pre-training: concat-and-chunk assignment of
documents to fixed-length training sequences, built on a distributed
prefix sum.

Training pipelines concatenate the tokenized corpus in a deterministic
order and split it into fixed ``seq_len`` windows (the GPT-style
"concat and chunk" packing). The batch-side question a pipeline must
answer per document is: *which output sequences does this document land
in?* — i.e. its global token start offset, which is a prefix sum over
the corpus in packing order.

A naive Spark window (``Window.orderBy(...)`` with no partition spec)
computes that prefix sum through a SINGLE task — a non-starter at
100 TB. :func:`global_prefix_sum` implements the classic two-phase
scan instead:

1. split the packing order into ``n_buckets`` contiguous ranges
   (boundaries from one cheap ``percentile_approx`` pass, embedded as
   plan literals — boundary *quality* only affects balance, never
   correctness, because bucketing is a pure deterministic CASE over the
   order key);
2. per-bucket totals via a partially-aggregated ``groupBy`` (tiny:
   ``n_buckets`` rows), cumulated into per-bucket offsets with a
   driver-scale window;
3. one corpus shuffle partitioned by bucket, a per-bucket cumulative
   window (parallel across buckets), plus the broadcast-joined bucket
   offset.

Every stage is built-in-expression JVM work; the only driver action is
collecting ``n_buckets - 1`` boundary literals (same gate-free pattern
as the k-means centroid collect in similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def bucket_case(order: Column, bounds: list) -> Column:
    """Contiguous-range bucket id via one chained CASE (codegen-friendly;
    an ``aggregate``/``filter`` HOF over a boundary array would run
    interpreted per row — the measured trap ARCHITECTURE.md documents
    for the LSH collision filters)."""
    if not bounds:
        return F.lit(0)
    case = F.when(order <= F.lit(bounds[0]), F.lit(0))
    for i, b in enumerate(bounds[1:], start=1):
        case = case.when(order <= F.lit(b), F.lit(i))
    return case.otherwise(F.lit(len(bounds)))


def range_bucketed(
    df: DataFrame,
    order: Column,
    *,
    n_buckets: int,
    bucket_col: str = "_pb",
) -> DataFrame:
    """Tag each row with its contiguous-range bucket id over ``order``:
    one ``percentile_approx`` sketch pass collects ≤ ``n_buckets - 1``
    boundary literals (deduped — repeated boundaries only make empty
    buckets), then one chained CASE assigns buckets. Boundary quality
    skews bucket BALANCE only, never which order positions exist —
    ranges stay contiguous in the order key and ties land in one bucket
    via the ``<=`` rule. EAGER: runs the sketch at call time.

    The shared scaffold behind :func:`global_prefix_sum`,
    :func:`~.sampling.training_order`, and any other
    distributed-scan operator (promoted from their inline copies,
    ADVICE r08 — one implementation, no drift).
    """
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        df.select(
            F.percentile_approx(order, qs, 10_000).alias("b")
        ).first()["b"]
        if n_buckets > 1
        else []
    )
    uniq: list = []
    for b in bounds or []:
        if not uniq or b != uniq[-1]:
            uniq.append(b)
    return df.withColumn(bucket_col, bucket_case(order, uniq))


def bucket_offsets(
    bucketed: DataFrame,
    value: Column,
    *,
    bucket_col: str = "_pb",
    out_col: str = "_off",
) -> DataFrame:
    """``(bucket_col, out_col)`` — exclusive prefix over buckets of the
    per-bucket Σ``value``: a partially-aggregated groupBy down to
    ≤ ``n_buckets`` rows, then the ONE place a global window is right
    (driver-scale input). Broadcast-join the result back onto the
    bucketed rows."""
    sums = bucketed.groupBy(bucket_col).agg(F.sum(value).alias("_bs"))
    # constant partition spec over the ≤ n_buckets-row input: pmod(col, 1)
    # because a foldable literal is optimized out of the spec and the
    # "No Partition Defined" WindowExec warning would fire — that noise
    # must stay zero so a REAL unpartitioned window can't hide (r12 #5)
    w_off = (
        W.partitionBy(F.pmod(F.col(bucket_col), F.lit(1)))
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return sums.select(
        bucket_col,
        F.coalesce(F.sum("_bs").over(w_off), F.lit(0)).alias(out_col),
    )


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    *,
    out_col: str = "prefix_sum",
    n_buckets: int = 32,
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``value_col`` over the total order given
    by ``order_col`` (which must be non-null and unique — document ids
    qualify), without ever funnelling the corpus through one task.

    Adds ``out_col`` = sum of ``value_col`` over all rows strictly
    before this row in ``order_col`` order. ``order_col`` must be
    NUMERIC (``percentile_approx`` computes the range boundaries; hash
    a string key to int64 first). EAGER: collects the bucket
    boundaries (≤ ``n_buckets - 1`` literals) at call time.

    Scale shape: one ``percentile_approx`` scan, one tiny groupBy, ONE
    corpus shuffle (hash on the bucket id) with per-bucket windows that
    parallelize across buckets, and a broadcast join of the
    ``n_buckets``-row offset table. Boundary skew degrades balance only
    — any assignment of contiguous ranges yields the same prefix sum.
    """
    order = F.col(order_col)
    bucketed = range_bucketed(df, order, n_buckets=n_buckets)
    offsets = bucket_offsets(bucketed, F.col(value_col))
    w_local = (
        W.partitionBy("_pb")
        .orderBy(order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_pb")
        .withColumn(
            out_col,
            (
                F.coalesce(F.sum(value_col).over(w_local), F.lit(0))
                + F.col("_off")
            ).cast("long"),
        )
        .drop("_pb", "_off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    seq_len: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Concat-and-chunk packing manifest: for each document, the global
    token start offset and the range of fixed-length training sequences
    it occupies when the corpus is concatenated in ``id_col`` order and
    split every ``seq_len`` tokens.

    Output: ``(id, n_tokens, start_offset, first_seq, last_seq)`` with
    ``first_seq = start_offset div seq_len`` and ``last_seq`` the
    sequence holding the document's final token (empty documents pin
    both to the offset's sequence). Token counts are whitespace words
    (``quality.words_col`` — swap in a real tokenizer count upstream;
    the packing arithmetic is count-agnostic).

    Integer division stays in int64 (``div``), not float ``floor`` —
    token offsets at the 100 TB scale exceed the 2^53 doubles hold
    exactly.
    """
    from .quality import words_col

    base = df.select(
        F.col(id_col),
        F.size(words_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    pre = global_prefix_sum(
        base,
        "n_tokens",
        id_col,
        out_col="start_offset",
        n_buckets=n_buckets,
    )
    return pre.withColumn(
        "_last_tok",
        F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1,
    ).select(
        F.col(id_col),
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {int(seq_len)}").alias("first_seq"),
        F.expr(f"_last_tok div {int(seq_len)}").alias("last_seq"),
    )


def shard_by_token_budget(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget_tokens: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Assign every document to an output SHARD so that consecutive
    shards carry ~``budget_tokens`` tokens each — the write-side twin of
    :func:`pack_sequences`: training jobs shard their corpus by token
    mass, not row count (a shard of 10k long documents is not the same
    unit of work as 10k short ones), and the shard id must be a pure
    function of the corpus so re-runs are reproducible.

    Documents are laid out in ``id_col`` order (numeric, unique — the
    corpus's stable global order); a document lands in the shard where
    its FIRST token falls: ``shard = tokens_before div budget_tokens``.
    Shards are therefore contiguous id-ranges, every shard except the
    last holds ≥ ``budget_tokens`` - (last doc overshoot) tokens, and a
    downstream writer can ``repartitionByRange`` / partition-by the
    shard column without re-deriving anything.

    Scale shape: inherits :func:`global_prefix_sum` — one boundary
    scan, ONE corpus shuffle on the range-bucket id, per-bucket windows,
    a broadcast offset join; the corpus never funnels through a single
    task the way a naive global cumulative window would. Integer
    ``div`` end to end (the pack_sequences rule: token offsets at
    100 TB exceed exact-double range).

    Output: ``(id, n_tokens, tokens_before, shard)``.
    """
    from .quality import words_col

    base = df.select(
        F.col(id_col),
        # coalesce: null text must ride along at zero width like the
        # empty string (size() of a NULL array is NULL under ANSI, and
        # a NULL n_tokens would otherwise persist into written shards)
        F.coalesce(
            F.size(words_col(F.col(text_col))).cast("long"), F.lit(0)
        ).alias("n_tokens"),
    )
    pre = global_prefix_sum(
        base,
        "n_tokens",
        id_col,
        out_col="tokens_before",
        n_buckets=n_buckets,
    )
    return pre.select(
        F.col(id_col),
        "n_tokens",
        "tokens_before",
        F.expr(f"tokens_before div {int(budget_tokens)}").alias("shard"),
    )


def write_token_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    *,
    budget_tokens: int,
    n_buckets: int = 32,
) -> int:
    """Materialize the corpus as ``shard=N/`` parquet directories of
    ~``budget_tokens`` tokens each — :func:`shard_by_token_budget`
    driven through to disk, the layout a training job actually reads:
    one directory per shard, contiguous id-ranges, reproducible from
    the corpus alone. Returns the shard count.

    The write repartitions BY THE SHARD COLUMN before ``partitionBy``
    (the bucketed-edge lesson: without it every task holds a sliver of
    every shard and the sink emits tasks × shards small files); shard
    ids are contiguous ranges of the prefix sum, so this is one
    shuffle whose key is the 8-byte shard id. Text rides that shuffle
    once — unavoidable for a materialized layout, and exactly once.
    """
    if "shard" in df.columns:
        # The join below adds `shard`; a pre-existing one would make
        # the written schema ambiguous (ADVICE r07).
        raise ValueError(
            "write_token_shards: input already has a 'shard' column; "
            "rename it before sharding"
        )
    assigned = shard_by_token_budget(
        df.select(F.col(id_col), F.col(text_col)),
        id_col,
        text_col,
        budget_tokens=budget_tokens,
        n_buckets=n_buckets,
    ).select(id_col, "shard")  # id+shard only: n_tokens is derivable
    # from the written text and a duplicate-name hazard if df carries
    # its own n_tokens column (ADVICE r07)
    assigned = assigned.cache()  # written AND counted — one compute
    (
        df.join(assigned, id_col)
        .repartition(F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # count from the skinny assignment, not a re-scan of the written
    # corpus (listing + reading the full output just for a count).
    n_shards = assigned.select("shard").distinct().count()
    # terminal action done — release the operator-internal cache so
    # long-lived sessions sharding many corpora don't accumulate
    # MEMORY_AND_DISK entries (ADVICE r07)
    assigned.unpersist()
    return n_shards
