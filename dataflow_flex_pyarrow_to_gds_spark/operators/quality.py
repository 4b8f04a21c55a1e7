"""Heuristic document-quality filtering — the Gopher/C4-style rule family
used to pre-filter web corpora before training (word-count bounds, mean
word length, stopword presence, within-document repetition).

Like :mod:`.text`, everything here is built-in column expressions over the
token array — one narrow, scan-bound pass with zero UDFs and zero
shuffles, which is the best case at 100 TB. The only shuffle in the
module is the per-document mode computation in
:func:`top_ngram_coverage`, which keys on (doc_id, ngram) — bounded
cardinality, map-side combinable.

The thresholds follow the published Gopher rules where this corpus can
exercise them (word count, mean word length, stopword hits) and tighten
the repetition bound to a level the synthetic corpus actually spans, so
the keep/drop split is observable in tests and oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .dedup import spread_to_cluster, tokens_col  # noqa: F401  (re-export)
from .text import STOPWORDS

# ---------------------------------------------------------------------------
# per-document metric columns (all narrow, JVM-side)
# ---------------------------------------------------------------------------

def words_col(text: Column) -> Column:
    """Non-empty lowercase whitespace tokens (duplicates preserved —
    repetition metrics need the bag, not the set)."""
    return F.filter(tokens_col(text), lambda x: x != "")


def word_count_col(words: Column) -> Column:
    return F.size(words).cast("long")


def mean_word_length_col(words: Column) -> Column:
    """Mean character length of the words (double; null on empty docs —
    try_divide, because ANSI mode turns the 0-word division into a hard
    ArithmeticException and empty documents are routine in real corpora;
    DuckDB's x/0 is NULL, so oracle parity holds on empty docs too)."""
    total = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.try_divide(total, F.size(words))


def stopword_hits_col(words: Column, stopwords: list[str] | None = None) -> Column:
    """Number of word OCCURRENCES drawn from the stopword list (a bag
    count, per Gopher's "contains at least 2 of ..." rule)."""
    stops = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS["en"])])
    return F.size(F.filter(words, lambda w: F.array_contains(stops, w))).cast(
        "long"
    )


def ngrams_col(words: Column, n: int) -> Column:
    """All word n-grams in order (duplicates preserved)."""
    if n == 1:
        return words
    return F.when(
        F.size(words) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, F.lit(n))),
        )
    )


def dup_ngram_fraction_col(words: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the same document: ``1 - distinct/total`` (0 = no internal
    repetition; → 1 as the document degenerates to a loop). The
    array-local analogue of Rae et al.'s duplicate-n-gram filters."""
    grams = ngrams_col(words, n)
    # try_divide: a doc with < n words has zero n-grams, which under ANSI
    # would be a hard divide-by-zero; null means "no repetition signal".
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(grams)).cast("double"), F.size(grams)
    )


# ---------------------------------------------------------------------------
# rule evaluation
# ---------------------------------------------------------------------------

#: (min_words, max_words, min_mean_wl, max_mean_wl, min_stop_hits,
#:  max_dup_2gram) — Gopher-style defaults, repetition bound tightened to
#: the range synthetic corpora span.
DEFAULT_RULES = dict(
    min_words=30,
    max_words=100_000,
    min_mean_word_length=3.0,
    max_mean_word_length=10.0,
    min_stopword_hits=2,
    max_dup_2gram_fraction=0.05,
)


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    rules: dict | None = None,
) -> DataFrame:
    """Per-document quality metrics + per-rule flags + overall ``keep``.

    One narrow projection: metrics are computed once via a lateral-style
    intermediate select so each array expression is evaluated a single
    time, then the flags are cheap comparisons. At 100 TB this is
    scan-bound with full column pruning (only id + text are read).

    The metric expressions are CPU-heavy per row (tokenize + n-gram +
    three array folds), so when the INPUT has fewer splits than the
    cluster has cores (the single-row-group local file; a handful of
    giant unsplittable files), the pass is first spread across the
    cluster — same trap and same cure as the simhash signature stage
    (measured 7.6 s single-task vs 0.6 s spread at sf0.1). Real
    many-file inputs already have ≥cores splits and skip the exchange
    entirely, keeping the pass purely narrow.
    """
    r = {**DEFAULT_RULES, **(rules or {})}
    df = spread_to_cluster(df)
    words = words_col(F.col(text_col))
    m = df.select(
        F.col(id_col),
        word_count_col(words).alias("n_words"),
        F.round(mean_word_length_col(words), 4).alias("mean_word_len"),
        stopword_hits_col(words).alias("stop_hits"),
        F.round(dup_ngram_fraction_col(words, 2), 4).alias("dup_2gram_frac"),
    )
    flags = m.select(
        "*",
        (
            (F.col("n_words") >= r["min_words"])
            & (F.col("n_words") <= r["max_words"])
        ).alias("ok_word_count"),
        (
            (F.col("mean_word_len") >= r["min_mean_word_length"])
            & (F.col("mean_word_len") <= r["max_mean_word_length"])
        ).alias("ok_mean_word_len"),
        (F.col("stop_hits") >= r["min_stopword_hits"]).alias("ok_stopwords"),
        (F.col("dup_2gram_frac") <= r["max_dup_2gram_fraction"]).alias(
            "ok_repetition"
        ),
    )
    return flags.select(
        "*",
        (
            F.col("ok_word_count")
            & F.col("ok_mean_word_len")
            & F.col("ok_stopwords")
            & F.col("ok_repetition")
        ).alias("keep"),
    )


def gopher_keep_col(text: Column, *, rules: dict | None = None) -> Column:
    """The overall keep/drop verdict as a single boolean column. Compares
    the same ROUNDED metrics as :func:`gopher_quality` so the two are
    always consistent.

    PERFORMANCE: as one inline expression, each metric subtree is pasted
    into every comparison that references it, and higher-order functions
    run interpreted (no codegen subexpression elimination) — the
    tokenize+metric work executes ~7× per row (measured 4.2 s vs 0.8 s
    at sf0.1). Inside real plans use :func:`with_gopher_keep`, which
    materializes each metric once; keep this form for tests and for
    contexts where a standalone Column is required."""
    r = {**DEFAULT_RULES, **(rules or {})}
    words = words_col(text)
    nw = word_count_col(words)
    mwl = F.round(mean_word_length_col(words), 4)
    sh = stopword_hits_col(words)
    dg = F.round(dup_ngram_fraction_col(words, 2), 4)
    return (
        (nw >= r["min_words"])
        & (nw <= r["max_words"])
        & (mwl >= r["min_mean_word_length"])
        & (mwl <= r["max_mean_word_length"])
        & (sh >= r["min_stopword_hits"])
        & (dg <= r["max_dup_2gram_fraction"])
    )


def with_gopher_keep(
    df: DataFrame,
    text_col: str,
    *,
    rules: dict | None = None,
    keep_col: str = "keep",
) -> DataFrame:
    """``df`` plus a ``keep`` boolean column, with each Gopher metric
    evaluated exactly ONCE per row: the metrics land in an intermediate
    projection whose aliases the rule comparisons reference 2× each —
    multi-referenced non-cheap aliases are precisely what CollapseProject
    refuses to inline, so the materialization survives optimization
    (unlike :func:`gopher_keep_col`, which re-evaluates per reference).
    """
    r = {**DEFAULT_RULES, **(rules or {})}
    words = words_col(F.col(text_col))
    m = df.select(
        "*",
        word_count_col(words).alias("_gq_nw"),
        F.round(mean_word_length_col(words), 4).alias("_gq_mwl"),
        stopword_hits_col(words).alias("_gq_sh"),
        F.round(dup_ngram_fraction_col(words, 2), 4).alias("_gq_dg"),
    )
    return m.select(
        *df.columns,
        (
            (F.col("_gq_nw") >= r["min_words"])
            & (F.col("_gq_nw") <= r["max_words"])
            & (F.col("_gq_mwl") >= r["min_mean_word_length"])
            & (F.col("_gq_mwl") <= r["max_mean_word_length"])
            & (F.col("_gq_sh") >= r["min_stopword_hits"])
            & (F.col("_gq_dg") <= r["max_dup_2gram_fraction"])
        ).alias(keep_col),
    )


def unigram_logprob_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus-internal unigram LM score per document — the shape of the
    CCNet/GPT-3 language-model quality filter, with the corpus itself as
    the LM: surprising documents (rare tokens) score high mean negative
    log-probability, boilerplate scores low.

    Two passes over the exploded token stream: (1) corpus token counts
    (map-side combinable agg), (2) token→logp join + per-doc aggregate.
    The join keys on the token and carries an explicit shuffle_hash
    hint: the vocab side is O(distinct corpus tokens) — analytically
    never broadcastable at target scale — so the scale-correct shape is
    pinned rather than left to size estimates that flip to a vocab
    broadcast on small fixtures (unlike the funnel/retention joins,
    whose build-side size is data-dependent and properly left to AQE).
    Both join inputs hash-partition on the token, and the vocab side's
    aggregation already produces exactly that partitioning.

    Cross-engine determinism: each token's −ln p is rounded and cast to
    DECIMAL(18,6) BEFORE summing — decimal addition is exact and
    order-independent in both Spark and DuckDB, so the per-doc sum never
    depends on float summation order (a double sum would hash-mismatch
    whenever two engines reduce in different orders).
    """
    toks = spread_to_cluster(df).select(
        F.col(id_col),
        F.explode(words_col(F.col(text_col))).alias("_tok"),
    )
    totals = toks.groupBy("_tok").agg(F.count("*").alias("_cnt"))
    n_total = totals.agg(F.sum("_cnt").alias("_n"))
    neglogp = (
        totals.crossJoin(F.broadcast(n_total))
        .select(
            "_tok",
            F.round(-F.log(F.col("_cnt") / F.col("_n")), 6)
            .cast("decimal(18,6)")
            .alias("_nlp"),
        )
    )
    return (
        toks.join(neglogp.hint("shuffle_hash"), "_tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_nlp").alias("_sum_nlp"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.col("_sum_nlp").cast("double").alias("sum_neglogp"),
            F.round(
                F.col("_sum_nlp").cast("double") / F.col("n_tokens"), 4
            ).alias("avg_neglogp"),
        )
    )


def top_ngram_coverage(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Per-document repetition profile via the MOST FREQUENT n-gram:
    (doc_id, n_ngrams, top_count, top_frac, top_ngram).

    Explode + two-level aggregation: partial counts combine map-side on
    (doc_id, ngram) — the classic scalable mode computation; no array
    ever leaves the row it came from. Ties on count break by the
    lexicographically smallest n-gram (deterministic cross-engine).
    """
    grams = spread_to_cluster(df).select(
        F.col(id_col),
        F.explode(ngrams_col(words_col(F.col(text_col)), n)).alias("ngram"),
    )
    counts = grams.groupBy(id_col, "ngram").agg(F.count("*").alias("cnt"))
    # min(struct(-cnt, ngram)) = argmax by count, smallest ngram on ties —
    # a single map-side-combinable aggregate instead of a window + filter.
    top = counts.groupBy(id_col).agg(
        F.sum("cnt").alias("n_ngrams"),
        F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("ngram"))).alias(
            "_top"
        ),
    )
    return top.select(
        F.col(id_col),
        "n_ngrams",
        (-F.col("_top.neg")).cast("long").alias("top_count"),
        F.round(
            (-F.col("_top.neg")).cast("double") / F.col("n_ngrams"), 4
        ).alias("top_frac"),
        F.col("_top.ngram").alias("top_ngram"),
    )


def bigram_logprob_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Corpus-internal BIGRAM LM score per document — one Markov order
    above :func:`unigram_logprob_profile`, the cheapest LM that catches
    scrambled/unnatural word ORDER (a shuffled document keeps its
    unigram score but its bigrams crater). Per document with ≥ 2 words:
    mean −ln p(wᵢ | wᵢ₋₁) under the corpus MLE
    p(w₂|w₁) = c(w₁w₂) / c(w₁ ·), where c(w₁ ·) sums bigram counts by
    first word (so every observed bigram has positive probability and
    the conditional normalizes over observed successors). Documents with
    fewer than 2 words have no bigrams and are omitted (mirrors
    contamination_profile's no-n-gram rule).

    Scale shape — LINEAR, zero joins, bigram STRINGS never shuffle:
    bigrams and their context (first) words hash to 8 bytes at the
    scan, the stream aggregates to one row per (doc, bigram), and the
    corpus-wide bigram count and context count each come off a window
    over the respective hash (the repeated_passage_profile linear-plan
    trick — the r5 version shuffled the full bigram-string stream into
    two shuffle_hash joins and ran +38 % slower at sf0.1). Hash
    collisions merge distinct bigrams with probability
    ~|bigrams|²/2⁶⁴ — negligible (the gram-hash convention). Per-bigram
    −ln p is rounded to DECIMAL(18,6) BEFORE the multiplicity-weighted
    sum, so per-doc sums are independent of reduction order in both
    engines (the unigram determinism rule).
    """
    bigs = spread_to_cluster(df).select(
        F.col(id_col),
        F.explode(ngrams_col(words_col(F.col(text_col)), 2)).alias("_bg"),
    ).select(
        id_col,
        F.xxhash64("_bg").alias("_bgh"),
        F.xxhash64(F.substring_index(F.col("_bg"), " ", 1)).alias("_ctxh"),
    )
    per = bigs.groupBy(id_col, "_bgh", "_ctxh").agg(
        F.count(F.lit(1)).alias("_pos")
    )
    w1 = per.withColumn("_cnt", F.sum("_pos").over(W.partitionBy("_bgh")))
    w2 = w1.withColumn(
        "_ctx_cnt", F.sum("_pos").over(W.partitionBy("_ctxh"))
    )
    nlp = (
        F.round(-F.log(F.col("_cnt") / F.col("_ctx_cnt")), 6)
        .cast("decimal(18,6)")
    )
    return (
        w2.withColumn("_nlp", nlp)
        .groupBy(id_col)
        .agg(
            F.sum("_pos").alias("n_bigrams"),
            F.sum(F.col("_nlp") * F.col("_pos")).alias("_sum_nlp"),
        )
        .select(
            F.col(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("_sum_nlp").cast("double").alias("sum_neglogp"),
            F.round(
                F.col("_sum_nlp").cast("double") / F.col("n_bigrams"), 4
            ).alias("avg_neglogp"),
        )
    )


def hashed_bucket_col(
    token: Column, n_features: int, hash_fn=None
) -> Column:
    """Hashing-trick feature bucket for one token: ``pmod(h(token), n)``.

    ``hash_fn`` maps a token Column to a 64-bit hash Column; defaults to
    ``F.xxhash64`` (fastest). Pass ``dedup.portable_hash64_col`` when
    bucket assignments must be reproducible outside Spark (the oracle
    path — its md5 arithmetic is expressible verbatim in ANSI SQL).
    """
    hash_fn = hash_fn or (lambda t: F.xxhash64(t))
    return F.pmod(hash_fn(token), F.lit(n_features))


#: Seeded micro-unit weight for feature bucket b (an int64 in
#: [-500000, 500010), i.e. weight ∈ [-0.5, 0.50001) after /1e6): a pure
#: integer LCG step, so the DuckDB oracle reproduces it digit-for-digit
#: with the same three integer ops. Used when no trained weights are
#: supplied — the demo/test mode; production passes real weights.
def _seeded_w6(bucket: Column) -> Column:
    return (bucket * F.lit(1103515245) + F.lit(12345)) % F.lit(
        100001
    ) * F.lit(10) - F.lit(500000)


def linear_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_features: int = 64,
    weights: list[float] | None = None,
    bias: float = 0.0,
    hash_fn=None,
    max_literal_features: int = 4096,
) -> DataFrame:
    """Model-based quality scoring — a fastText/DCLM-style LINEAR
    classifier inference pass over hashed bag-of-words features:
    ``logit = bias + Σ_tokens w[bucket(token)]``, ``score = σ(logit)``,
    ``keep = logit > 0``. Output ``(id, logit, score, keep)``.

    This is the model-driven sibling of the statistical Gopher rules
    (:func:`with_gopher_keep`): the reference pipeline has nothing like
    it, but every modern curation funnel (DCLM, FineWeb-Edu) gates on a
    cheap linear classifier before anything expensive runs.

    Scale shape — the whole inference is JVM expressions, no UDF:

    * ``len(weights) ≤ max_literal_features`` (or seeded): ONE narrow
      corpus pass, ZERO shuffles and ZERO joins — the weight vector
      rides the plan as a literal array (or as three integer ops for
      the seeded demo weights) and the per-document sum is an
      ``aggregate`` over the token array in integer MICRO-UNITS
      (round(w·1e6) as int64) — exact, order-independent addition, the
      PageRank fixed-point rule, so the score is bit-reproducible in
      any engine.
    * larger weight vectors (a 2²⁰-bucket production model doesn't
      belong in an expression tree): tokens explode to (doc, bucket),
      BROADCAST-join the (bucket, w6) weight table, and one groupBy(id)
      re-aggregates the micro-unit sum — one corpus shuffle on the id,
      weights never shuffle.

    Empty/stopword-free documents score ``σ(bias)`` (no token
    contributions), and every input row gets an output row.
    """
    w6_bias = int(round(bias * 1_000_000))
    tok = words_col(F.col(text_col))

    if weights is not None and len(weights) != n_features:
        raise ValueError(
            f"weights has {len(weights)} entries, n_features={n_features}"
        )

    def bucket_of(c: Column) -> Column:
        return hashed_bucket_col(c, n_features, hash_fn)

    if weights is None or n_features <= max_literal_features:
        if weights is None:
            def w6_of(c: Column) -> Column:
                return _seeded_w6(bucket_of(c))
        else:
            arr = F.array(
                *[F.lit(int(round(w * 1_000_000))) for w in weights]
            )
            def w6_of(c: Column) -> Column:
                return F.element_at(arr, bucket_of(c).cast("int") + 1)

        # coalesce: aggregate() over a NULL token array (null text) is
        # NULL — a null-text doc must score σ(bias) exactly like the
        # broadcast path's left_outer + coalesce gives it
        micro = F.coalesce(
            F.aggregate(
                tok,
                F.lit(w6_bias).cast("long"),
                lambda acc, t: acc + w6_of(t),
            ),
            F.lit(w6_bias).cast("long"),
        )
        scored = df.select(F.col(id_col), micro.alias("_micro"))
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(i, int(round(w * 1_000_000))) for i, w in enumerate(weights)],
            "_bkt long, _w6 long",
        )
        contrib = (
            df.select(F.col(id_col), F.explode(tok).alias("_t"))
            .select(F.col(id_col), bucket_of(F.col("_t")).alias("_bkt"))
            .join(F.broadcast(wdf), "_bkt")
            .groupBy(id_col)
            .agg(F.sum("_w6").alias("_c"))
        )
        scored = df.select(F.col(id_col)).join(
            contrib, id_col, "left_outer"
        ).select(
            F.col(id_col),
            (F.coalesce("_c", F.lit(0)) + F.lit(w6_bias)).alias("_micro"),
        )

    logit = F.col("_micro").cast("double") / F.lit(1_000_000.0)
    return scored.select(
        F.col(id_col),
        logit.alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
        (F.col("_micro") > 0).alias("keep"),
    )
