"""Bigram collocation mining over a document corpus — exact-integer
LIFT scores for adjacent word pairs.

The collocation-extraction pass of corpus analysis (Manning &
Schütze ch. 5): which adjacent word pairs co-occur far more often than
their unigram frequencies predict ("new york", "machine learning")?
The classic scores are PMI and the t/χ² tests — all need logs or
square roots, which are irrational and break the exact-replay
contract this repo's oracles enforce. LIFT is the member of the same
family that closes over integers::

    lift(a,b) = p(ab) / (p(a) · p(b))
              = (c_ab / N) / ((c_a / M)(c_b / M))
              = c_ab · M² / (N · c_a · c_b)

(PMI is exactly log(lift), so lift RANKS pairs identically to PMI.)
Reported in parts-per-million via DECIMAL(38,0) truncating division —
bit-replayable in any ANSI engine. Headroom: c_ab·M²·ppm must fit
38 digits, i.e. corpora up to ~10¹³ unigram tokens at ppm=10⁶ (the
fastrp decimal-widening discipline) — and since r14 (ADVICE r13) the
bound is ENFORCED, not just documented: a row whose product overflows
the decimal (NULL in non-ANSI Spark) or whose quotient exceeds int64
raises loudly instead of emitting a wrapped/NULL score.

Tokenization is the repo-wide convention (:func:`~.dedup.tokens_col`:
lowercase whitespace words, empties dropped) so the oracle replays it
with the same split. The reference has no text surface; extension
tier, public semantics only.

Scale shape: one posexplode of the token array (the only corpus-sized
shuffle-feeder), adjacent pairs by (doc, pos)↔(doc, pos+1) self-join
ON THE ALREADY-EXPLODED skinny (doc, pos, word) relation — or, as
implemented, zip_with over the array to avoid the self-join entirely:
bigrams are formed INSIDE the row (whole-stage codegen slice+zip),
then ONE partial-aggregated count per distinct pair, two equi-joins
of the unigram-count table (bounded by vocabulary, not corpus — AQE
broadcasts small vocabularies), and a narrow decimal map.
``min_count`` prunes the hapax tail BEFORE the unigram joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def bigram_collocations(
    df: DataFrame,
    text_col: str,
    *,
    min_count: int = 2,
    ppm: int = 10**6,
) -> DataFrame:
    """→ ``(w1, w2, pair_count, lift_ppm)`` for every adjacent
    lowercase word pair occurring ≥ ``min_count`` times across the
    corpus, ``lift_ppm = c_ab·M²·ppm div (N·c_a·c_b)`` with M = total
    unigram tokens, N = total bigram tokens (see module docstring).
    """
    if min_count < 1:
        raise ValueError(
            f"bigram_collocations: min_count must be >= 1, got {min_count}"
        )
    words = F.filter(tokens_col(F.col(text_col)), lambda x: x != "")
    toks = df.select(words.alias("_w")).filter(F.size("_w") > 0)
    # bigrams formed inside the row: zip the array with its tail —
    # whole-stage codegen, no posexplode self-join
    pairs_col = F.zip_with(
        F.slice(F.col("_w"), 1, F.greatest(F.size("_w") - 1, F.lit(0))),
        F.slice(
            F.col("_w"),
            2,
            F.greatest(F.size("_w") - 1, F.lit(0)),
        ),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    uni = (
        toks.select(F.explode("_w").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    m_total = uni.agg(
        F.sum("_c").alias("_M")
    )  # 1 row: total unigram tokens
    bi = (
        toks.select(F.explode(pairs_col).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    n_total = bi.agg(
        F.sum("pair_count").alias("_N")
    )  # 1 row: total bigram tokens
    dec = "DECIMAL(38,0)"
    # try_multiply: NULL on decimal overflow in BOTH ANSI and non-ANSI
    # mode — so the overflow signal is one thing (NULL) regardless of
    # session config, and the guard below turns it into ONE loud,
    # self-describing raise instead of an opaque ArithmeticException
    # (ANSI) or a silent NULL/wrapped score (non-ANSI).
    # The quotient stays DECIMAL until AFTER the guard: decimal `div`
    # returns BIGINT directly, so an over-int64 quotient would wrap
    # BEFORE any comparison could see it (the r14 review's confirmed
    # dead-guard case). floor(try_divide(...)) keeps it wide —
    # operands are positive, so floor ≡ the truncating div the oracle
    # replays — and try_divide mirrors try_multiply's NULL-on-overflow
    # in both ANSI modes.
    lift_dec = F.expr(
        f"floor(try_divide("
        f"try_multiply(try_multiply(try_multiply("
        f"CAST(pair_count AS {dec}), CAST(_M AS {dec})), _M), {ppm}), "
        f"try_multiply(try_multiply(CAST(_N AS {dec}), _ca), _cb)))"
    )
    # LOUD headroom guard (ADVICE r13): past the documented ~10¹³-token
    # bound the product overflows DECIMAL(38,0) (→ NULL via
    # try_multiply/try_divide above) or the still-DECIMAL quotient
    # exceeds int64 (the wrap case the BIGINT cast would silently
    # commit). Every input is non-null by construction (inner joins of
    # count aggregates), so NULL here IS the overflow. Same
    # raise_error discipline as the kmv/scale_properties guards.
    lift = F.expr(
        "CASE WHEN _lift IS NULL OR _lift > 9223372036854775807 THEN "
        "CAST(raise_error('bigram_collocations: c_ab*M^2*ppm exceeded "
        "DECIMAL(38,0)/BIGINT headroom - corpus beyond the documented "
        "~1e13-unigram-token bound; rescale ppm') AS BIGINT) "
        "ELSE CAST(_lift AS BIGINT) END"
    )
    # unigram joins are plain equi-joins (vocabulary-sized — AQE
    # broadcasts small vocabularies at runtime; a forced broadcast of
    # a 10⁸-word web vocabulary would be the footgun); the two 1-row
    # totals ride explicit broadcasts
    return (
        bi.filter(F.col("pair_count") >= min_count)
        .join(
            uni.withColumnRenamed("w", "w1").withColumnRenamed("_c", "_ca"),
            "w1",
        )
        .join(
            uni.withColumnRenamed("w", "w2").withColumnRenamed("_c", "_cb"),
            "w2",
        )
        .crossJoin(F.broadcast(m_total))
        .crossJoin(F.broadcast(n_total))
        .withColumn("_lift", lift_dec)
        .select("w1", "w2", "pair_count", lift.alias("lift_ppm"))
    )
