"""Text-analysis operators: token stats, quality scoring, language id,
fingerprinting — all built-in column expressions (JVM-side, codegen'd).

Designed to run as one narrow pass over the corpus (no shuffle, no UDF):
at 100 TB these are scan-bound, which is the best case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_fingerprint_col, simhash64_col, tokens_col

# ---------------------------------------------------------------------------
# token / char statistics
# ---------------------------------------------------------------------------

def token_count_col(text: Column) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokens_col(text, lowercase=False)).cast("long")


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: count of word-piece matches of
    ``[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]`` — a cheap, deterministic proxy
    for subword tokenizer counts (real BPE needs a vocab; this keeps the
    hot path JVM-side)."""
    return F.size(
        F.regexp_extract_all(
            text, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]"), 0
        )
    ).cast("long")


def alpha_ratio_col(text: Column) -> Column:
    """Fraction of characters that are ASCII letters (null on empty text
    — try_divide, because ANSI mode makes the 0-length division a hard
    error and empty documents are routine in real corpora; DuckDB's x/0
    is NULL, so oracle parity holds)."""
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.try_divide(alpha.cast("double"), F.length(text))


def distinct_token_ratio_col(text: Column) -> Column:
    toks = tokens_col(text)
    return F.try_divide(F.size(F.array_distinct(toks)).cast("double"), F.size(toks))


def quality_score_col(text: Column) -> Column:
    """Composite quality score in [0,1]:
    0.5·alpha_ratio + 0.3·min(tokens/100, 1) + 0.2·distinct_token_ratio.

    Deterministic arithmetic over counts — the shape of heuristic used to
    pre-filter web corpora (length/charset/repetition), not a model.
    """
    toks = token_count_col(text).cast("double")
    return F.least(
        F.lit(1.0),
        0.5 * alpha_ratio_col(text)
        + 0.3 * F.least(toks / 100.0, F.lit(1.0))
        + 0.2 * distinct_token_ratio_col(text),
    )


# ---------------------------------------------------------------------------
# language identification (stopword-overlap heuristic)
# ---------------------------------------------------------------------------

#: Tiny per-language stopword seeds. A real deployment swaps in bigger
#: lists (or fastText via a pandas_udf); the operator shape — distinct
#: tokens ∩ per-language set, argmax with deterministic tie-break — stays.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "fr": ["le", "les", "de", "et", "des", "un", "une", "est", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"],
    "zh": ["的", "了", "是", "我", "不", "在", "人", "有", "他", "这"],
}


def lang_scores_col(text: Column) -> dict[str, Column]:
    toks = F.array_distinct(tokens_col(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }


def lang_id_col(text: Column) -> Column:
    """Predicted language: argmax stopword overlap; ties break in the
    fixed key order en→es→fr→de→zh; all-zero → 'unknown'."""
    scores = lang_scores_col(text)
    langs = list(STOPWORDS)
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    for lang in reversed(langs):  # build CASE so earlier langs win ties
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def rolling_hash_col(tokens: Column, base: int = 131, mod: int = 2_147_483_647) -> Column:
    """Order-sensitive polynomial rolling hash over the token stream:
    ``acc = (acc·base + h(token)) mod P`` with ``h(t) = 31·|t| + ascii(t₀)``.

    Unlike the set fingerprint, this distinguishes reorderings. The
    per-step mod keeps the accumulator < 2³¹ (no ANSI long overflow), and
    every primitive (length/ascii/arithmetic) has an exact DuckDB twin so
    the fingerprint is oracle-checkable cross-engine.
    """
    hashed = F.transform(
        tokens,
        lambda t: (F.length(t) * 31 + F.ascii(t)).cast("long"),
    )
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * base + h, F.lit(mod)),
    )


# ---------------------------------------------------------------------------
# document profiling
# ---------------------------------------------------------------------------

def profile_documents(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass document profile: counts, quality, language, fingerprints."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(text).cast("long").alias("n_chars"),
        token_count_col(text).alias("n_tokens"),
        bpe_ish_token_count_col(text).alias("n_bpe_tokens"),
        F.round(alpha_ratio_col(text), 4).alias("alpha_ratio"),
        F.round(quality_score_col(text), 4).alias("quality"),
        lang_id_col(text).alias("lang_pred"),
        normalized_fingerprint_col(text).alias("fingerprint"),
        simhash64_col(tokens_col(text)).alias("simhash"),
    )


# ---------------------------------------------------------------------------
# tokenizer induction: one BPE merge iteration
# ---------------------------------------------------------------------------

def bpe_top_merges(
    df: DataFrame, text_col: str, *, k: int = 20
) -> DataFrame:
    """The counting core of ONE BPE merge iteration over a character
    vocabulary: occurrence counts of adjacent symbol pairs WITHIN words,
    ranked — the pair a tokenizer trainer would merge next. Output
    ``(pair, n)``, top ``k`` by (count desc, pair asc) — the
    deterministic tie-break makes the merge choice engine-independent.

    Shape: words explode once, character bigrams derive per word via
    substring (no per-char explode — rows stay one-per-word until the
    bigram explode), then one partially-aggregated groupBy on the
    2-char pair and a TakeOrderedAndProject. Iterating merges (apply
    merge → recount) reuses this pass with the learned vocab applied
    upstream; the counting pass is the scale-relevant part — it is one
    narrow scan + one small-key aggregation regardless of corpus size.
    """
    from .dedup import tokens_col

    words = df.select(
        F.explode(
            F.filter(tokens_col(F.col(text_col)), lambda x: F.length(x) >= 2)
        ).alias("_w")
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_w") - 1),
                lambda i: F.substring(F.col("_w"), i, 2),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / context-window prep
    stage): each document's whitespace tokens split into windows of
    ``chunk_tokens`` words starting every ``chunk_tokens - overlap``
    words; the final window may be shorter. Output one row per chunk:
    ``(id, chunk_id, n_tokens, text_chunk)`` with ``chunk_id`` 0-based
    in document order. Documents with no tokens (empty/null text)
    produce no chunks.

    One narrow pass: words derive per row, window structs generate via
    ``transform`` over a per-doc sequence (bounded by doc length), and
    a single ``posexplode`` emits the chunks — no shuffle at all, so
    at 100 TB this is scan-bound and embarrassingly parallel. Text is
    lowercased/whitespace-normalized like every token-stream operator
    here (the normalization a tokenizer applies anyway).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    from .quality import words_col

    stride = chunk_tokens - overlap
    w = words_col(F.col(text_col))
    n = F.size(w)
    # every chunk after the first must contribute ≥1 NEW token (a naive
    # "start < n" emits a final chunk fully contained in the previous
    # one's overlap): ceil((n - overlap)/stride), clamped for tiny docs
    n_chunks = (
        F.floor(F.greatest(n - overlap - 1, F.lit(0)) / F.lit(stride)).cast(
            "int"
        )
        + 1
    )
    chunks = F.when(
        n.isNull() | (n <= 0), F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(w, i * stride + 1, chunk_tokens)
            ),
        )
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_id", "text_chunk"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split(F.col("text_chunk"), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
        "text_chunk",
    )


#: Demo merge table for the catalog row: common English digraph merges,
#: applied in rank order. A trained tokenizer drops in the same shape —
#: the operator takes merges as data, both engines see the same
#: literals.
BPE_DEMO_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("o", "r"),
    ("e", "s"),
    ("s", "t"),
]


def bpe_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Tokens per document under a FIXED BPE merge table — tokenizer
    APPLICATION, the pass a training pipeline runs on every document it
    ever ingests (the budget unit for sampling/packing/sharding is
    tokens under the model's tokenizer, not whitespace words; this
    repo's other operators take that count as an input column, and this
    operator is where it comes from).

    Classic BPE encode, expressed entirely in JVM string expressions:
    each word is exploded to space-separated characters, then every
    merge ``(a, b) → ab`` applies as a global ``replace(' a b ' →
    ' ab ')`` in rank order — exactly the training-time greedy order,
    and ``replace`` handles overlapping runs the way BPE's left-to-
    right scan does for the digraph merges used here. The per-word
    token count is then ``(spaces in the encoded word) + 1``. One
    narrow zero-shuffle pass — no UDF, no explode (words stay inside a
    ``transform`` HOF; counts aggregate with ``aggregate``), and the
    merge table rides the plan as literals, so a DuckDB oracle chaining
    the SAME replaces reproduces every count.

    Output: ``(id, n_words, n_bpe_tokens)`` — ``n_bpe_tokens`` is null-
    safe 0 for empty docs. ~``len(merges)`` chained string passes per
    word; a production 32k-merge vocab belongs in an Arrow-batched
    Pandas UDF wrapping a real tokenizer (the multimodal decode
    stance), but the budget arithmetic downstream is count-agnostic.
    """
    from .quality import words_col

    if merges is None:
        merges = BPE_DEMO_MERGES

    def encode(w):
        # ' t e x t ' — guard spaces so merges match whole symbols
        enc = F.concat(
            F.lit(" "), F.regexp_replace(w, "(.)", "$1 ")
        )
        for a, b in merges:
            # twice: one replace() pass skips an occurrence that shares
            # its boundary space with the match before it ("t h t h" →
            # " th t h" on pass 1); a skipped occurrence always stands
            # alone afterwards, so the second pass saturates the rule —
            # matching BPE's merge-every-occurrence semantics. The
            # oracle chains the IDENTICAL double pass.
            for _ in range(2):
                enc = F.replace(
                    enc, F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
                )
        return enc

    words = words_col(F.col(text_col))
    counts = F.transform(
        words,
        lambda w: F.size(F.split(F.trim(encode(w)), " ")).cast("long"),
    )
    return df.select(
        F.col(id_col),
        F.coalesce(F.size(words).cast("long"), F.lit(0)).alias("n_words"),
        F.coalesce(
            F.aggregate(
                counts, F.lit(0).cast("long"), lambda acc, x: acc + x
            ),
            F.lit(0),
        ).alias("n_bpe_tokens"),
    )


def _bpe_encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under canonical greedy BPE: repeatedly
    merge the LOWEST-rank adjacent symbol pair, all occurrences
    leftmost-first per round (the GPT-2 encoder loop). Cost scales with
    word length, never with |ranks|."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_token_count_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    merges: list[tuple[str, str]] | None = None,
    cache_cap: int = 1 << 16,
) -> DataFrame:
    """Arrow-batched BPE token counting — the PRODUCTION-vocab path the
    expression-tree :func:`bpe_token_count` documents as its own bound:
    that encoder chains 2·|merges| JVM string passes per word (perfect
    for a demo table, hopeless for a 32k-merge vocab whose plan would
    hold 64k replace nodes), while this one ships the merge table once
    per task and runs the canonical rank-dict greedy encode, so
    per-word cost scales with WORD LENGTH, not vocabulary size.

    Same output contract as :func:`bpe_token_count` — ``(id, n_words,
    n_bpe_tokens)``, null/empty docs at (0, 0) — and parity-tested
    against it on the demo merge table (tests/test_text.py). The two
    agree on training-derived merge tables (each merge's parts exist
    only via earlier merges, so sequential-replace order and rank-dict
    order coincide); this path is the canonical semantics.

    Scale shape: ``mapInPandas`` (Arrow batch transfer, never
    row-at-a-time pickling), input pruned to the two columns before
    the Python stage, one narrow pass, zero shuffle. A per-task word
    cache (capped at ``cache_cap`` entries) exploits the Zipf head —
    the same trick real tokenizers use. Tokenization mirrors
    ``quality.words_col`` exactly (ASCII ``\\s`` — Java regex ``\\s``
    is ASCII-only while Python's default is Unicode-aware; the
    udtf_chunk lesson).

    Crossover (measured sf0.1, local[8], best-of-3, noop sink): the
    word cache makes this path faster at EVERY table size on a natural
    corpus — 8 merges 0.76 s expr / 0.36 s arrow, 32 → 1.19 / 0.29,
    128 → 3.49 / 0.28 (expr cost grows with the replace chain, arrow
    stays flat); at 512 merges the expression plan did not finish
    compiling within the bench window. The expression path's remaining
    role is the oracle-expressible demo (DuckDB chains the identical
    replaces); production counting belongs here.
    """
    if merges is None:
        merges = BPE_DEMO_MERGES
    merges_t = [tuple(m) for m in merges]
    id_type = dict(df.dtypes)[id_col]

    def run(batches):
        import re as _re

        import pandas as _pd

        ranks = {m: i for i, m in enumerate(merges_t)}
        cache: dict[str, int] = {}
        for pdf in batches:
            n_words: list[int] = []
            n_tokens: list[int] = []
            for text in pdf[text_col]:
                if text is None:
                    n_words.append(0)
                    n_tokens.append(0)
                    continue
                words = [
                    w
                    for w in _re.split(
                        r"\s+", text.lower(), flags=_re.ASCII
                    )
                    if w
                ]
                tot = 0
                for w in words:
                    n = cache.get(w)
                    if n is None:
                        n = _bpe_encode_len(w, ranks)
                        if len(cache) < cache_cap:
                            cache[w] = n
                    tot += n
                n_words.append(len(words))
                n_tokens.append(tot)
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": n_words,
                    "n_bpe_tokens": n_tokens,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run, f"`{id_col}` {id_type}, n_words bigint, n_bpe_tokens bigint"
    )


# ---------------------------------------------------------------------------
# HTML stripping
# ---------------------------------------------------------------------------

#: entity → replacement, applied in THIS order: specific entities first,
#: ``&amp;`` LAST (so ``&amp;lt;`` decodes to the literal ``&lt;`` text,
#: not a second-round ``<`` — the standard single-pass decode rule).
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def seed_synthetic_markup(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "html"
) -> DataFrame:
    """Deterministically wrap a plain-text corpus in HTML markup — the
    fixture generator behind the strip-html catalog row (the driver's
    testdata is read-only and markup-free, so the seeding happens
    in-query and the oracle mirrors it verbatim in SQL — the
    ``seed_synthetic_pii`` precedent, pii.py).

    Per row (id arithmetic, no randomness): every document gains a
    ``<div id=...><p>...</p></div>`` wrapper; ``id % 3`` rotates through
    the six entities :data:`HTML_ENTITIES` decodes (including the
    ``&amp;`` double-escape case the single-pass order exists for);
    ``id % 4 == 0`` gains a ``<script>`` block whose tags strip but
    whose body survives (the documented non-goal of the regex rule),
    everyone else a ``<br/>`` word boundary.
    """
    i = F.col(id_col)
    entity = (
        F.when(i % 3 == 0, F.lit(" Tom &amp; Jerry &amp;lt;3"))
        .when(i % 3 == 1, F.lit(" 5 &gt; 4 &quot;quoted&quot;"))
        .otherwise(F.lit(" it&#39;s&nbsp;here"))
    )
    block = F.when(
        i % 4 == 0, F.lit("<script>var x = 1;</script>")
    ).otherwise(F.lit("<br/>"))
    return df.withColumn(
        out_col,
        F.concat(
            F.lit('<div id="'),
            i.cast("string"),
            F.lit("\" class='doc'><p>"),
            F.col(text_col),
            entity,
            block,
            F.lit("</p></div>"),
        ),
    )


def strip_html_col(text: Column) -> Column:
    """Visible text of an HTML fragment: tags dropped, the six common
    entities decoded, whitespace collapsed, ends trimmed.

    Web-crawl curation runs this on every document before any quality or
    dedup stage — markup inflates token counts, pollutes shingles, and
    leaks boilerplate into n-gram statistics. Pure JVM regex/replace
    chain (one narrow pass, codegen'd, no UDF); every pattern is
    RE2-compatible so an ANSI oracle reproduces it verbatim
    (``regexp_replace(..., 'g')`` in DuckDB — Spark replaces all
    occurrences by default).

    Tag removal is the pragmatic ``<[^>]*>`` rule (any angle-bracket run
    with no ``>`` inside) — it does not attempt full HTML5 parsing
    (CDATA, comments spanning ``>``, script bodies); crawl extractors
    that need DOM fidelity run a real parser upstream. Tags become a
    space so ``a<br>b`` keeps its word boundary; the collapse pass then
    normalizes runs.
    """
    out = F.regexp_replace(text, r"<[^>]*>", " ")
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))
