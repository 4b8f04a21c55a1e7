"""Gopher-style quality rules, repetition profiling, and PII scan/redact."""

import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
    redact_pii,
    scan_pii,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
    DEFAULT_RULES,
    gopher_keep_col,
    gopher_quality,
    top_ngram_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs off to find "
    "more interesting things in the forest for it is that kind of day "
    "with many different words appearing just once each time around here"
)


def test_gopher_keep_and_flags(spark):
    df = _docs(
        spark,
        [
            (1, GOOD),  # passes everything
            (2, "too short to keep"),  # fails word count
            (3, " ".join(["spam"] * 60)),  # fails stopwords + repetition
            (4, GOOD.replace("the", "tremendousness")),  # long words, few stops
        ],
    )
    out = {r["doc_id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True
    assert out[2]["ok_word_count"] is False and out[2]["keep"] is False
    assert out[3]["ok_stopwords"] is False
    assert out[3]["ok_repetition"] is False  # "spam spam" repeats
    assert out[3]["dup_2gram_frac"] == pytest.approx(1 - 1 / 59, abs=1e-4)
    # keep column matches the standalone keep expression
    keeps = df.select("doc_id", gopher_keep_col(F.col("text")).alias("k")).collect()
    assert {r["doc_id"]: r["k"] for r in keeps} == {
        i: out[i]["keep"] for i in out
    }


def test_gopher_metrics_values(spark):
    df = _docs(spark, [(1, "aa bbb cccc aa the the")])
    r = gopher_quality(df, "doc_id", "text").collect()[0]
    assert r["n_words"] == 6
    assert r["mean_word_len"] == pytest.approx((2 + 3 + 4 + 2 + 3 + 3) / 6, abs=1e-4)
    assert r["stop_hits"] == 2  # two occurrences of "the" (bag count)
    # bigrams: [aa bbb, bbb cccc, cccc aa, aa the, the the] all distinct
    assert r["dup_2gram_frac"] == 0.0


def test_custom_rules_override(spark):
    df = _docs(spark, [(1, GOOD)])
    strict = gopher_quality(
        df, "doc_id", "text", rules={"min_words": 10_000}
    ).collect()[0]
    assert strict["ok_word_count"] is False and strict["keep"] is False


def test_top_ngram_coverage_mode_and_ties(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b a"),  # bigrams: ab ba ab ba → tie, "a b" < "b a"
            (2, "x y z x y"),  # xy yz zx xy → top = "x y" (2 of 4)
        ],
    )
    out = {r["doc_id"]: r for r in top_ngram_coverage(df, "doc_id", "text").collect()}
    assert out[1]["top_ngram"] == "a b" and out[1]["top_count"] == 2
    assert out[1]["n_ngrams"] == 4 and out[1]["top_frac"] == 0.5
    assert out[2]["top_ngram"] == "x y" and out[2]["top_frac"] == 0.5


def test_rules_constants_sane():
    assert DEFAULT_RULES["min_words"] < DEFAULT_RULES["max_words"]
    assert 0 < DEFAULT_RULES["max_dup_2gram_fraction"] < 1


PII_ROWS = [
    (1, "contact bob.smith+x@corp.example.com or call 415-555-2671 now"),
    (2, "server at 10.0.42.7 responded; backup at 192.168.0.1"),
    (3, "no sensitive content in this perfectly ordinary sentence"),
    (4, "twice alice@a.io and alice@a.io plus (212) 555-0000"),
]


def test_scan_pii_counts(spark):
    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scan_pii(df, "doc_id", "text").collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["n_ipv4"] == 2 and out[2]["has_pii"] is True
    assert out[3]["n_pii"] == 0 and out[3]["has_pii"] is False
    assert out[4]["n_email"] == 2 and out[4]["n_phone"] == 1


def test_redact_pii_replaces_all(spark):
    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    red = {r["doc_id"]: r["text"] for r in redact_pii(df, "text").collect()}
    assert "[EMAIL]" in red[1] and "[PHONE]" in red[1]
    assert "bob.smith" not in red[1] and "415" not in red[1]
    assert red[2].count("[IPV4]") == 2
    assert red[3] == PII_ROWS[2][1]  # untouched
    # the optional "(" prefix is part of the match — no stray "(" left
    # behind (a leading \b could not anchor before the non-word prefix)
    assert red[4].endswith("plus [PHONE]")
    # redaction into a separate column preserves the original
    both = redact_pii(df, "text", out_col="clean").collect()
    assert all(r["text"] != r["clean"] for r in both if r["doc_id"] != 3)


# ---------------------------------------------------------------------------
# generative: Spark metrics == pure-Python twin on random word bags
# ---------------------------------------------------------------------------


def test_gopher_metrics_match_python_twin_generative(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(
        ["the", "a", "of", "cat", "dog", "spam", "tremendousness", "xy", "zq"]
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(word, min_size=2, max_size=40))
    def check(words):
        text = " ".join(words)
        r = gopher_quality(_docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
        stops = {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"}
        grams = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
        assert r["n_words"] == len(words)
        assert r["mean_word_len"] == pytest.approx(
            sum(map(len, words)) / len(words), abs=1e-4
        )
        assert r["stop_hits"] == sum(w in stops for w in words)
        assert r["dup_2gram_frac"] == pytest.approx(
            1 - len(set(grams)) / len(grams), abs=1e-4
        )

    check()


def test_quality_ops_tolerate_null_and_empty_text(spark):
    """Null/empty text must not error under ANSI mode: metrics go null
    (null text) or degenerate (empty string), keep never crashes the
    plan, and downstream filters drop the null verdicts."""
    df = _docs(spark, [(1, None), (2, ""), (3, "the quick brown fox")])
    rows = {r["doc_id"]: r for r in gopher_quality(df, "doc_id", "text").collect()}
    assert rows[1]["keep"] is None          # null text -> null verdict
    assert rows[2]["n_words"] == 0          # "" splits to zero words
    assert rows[3]["n_words"] == 4
    kept = df.select("doc_id", gopher_keep_col(F.col("text")).alias("k")) \
             .filter(F.col("k")).collect()
    assert {r["doc_id"] for r in kept} == set()  # none pass the rules


def test_unigram_logprob_hand_computed(spark):
    """Tiny corpus with a hand-computable unigram distribution: p(a)=3/6,
    p(b)=2/6, p(c)=1/6; per-doc mean -ln p matches to the operator's
    6-decimal per-token rounding."""
    import math

    from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
        unigram_logprob_profile,
    )

    df = _docs(spark, [(1, "a a b"), (2, "a b c")])
    out = {r["doc_id"]: r for r in unigram_logprob_profile(df, "doc_id", "text").collect()}
    nlp = {t: round(-math.log(p), 6) for t, p in [("a", 3 / 6), ("b", 2 / 6), ("c", 1 / 6)]}
    assert out[1]["n_tokens"] == 3
    assert out[1]["sum_neglogp"] == pytest.approx(2 * nlp["a"] + nlp["b"], abs=1e-9)
    assert out[2]["avg_neglogp"] == pytest.approx(
        round((nlp["a"] + nlp["b"] + nlp["c"]) / 3, 4), abs=1e-9
    )
    # rare-token doc scores strictly higher than the common-token doc
    assert out[2]["avg_neglogp"] > out[1]["avg_neglogp"]


def test_seeded_pii_redacts_to_zero(spark, sf_dir):
    """The catalog fixture: seed synthetic PII over the real documents
    table, redact, re-scan — no residual PII of any kind."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
        redact_pii,
        scan_pii,
        seed_synthetic_pii,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    seeded = seed_synthetic_pii(docs, "doc_id", "text")
    before = scan_pii(seeded, "doc_id", "text_pii").agg(
        F.sum("n_pii").alias("n")
    ).first()["n"]
    assert before > 0  # fixture is non-vacuous
    redacted = redact_pii(seeded, "text_pii")
    after = scan_pii(redacted, "doc_id", "text_pii").agg(
        F.sum("n_pii").alias("n")
    ).first()["n"]
    assert after == 0


def test_bpe_top_merges_reference(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_top_merges,
    )

    df = spark.createDataFrame(
        [(1, "abab abc a"), (2, "ABAB x bc")], "doc_id long, text string"
    )
    got = [(r["pair"], r["n"]) for r in bpe_top_merges(df, "text", k=3).collect()]
    # words >= 2 chars, lowercased: abab, abc, abab, bc
    # pairs: abab -> ab,ba,ab (x2 words), abc -> ab,bc ; bc -> bc
    # counts: ab=5, ba=2, bc=2  (tie ba/bc broken by pair asc)
    assert got == [("ab", 5), ("ba", 2), ("bc", 2)]


def test_chunk_documents_contract(spark):
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, None), (4, "x"), (5, "p q r s")],
        "doc_id long, text string",
    )
    rows = chunk_documents(
        df, "doc_id", "text", chunk_tokens=3, overlap=1
    ).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["text_chunk"])
    # empty/null docs emit nothing; no trailing chunk without new tokens
    assert by_doc == {
        1: ["a b c", "c d e", "e f g"],
        4: ["x"],
        5: ["p q r", "r s"],
    }
    # reconstruction: stripping the overlap re-yields the original text
    rebuilt = by_doc[1][0] + "".join(
        " " + " ".join(c.split()[1:]) for c in by_doc[1][1:]
    )
    assert rebuilt == "a b c d e f g"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=3)


def test_linear_quality_score_python_twin(spark):
    """Hashed-linear classifier inference matches a pure-Python
    re-computation (same hash, same LCG weights, same micro-unit sum),
    empty docs score the bias, and every input row gets an output row."""
    import hashlib

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        portable_hash64_col,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
        linear_quality_score,
    )

    docs = [
        (0, "spark engine quality pass"),
        (1, "spark spark spark"),
        (2, ""),
        (3, "   "),
        (4, "totally different words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    nf, bias_micro = 64, -50_000
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(
            df, "doc_id", "text", n_features=nf, bias=-0.05,
            hash_fn=portable_hash64_col,
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3, 4}

    def phash(tok: str) -> int:
        hx = hashlib.md5(tok.encode()).hexdigest()
        hi, lo = int(hx[:8], 16), int(hx[8:16], 16)
        if hi >= 1 << 31:
            hi -= 1 << 32
        return hi * (1 << 32) + lo

    for doc_id, text in docs:
        toks = [t for t in text.lower().strip().split() if t]
        micro = bias_micro + sum(
            ((phash(t) % nf + nf) % nf * 1103515245 + 12345) % 100001 * 10
            - 500000
            for t in toks
        )
        r = out[doc_id]
        assert r["logit"] == micro / 1_000_000.0, (doc_id, r)
        assert r["keep"] == (micro > 0)
        assert 0.0 <= r["score"] <= 1.0


def test_linear_quality_score_weights_paths_agree(spark):
    """The literal-array weight path and the broadcast-join path (forced
    via max_literal_features=0) produce identical scores."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
        linear_quality_score,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i % 5} common word{i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    weights = [((j * 13) % 7 - 3) / 10.0 for j in range(16)]
    lit = sorted(
        map(tuple, linear_quality_score(
            df, "doc_id", "text", n_features=16, weights=weights, bias=0.1,
        ).collect())
    )
    joined = sorted(
        map(tuple, linear_quality_score(
            df, "doc_id", "text", n_features=16, weights=weights, bias=0.1,
            max_literal_features=0,
        ).collect())
    )
    assert lit == joined


def test_linear_quality_score_null_text_both_paths(spark):
    """Null-text docs score exactly σ(bias) on BOTH the literal and the
    broadcast weight paths (review r7: the literal path's aggregate()
    over a NULL token array returned NULL before the coalesce)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
        linear_quality_score,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some words here")],
        "doc_id long, text string",
    )
    lit_rows = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in linear_quality_score(
            df, "doc_id", "text", n_features=8,
            weights=[0.1] * 8, bias=-0.05,
        ).collect()
    }
    big_rows = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in linear_quality_score(
            df, "doc_id", "text", n_features=8,
            weights=[0.1] * 8, bias=-0.05, max_literal_features=4,
        ).collect()
    }
    assert lit_rows == big_rows
    assert lit_rows[1] == (-0.05, False)  # null text → σ(bias), not NULL
    assert lit_rows[2] == (-0.05, False)


# ---------------------------------------------------------------------------
# Luhn-validated card-number PII (r9)
# ---------------------------------------------------------------------------


def test_luhn_validation_known_numbers(spark):
    """Textbook vectors: the classic 4111-1111-1111-1111 test number
    passes, off-by-one fails, 16 arbitrary digits fail, and both
    grouped separators are accepted."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
        luhn_valid_col,
    )

    rows = [
        ("4111111111111111", True),
        ("4111111111111112", False),
        ("4111-1111-1111-1111", True),
        ("4111 1111 1111 1111", True),
        ("1234567812345678", False),
        ("4111", False),  # too short → invalid, never an error
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "c string")
    got = {
        r["c"]: r["ok"]
        for r in df.select("c", luhn_valid_col(F.col("c")).alias("ok")).collect()
    }
    assert got == dict(rows)


def test_scan_and_redact_cards_false_positive_discipline(spark):
    """A Luhn-valid card is counted and redacted; a checksum-broken
    16-digit decoy is counted as a candidate but neither validated nor
    redacted (the discipline a naive digit regex lacks)."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
        redact_card_numbers,
        scan_card_numbers,
    )

    df = spark.createDataFrame(
        [
            (1, "pay 4111-1111-1111-1111 ok"),
            (2, "order id 4111-1111-1111-1112 is not a card"),
            (3, "no digits here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_candidates"], r["n_valid"])
        for r in scan_card_numbers(df, "doc_id", "text").collect()
    }
    assert got == {1: (1, 1), 2: (1, 0), 3: (0, 0)}
    red = {
        r["doc_id"]: r["text"]
        for r in redact_card_numbers(df, "text").collect()
    }
    assert red[1] == "pay [CARD] ok"
    assert "4111-1111-1111-1112" in red[2]  # decoy untouched


def test_seeded_cards_validate_and_decoys_fail(spark):
    """The in-query seeder's computed check digit really satisfies Luhn
    (python recomputation) and every decoy really fails; redact → rescan
    leaves zero valid cards but keeps the decoys."""
    import re

    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.pii import (
        redact_card_numbers,
        scan_card_numbers,
        seed_synthetic_cards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    seeded = seed_synthetic_cards(df, "doc_id", "text")

    def luhn(s):
        ds = [int(c) for c in re.sub(r"\D", "", s)]
        tot = 0
        for idx, dg in enumerate(ds):
            v = dg * 2 if (idx + 1) % 2 == 1 else dg
            tot += v - 9 if v > 9 else v
        return len(ds) == 16 and tot % 10 == 0

    for r in seeded.filter(F.col("doc_id") % 6 == 0).collect():
        m = re.search(r"pay ([\d-]+)", r["text_cards"])
        assert luhn(m.group(1)), m.group(1)
    for r in seeded.filter(F.col("doc_id") % 7 == 0).collect():
        m = re.search(r"ref ([\d-]+)", r["text_cards"])
        assert not luhn(m.group(1)), m.group(1)

    red = redact_card_numbers(seeded, "text_cards")
    rescan = scan_card_numbers(red, "doc_id", "text_cards").agg(
        F.sum("n_valid").alias("v"), F.sum("n_candidates").alias("c")
    ).collect()[0]
    assert rescan["v"] == 0
    assert rescan["c"] == sum(1 for i in range(100) if i % 7 == 0)
