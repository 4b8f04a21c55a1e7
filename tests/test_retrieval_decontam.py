"""Round-5 additions: exact set-similarity join, decontamination removal,
bigram LM scoring, BM25 retrieval — each checked against a Python twin on
hand-built corpora (the catalog oracle covers the sf0.01 scale)."""

import itertools
import math

from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
    decontaminate,
    set_similarity_join_pairs,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
    bigram_logprob_profile,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import bm25_topk


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "dog lazy the over jumps fox brown quick the"),  # same token set
    (3, "the quick brown fox jumps over the lazy cat"),  # 8/10 jaccard
    (4, "completely different content about spark engines"),
    (5, "the quick brown fox jumps over the lazy dog today"),  # superset
    (6, "spark engines process completely different content"),  # ≙ 4 set
    (7, "one lone token"),
]


def _tokset(text):
    return set(text.lower().split())


def _exhaustive_pairs(threshold):
    out = {}
    for (ia, ta), (ib, tb) in itertools.combinations(DOCS, 2):
        a, b = _tokset(ta), _tokset(tb)
        j = len(a & b) / len(a | b)
        if j >= threshold:
            out[(min(ia, ib), max(ia, ib))] = round(j, 6)
    return out


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_set_similarity_exact_vs_exhaustive(spark):
    for threshold in (0.5, 0.7, 0.9):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in set_similarity_join_pairs(
                _docs_df(spark), "doc_id", "text", threshold=threshold
            ).collect()
        }
        assert got == _exhaustive_pairs(threshold), f"t={threshold}"


def test_set_similarity_shuffle_verify_path_identical(spark):
    df = _docs_df(spark)
    bcast = set_similarity_join_pairs(
        df, "doc_id", "text", threshold=0.6, broadcast_verify=True
    )
    shuffle = set_similarity_join_pairs(
        df, "doc_id", "text", threshold=0.6, broadcast_verify=False
    )
    key = lambda r: (r["id_a"], r["id_b"], r["jaccard"])  # noqa: E731
    assert sorted(map(key, bcast.collect())) == sorted(
        map(key, shuffle.collect())
    )


def test_decontaminate_drops_overlapping_train_docs(spark):
    span = "alpha beta gamma delta"
    train = spark.createDataFrame(
        [
            (1, f"{span} one two"),  # contains the test 4-gram
            (2, "clean doc with no shared span at all here"),
            (3, "tiny"),  # < n words → no grams → always kept
        ],
        "doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, f"prefix {span} suffix")], "doc_id long, text string"
    )
    kept = decontaminate(train, test, "doc_id", "text", n=4).collect()
    by_id = {r["doc_id"]: r for r in kept}
    assert set(by_id) == {2, 3}
    assert by_id[3]["n_grams"] == 0 and by_id[3]["n_test_hits"] == 0
    assert by_id[2]["n_grams"] == 6 and by_id[2]["n_test_hits"] == 0


def test_decontaminate_max_hits_threshold(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    )  # grams: "a b c d", "b c d e"
    test = spark.createDataFrame(
        [(9, "x a b c d y")], "doc_id long, text string"
    )  # shares exactly one 4-gram
    assert decontaminate(train, test, "doc_id", "text", n=4).count() == 0
    relaxed = decontaminate(
        train, test, "doc_id", "text", n=4, max_hits=1
    ).collect()
    assert [(r["doc_id"], r["n_test_hits"]) for r in relaxed] == [(1, 1)]


def test_bigram_logprob_matches_python_twin(spark):
    rows = [(1, "a b a b"), (2, "a b c"), (3, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # corpus bigrams: doc1: (a,b),(b,a),(a,b); doc2: (a,b),(b,c)
    counts = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    ctx = {"a": 3, "b": 2}
    nlp = {
        bg: round(-math.log(c / ctx[bg[0]]), 6) for bg, c in counts.items()
    }
    expect = {}
    for doc_id, text in rows[:2]:
        w = text.split()
        bgs = list(zip(w, w[1:]))
        s = round(sum(nlp[b] for b in bgs), 6)
        expect[doc_id] = (len(bgs), s, round(s / len(bgs), 4))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_neglogp"], r["avg_neglogp"])
        for r in bigram_logprob_profile(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 2}  # doc 3 has no bigrams
    for doc_id, (n, s, avg) in expect.items():
        gn, gs, gavg = got[doc_id]
        assert gn == n
        assert abs(gs - s) < 1e-6
        assert abs(gavg - avg) < 1e-9


def test_bm25_matches_python_twin(spark):
    rows = [
        (1, "hash join hash probe"),
        (2, "vector scan"),
        (3, "window window window frame"),
        (4, "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["hash", "vector", "window"]
    k1, b = 1.2, 0.75
    docs = {i: t.split() for i, t in rows}
    n_docs = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n_docs
    dfreq = {
        t: sum(1 for w in docs.values() if t in w) for t in terms
    }
    expect = {}
    for i, w in docs.items():
        score = 0.0
        for t in terms:
            tf = w.count(t)
            idf = math.log(
                1.0 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            score += round(
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * ((1.0 - b) + b * len(w) / avgdl)),
                6,
            )
        if any(t in w for t in terms):
            expect[i] = round(score, 6)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, "doc_id", "text", terms, k=10).collect()
    }
    assert set(got) == set(expect) == {1, 2, 3}
    for i in expect:
        assert abs(got[i] - expect[i]) < 1e-9


def test_bm25_k_limit_and_ordering(spark):
    df = spark.createDataFrame(
        [(i, "hash " * (i + 1)) for i in range(5)],
        "doc_id long, text string",
    )
    top2 = bm25_topk(df, "doc_id", "text", ["hash"], k=2).collect()
    assert len(top2) == 2
    assert top2[0]["bm25"] >= top2[1]["bm25"]


def test_bm25_empty_terms_and_case_insensitive(spark):
    """Empty query bags return an empty k-schema frame; uppercase terms
    match the lowercased corpus (r5 advice: both previously misfired —
    IndexError and a silent zero-contribution respectively)."""
    df = spark.createDataFrame(
        [(1, "hash table lookup"), (2, "vector index")],
        "doc_id long, text string",
    )
    empty = bm25_topk(df, "doc_id", "text", [], k=5)
    assert empty.columns == ["doc_id", "bm25"]
    assert empty.count() == 0
    upper = bm25_topk(df, "doc_id", "text", ["HASH"], k=5).collect()
    assert [r["doc_id"] for r in upper] == [1]


def test_new_ops_tolerate_null_and_empty_text(spark):
    """Null/empty text must not error under ANSI mode (the established
    round-5 convention): docs without tokens simply drop out of
    pair/score outputs; decontaminate always keeps them."""
    # TWO empty/whitespace-only docs (r5 advice): split() yields [""]
    # for them, and without the operator's empty-token filter they
    # would become identical singleton sets {xxhash64("")} and be
    # reported as a jaccard-1.0 pair.
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d"), (4, "a b c d"), (5, "   ")],
        "doc_id long, text string",
    )
    pairs = set_similarity_join_pairs(
        df, "doc_id", "text", threshold=0.5
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(3, 4)}

    test_side = spark.createDataFrame(
        [(9, None), (10, "")], "doc_id long, text string"
    )
    kept = decontaminate(df, test_side, "doc_id", "text", n=2).collect()
    assert {r["doc_id"] for r in kept} == {1, 2, 3, 4, 5}

    bl = bigram_logprob_profile(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in bl} == {3, 4}

    bm = bm25_topk(df, "doc_id", "text", ["a"], k=10).collect()
    assert {r["doc_id"] for r in bm} == {3, 4}


def test_set_similarity_random_corpora_vs_exhaustive(spark):
    """Generative exactness check: random token-set corpora (including
    planted near-dups and identical sets) match the Python exhaustive
    join at every threshold — both collapse paths."""
    import random

    vocab = [f"tok{i}" for i in range(30)]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = []
        for i in range(25):
            k = rng.randint(1, 12)
            rows.append((i, " ".join(rng.sample(vocab, k))))
        # planted: identical set (reordered), near-dup, exact dup
        rows.append((100, " ".join(reversed(rows[0][1].split()))))
        rows.append((101, rows[1][1] + " extraword"))
        rows.append((102, rows[2][1]))
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def exhaustive(threshold):
            import itertools

            out = {}
            for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
                a, b = set(ta.lower().split()), set(tb.lower().split())
                j = len(a & b) / len(a | b)
                if j >= threshold:
                    out[(min(ia, ib), max(ia, ib))] = round(j, 6)
            return out

        for threshold in (0.4, 0.8):
            for collapse in (True, False):
                got = {
                    (r["id_a"], r["id_b"]): r["jaccard"]
                    for r in set_similarity_join_pairs(
                        df,
                        "doc_id",
                        "text",
                        threshold=threshold,
                        collapse_identical=collapse,
                    ).collect()
                }
                assert got == exhaustive(threshold), (
                    f"seed={seed} t={threshold} collapse={collapse}"
                )


def test_bm25_join_per_query_topk_and_no_match(spark):
    """bm25_join: per-query k limit, per-query ranking agrees with the
    single-query literal path, and queries matching nothing vanish."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import (
        bm25_join,
    )

    corpus = spark.createDataFrame(
        [(i, "hash " * (i + 1) + "table") for i in range(5)]
        + [(9, "vector index")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "hash"), (2, "vector"), (3, "zzz-no-such-term")],
        "query_id long, query_text string",
    )
    rows = bm25_join(
        corpus, queries, "doc_id", "text", k=2
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {1, 2}  # query 3 matches nothing
    assert len(by_q[1]) == 2  # k-limited
    assert [r["doc_id"] for r in by_q[2]] == [9]
    # agrees with the literal-term single-query path
    single = bm25_topk(corpus, "doc_id", "text", ["hash"], k=2).collect()
    got = sorted(
        [(r["doc_id"], r["bm25"]) for r in by_q[1]], key=lambda t: -t[1]
    )
    want = [(r["doc_id"], r["bm25"]) for r in single]
    assert got == want


def test_bm25_join_shuffle_parity(spark):
    """broadcast_queries=False (the beyond-broadcast-budget fallback for
    query tables that don't fit an executor) returns IDENTICAL rows via
    shuffle equi-joins — only the join strategy moves (VERDICT r6 #8)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import (
        bm25_join,
    )

    corpus = spark.createDataFrame(
        [(i, "hash " * (i % 3 + 1) + "table vector") for i in range(8)]
        + [(20, "window join"), (21, "vector window")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "hash table"), (2, "vector"), (3, "window"), (4, "zzz")],
        "query_id long, query_text string",
    )
    bcast = sorted(
        map(tuple, bm25_join(corpus, queries, "doc_id", "text", k=3).collect())
    )
    shuf = bm25_join(
        corpus, queries, "doc_id", "text", k=3, broadcast_queries=False
    )
    assert sorted(map(tuple, shuf.collect())) == bcast


def test_hybrid_rrf_fuses_ranks_exactly(spark):
    """RRF against a hand-recount: integer contributions 1e9 div (60+r),
    ties by ascending id, ids present in only one run still fuse."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import (
        RRF_SCALE,
        hybrid_rrf_topk,
    )

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)], "doc_id long, s1 double"
    )
    sem = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "doc_id long, s2 double"
    )
    got = {
        r["doc_id"]: (r["rrf_fp"], r["n_runs"])
        for r in hybrid_rrf_topk(
            [(lex, "s1"), (sem, "s2")], "doc_id", k=10
        ).collect()
    }
    c = lambda r: RRF_SCALE // (60 + r)  # noqa: E731
    expect = {
        1: (c(1) + c(3), 2),   # lex rank 1, sem rank 3
        2: (c(2), 1),          # 5.0 tie with doc 3 → id asc: rank 2
        3: (c(3) + c(1), 2),   # lex rank 3 (tie-loser), sem rank 1
        4: (c(4), 1),
        5: (c(2), 1),
    }
    assert got == expect, (got, expect)


def test_hybrid_rrf_grouped_by_query(spark):
    """Grouped fusion: ranks and the final top-k are computed per query
    partition (the bm25_join-shaped input)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import (
        RRF_SCALE,
        hybrid_rrf_topk,
    )

    a = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0), (2, 20, 9.0)],
        "query_id long, doc_id long, s double",
    )
    b = spark.createDataFrame(
        [(1, 11, 0.9), (2, 21, 0.5), (2, 20, 0.4)],
        "query_id long, doc_id long, s double",
    )
    got = {
        (r["query_id"], r["doc_id"]): r["rrf_fp"]
        for r in hybrid_rrf_topk(
            [(a, "s"), (b, "s")], "doc_id", by="query_id", k=2
        ).collect()
    }
    c = lambda r: RRF_SCALE // (60 + r)  # noqa: E731
    # query 1: doc 11 fused (rank2 + rank1), doc 10 lex-only rank1
    # query 2: doc 20 fused (rank1 + rank2), doc 21 sem-only rank1
    expect = {
        (1, 11): c(2) + c(1),
        (1, 10): c(1),
        (2, 20): c(1) + c(2),
        (2, 21): c(1),
    }
    assert got == expect, (got, expect)
