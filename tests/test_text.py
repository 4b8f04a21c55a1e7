

def test_bpe_token_count_hand_computed(spark):
    """'the'→[the]=1; 'thin'→[th,in]=2; 'tether'→[t,e,the,r]=4 (merge
    cascade t,h→th then th,e→the; e..r not adjacent); empty/null → 0."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [(1, "the thin tether"), (2, ""), (3, None), (4, "zzz")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(df, "doc_id", "text").collect()
    }
    assert got == {1: (3, 7), 2: (0, 0), 3: (0, 0), 4: (1, 3)}


def test_bpe_token_count_saturates_alternating_runs(spark):
    """'ththth' merges EVERY (t,h) occurrence — the double replace pass
    catches the boundary-sharing occurrences one pass skips."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [(1, "ththth thththth")], "doc_id long, text string"
    )
    got = bpe_token_count(df, "doc_id", "text").collect()[0]
    assert (got["n_words"], got["n_bpe_tokens"]) == (1 + 1, 3 + 4)


def test_bpe_merges_fire_on_fixture(spark):
    """Non-vacuity at the catalog config: on the documents fixture the
    encoded count must be strictly below the raw character count for
    many docs (merges actually fire)."""
    from pyspark.sql import functions as F
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_token_count,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chars = docs.select(
        "doc_id",
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")).alias("nc"),
    )
    j = bpe_token_count(docs, "doc_id", "text").join(chars, "doc_id")
    n_merged = j.filter(F.col("n_bpe_tokens") < F.col("nc")).count()
    assert n_merged > j.count() * 0.5


def test_chunking_udtf_matches_vectorized(spark):
    """The §2.10 Python-UDTF chunker reproduces the JVM operator
    row-for-row (including empty/null docs emitting nothing)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        chunk_documents,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.udtf_chunk import (
        chunk_documents_udtf,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(80))),
            (2, "short doc"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, chunk_documents_udtf(
        spark, docs, chunk_tokens=32, overlap=8).collect()))
    b = sorted(map(tuple, chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8).collect()))
    assert a == b and a  # non-vacuous
    assert not any(r[0] in (3, 4) for r in a)
    # Unicode whitespace: Java regex \\s is ASCII-only, so NBSP must NOT
    # tokenize — the UDTF splits with re.ASCII to match (review r7)
    nbsp = spark.createDataFrame(
        [(9, "foo\u00a0bar baz")], "doc_id long, text string"
    )
    ua = sorted(map(tuple, chunk_documents_udtf(
        spark, nbsp, chunk_tokens=2, overlap=0).collect()))
    ub = sorted(map(tuple, chunk_documents(
        nbsp, "doc_id", "text", chunk_tokens=2, overlap=0).collect()))
    assert ua == ub
    assert ua[0][2] == 2 and "foo\u00a0bar" in ua[0][3]


def test_strip_html_rules(spark):
    """Tag→space, six entities in single-pass order (&amp; LAST — the
    double-escape case stays literal text), whitespace collapse, trim,
    and the documented script-body non-goal."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        strip_html_col,
    )

    rows = [
        (1, "<p>a<br>b</p>"),
        (2, "&amp;lt;x&amp;gt;"),  # decodes ONCE: literal &lt;x&gt;
        (3, 'A &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp; f'),
        (4, "<script>var x=1;</script>ok"),
        (5, "  <div>  spaced   out  </div>  "),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", strip_html_col(F.col("html")).alias("c")
        ).collect()
    }
    assert got[1] == "a b"
    assert got[2] == "&lt;x&gt;"
    assert got[3] == 'A <b> "c" \'d\' e & f'
    assert got[4] == "var x=1; ok"
    assert got[5] == "spaced out"


def test_seed_synthetic_markup_is_deterministic_and_strips_clean(spark):
    """The seeded fixture round-trips: markup in, the original text (plus
    the seeded visible words) out — and the seeding is a pure function
    of the id."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        seed_synthetic_markup,
        strip_html_col,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(12)], "doc_id long, text string"
    )
    seeded = seed_synthetic_markup(df, "doc_id", "text")
    out = {
        r["doc_id"]: r["c"]
        for r in seeded.select(
            "doc_id", strip_html_col(F.col("html")).alias("c")
        ).collect()
    }
    assert out[0] == "doc 0 body Tom & Jerry &lt;3 var x = 1;"
    assert out[1] == 'doc 1 body 5 > 4 "quoted"'
    assert out[2] == "doc 2 body it's here"
    # pure function of the id: a second invocation is identical
    again = {
        r["doc_id"]: r["c"]
        for r in seed_synthetic_markup(df, "doc_id", "text")
        .select("doc_id", strip_html_col(F.col("html")).alias("c"))
        .collect()
    }
    assert out == again


def test_bpe_arrow_parity_with_expression_encoder(spark, sf_dir):
    """The Arrow-batched rank-dict encoder and the expression-tree
    replace chain must produce IDENTICAL counts on the demo merge table
    over the real fixture corpus (the udtf_chunk parity pattern), and
    agree on null/empty/single-char edge docs."""
    from pyspark.sql import functions as F  # noqa: F401

    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_token_count,
        bpe_token_count_arrow,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(docs, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count_arrow(docs, "doc_id", "text").collect()
    }
    assert a == b and len(a) == docs.count()
    edge = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x"), (4, "  the  thin  "), (5, "ththt")],
        "doc_id long, text string",
    )
    ea = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count(edge, "doc_id", "text").collect()
    }
    eb = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_count_arrow(edge, "doc_id", "text").collect()
    }
    assert ea == eb
    assert ea[1] == (0, 0) and ea[2] == (0, 0) and ea[3] == (1, 1)
    # 'the' -> th -> the (1 token); 'thin' -> th,in (2)
    assert ea[4] == (2, 3)


def test_bpe_arrow_scales_with_word_length_not_vocab(spark):
    """A 512-merge table must not change the Arrow path's answer shape
    (the expression path would chain 1024 replaces per word — the
    documented bound this operator exists for)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        bpe_token_count_arrow,
    )

    big = [("t", "h"), ("th", "e")] + [
        (chr(97 + i % 26), chr(97 + (i * 7 + 3) % 26)) for i in range(510)
    ]
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "zzz")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count_arrow(
            df, "doc_id", "text", merges=big
        ).collect()
    }
    assert got[1] == 3  # 'the' fully merges under ranks 0..1
    assert got[2] >= 1


def test_chunking_udtf_arrow_matches_row_path(spark):
    """The Arrow-optimized UDTF (@udtf(useArrow=True)) is bit-identical
    to the pickled row-path UDTF and the JVM operator — including the
    ASCII-whitespace rule and empty/null doc behavior."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        chunk_documents,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.udtf_chunk import (
        chunk_documents_udtf,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(80))),
            (2, "short doc"),
            (3, ""),
            (4, None),
            (5, "foo bar baz qux"),
        ],
        "doc_id long, text string",
    )
    arrow = sorted(map(tuple, chunk_documents_udtf(
        spark, docs, chunk_tokens=32, overlap=8, use_arrow=True).collect()))
    rowp = sorted(map(tuple, chunk_documents_udtf(
        spark, docs, chunk_tokens=32, overlap=8, use_arrow=False).collect()))
    jvm = sorted(map(tuple, chunk_documents(
        docs, "doc_id", "text", chunk_tokens=32, overlap=8).collect()))
    assert arrow == rowp == jvm and arrow
