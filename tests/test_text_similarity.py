"""Text analysis + similarity search operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
    RandomHyperplaneLSH,
    brute_force_topk,
    embedding_near_dup_pairs_blocked,
    ivf_assign,
    ivf_topk,
    knn_join,
    lsh_topk,
    take_centroids,
)
from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
    lang_id_col,
    profile_documents,
    quality_score_col,
    token_count_col,
)


def test_text_profile_shape(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "el perro es un animal")],
        "doc_id long, text string",
    )
    prof = {r["doc_id"]: r for r in profile_documents(df, "doc_id", "text").collect()}
    assert prof[1]["n_tokens"] == 6
    assert prof[1]["lang_pred"] == "en"
    assert prof[2]["lang_pred"] == "es"
    assert 0.0 <= prof[1]["quality"] <= 1.0
    assert len(prof[1]["fingerprint"]) == 32


def test_lang_id_unknown_and_ties(spark):
    df = spark.createDataFrame([(1, "zzz qqq xxx")], "doc_id long, text string")
    assert df.select(lang_id_col(F.col("text")).alias("l")).first()["l"] == "unknown"


def test_quality_monotonic_in_length(spark):
    df = spark.createDataFrame(
        [(1, "word " * 5), (2, "word " * 50)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["q"]
        for r in df.select(
            "doc_id", quality_score_col(F.col("text")).alias("q")
        ).collect()
    }
    assert rows[2] > rows[1]  # longer doc scores higher (up to the cap)


def _emb_df(spark, n=50, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int"),
        vecs,
    )


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _emb_df(spark)
    q = vecs[0]
    out = brute_force_topk(df, "vec_id", "embedding", list(q), k=5).collect()
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = vn @ (q / np.linalg.norm(q))
    expect = np.argsort(-np.round(sims, 4), kind="stable")[:5]
    assert [r["vec_id"] for r in out] == list(expect)
    assert out[0]["vec_id"] == 0 and abs(out[0]["sim"] - 1.0) < 1e-9


def test_knn_join_per_query_counts(spark):
    df, _ = _emb_df(spark)
    queries = df.filter(F.col("vec_id") < 3).withColumnRenamed("vec_id", "qid")
    out = knn_join(df, queries, data_id="vec_id", query_id="qid", k=4).collect()
    assert len(out) == 12
    per_q = {}
    for r in out:
        per_q.setdefault(r["qid"], []).append(r["rn"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in per_q.values())


def test_lsh_bucket_matches_driver_side(spark):
    """Executor-side bucket_col must agree with driver-side bucket_of."""
    df, vecs = _emb_df(spark, n=20)
    lsh = RandomHyperplaneLSH(dim=8, nbits=6, seed=42)
    got = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", lsh.bucket_col(F.col("embedding")).alias("b")
        ).collect()
    }
    for i in range(20):
        assert got[i] == lsh.bucket_of(list(vecs[i])), f"vec {i}"


def test_lsh_topk_recall(spark):
    df, vecs = _emb_df(spark, n=50)
    q = list(vecs[0])
    exact = [r["vec_id"] for r in brute_force_topk(df, "vec_id", "embedding", q, 5).collect()]
    approx = [
        r["vec_id"]
        for r in lsh_topk(
            df, "vec_id", "embedding", q, k=5, nbits=4, hamming_probe=2
        ).collect()
    ]
    # multiprobe at 4 bits covers most of the space → high recall, and the
    # query vector itself must always be found
    assert 0 in approx
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_assignment_and_topk(spark):
    df, vecs = _emb_df(spark, n=50)
    cents = take_centroids(df, "vec_id", "embedding", 4)
    assert cents.shape == (4, 8)
    assigned = ivf_assign(df, "embedding", cents)
    clusters = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert set(clusters.values()) <= {0, 1, 2, 3}
    # centroid vectors must assign to themselves
    for c in range(4):
        assert clusters[c] == c
    out = ivf_topk(
        df, "vec_id", "embedding", list(vecs[0]), k=3, n_centroids=4, nprobe=2
    ).collect()
    assert out[0]["vec_id"] == 0


def test_near_dup_blocked_symmetric_free(spark):
    df, _ = _emb_df(spark, n=30)
    pairs = embedding_near_dup_pairs_blocked(
        df, "vec_id", "embedding", "label", threshold=-1.0
    ).collect()
    # blocks of 10 per label → 3 * C(10,2) pairs, all id_a < id_b
    assert len(pairs) == 3 * 45
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_text_ratios_tolerate_empty_text(spark):
    """Empty text must not raise under ANSI: ratio metrics go null."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.text import (
        alpha_ratio_col,
        distinct_token_ratio_col,
        quality_score_col,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, ""), (2, "abc abc")], "id long, text string")
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            alpha_ratio_col(F.col("text")).alias("a"),
            distinct_token_ratio_col(F.col("text")).alias("d"),
            quality_score_col(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1]["a"] is None
    # splitting "" yields [""] — one empty token — so the distinct ratio
    # is 1/1, matching DuckDB's string_split_regex semantics, not null;
    # and least() skips nulls in BOTH engines, so the composite quality
    # degenerates to least(1.0, null-sum) = 1.0 rather than null
    assert rows[1]["d"] == 1.0
    assert rows[1]["q"] == 1.0
    assert rows[2]["a"] == pytest.approx(6 / 7)
    assert rows[2]["d"] == pytest.approx(0.5)


def test_blocked_np_pairs_match_expression_path(spark, sf_dir):
    """The BLAS block-matmul pair generator must be pair-identical to
    the expression path (including 4-decimal rounded sims) — on the real
    table and with a tiny chunk size forcing the striped-matmul code."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        embedding_near_dup_pairs_blocked_np,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted(
        map(
            tuple,
            embedding_near_dup_pairs_blocked(
                emb, "vec_id", "embedding", "label", threshold=0.4
            ).collect(),
        )
    )
    for chunk in (2048, 7):  # 7 forces many stripes per block
        b = sorted(
            map(
                tuple,
                embedding_near_dup_pairs_blocked_np(
                    emb, "vec_id", "embedding", "label",
                    threshold=0.4, chunk_rows=chunk,
                ).collect(),
            )
        )
        assert a == b, f"chunk={chunk}"


def test_ivf_index_parity_and_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF index returns exactly what the scan-based path
    returns with the same centroids, and its plan prunes to the probed
    cluster partitions."""
    import io
    from contextlib import redirect_stdout

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, "vec_id", "embedding", path, n_centroids=8)

    scan_based = ivf_topk(
        emb, "vec_id", "embedding", qv, k=10, nprobe=3, centroids=cents
    ).collect()
    indexed_df = ivf_index_topk(
        spark, path, qv, id_col="vec_id", vec_col="embedding", k=10, nprobe=3
    )
    assert [tuple(r) for r in indexed_df.collect()] == [
        tuple(r) for r in scan_based
    ]

    buf = io.StringIO()
    with redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cluster" in plan
    # rebuild determinism: same centroids byte-for-byte
    cents2 = build_ivf_index(
        emb, "vec_id", "embedding", str(tmp_path / "ivf2"), n_centroids=8
    )
    assert (cents == cents2).all()


def test_tuned_ann_params_restore_recall_both_sfs(spark):
    """The round-4 sweep finding: params hand-tuned at sf0.01 under-recall
    at sf0.001 (different sample). tune_lsh/tune_ivf derive params from
    corpus stats and restore recall 1.0 at BOTH scale factors."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        brute_force_topk,
        corpus_ann_stats,
        ivf_topk,
        lsh_topk,
        tune_ivf,
        tune_lsh,
    )

    for sf in ("0.001", "0.01"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
        exact = {
            r["vec_id"]
            for r in brute_force_topk(
                emb, "vec_id", "embedding", qv, k=10
            ).collect()
        }
        stats = corpus_ann_stats(emb, "vec_id", "embedding", qv, k=10)
        nbits, n_tables = tune_lsh(stats)
        lsh = {
            r["vec_id"]
            for r in lsh_topk(
                emb, "vec_id", "embedding", qv,
                k=10, nbits=nbits, hamming_probe=1, n_tables=n_tables,
            ).collect()
        }
        assert lsh == exact, f"LSH recall < 1.0 at sf{sf}"
        _, nprobe, cents = tune_ivf(emb, "vec_id", "embedding", qv, k=10)
        ivf = {
            r["vec_id"]
            for r in ivf_topk(
                emb, "vec_id", "embedding", qv,
                k=10, centroids=cents, nprobe=nprobe,
            ).collect()
        }
        assert ivf == exact, f"IVF recall < 1.0 at sf{sf}"


def test_lsh_index_parity_and_pruning(spark, sf_dir, tmp_path):
    """The persisted LSH index returns exactly what the scan-based
    multi-table path returns with the same params, and its plan prunes
    to the probed (t, bucket) partitions."""
    import io
    from contextlib import redirect_stdout

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        build_lsh_index,
        lsh_index_topk,
        lsh_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    path = str(tmp_path / "lsh")
    build_lsh_index(
        emb, "vec_id", "embedding", path, dim=len(qv), nbits=5, n_tables=4
    )
    indexed_df = lsh_index_topk(
        spark, path, qv, id_col="vec_id", vec_col="embedding", k=10
    )
    scan_based = lsh_topk(
        emb, "vec_id", "embedding", qv,
        k=10, nbits=5, hamming_probe=1, n_tables=4,
    ).collect()
    assert [tuple(r) for r in indexed_df.collect()] == [
        tuple(r) for r in scan_based
    ]

    buf = io.StringIO()
    with redirect_stdout(buf):
        indexed_df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_cluster_balanced_sample_contract(spark):
    """Cluster-balance sampler: every row is assigned to its true
    nearest centroid (python argmin twin), per-cluster kept rows follow
    the greedy hash-order budget, and rare clusters survive whole."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        assign_clusters_literal,
        cluster_balanced_sample,
    )

    cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, -1.0]]
    # cluster 0: many expensive rows (budget must bite); cluster 1: a few
    # cheap rows (survives whole); cluster 2: one row
    rows = [(i, [0.9 + 0.01 * (i % 5), 0.05], 50) for i in range(20)]
    rows += [(100 + i, [0.05, 1.1], 10) for i in range(4)]
    rows += [(200, [-0.9, -0.8], 10)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, n_tokens long"
    )

    assigned = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_literal(df, "embedding", cents).collect()
    }
    for vid, vec, _ in rows:
        dists = [
            sum((x - c) ** 2 for x, c in zip(vec, cent)) for cent in cents
        ]
        assert assigned[vid] == dists.index(min(dists)), vid

    kept = cluster_balanced_sample(
        df, "vec_id", "embedding", "n_tokens", cents, budget=100
    ).collect()
    by_c = {}
    for r in kept:
        by_c.setdefault(r["cluster"], []).append(r)
    # budget 100 over 50-token docs → greedy keeps docs while before<100:
    # offsets 0, 50 and the overshooting third (before=100 is NOT < 100)
    assert len(by_c[0]) == 2
    # cheap clusters fit entirely
    assert len(by_c[1]) == 4
    assert len(by_c[2]) == 1
    # cost_before is the running prefix in every cluster
    for c, rs in by_c.items():
        rs = sorted(rs, key=lambda r: r["cost_before"])
        acc = 0
        for r in rs:
            assert r["cost_before"] == acc
            acc += r["n_tokens"]


def test_hard_negatives_label_rules_and_ranking(spark):
    """Same-label and same-id rows never occupy negative slots; NULL
    labels are excluded on BOTH sides (documented semantics: an
    unlabeled row can't be proven a negative); ranking is cosine DESC
    with id ASC tie-breaks."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        hard_negatives,
    )

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "a"),
            (2, [0.9, 0.1], "a"),  # same label as anchor -> excluded
            (3, [0.8, 0.2], "b"),
            (4, [0.0, 1.0], "b"),
            (5, [0.99, 0.01], None),  # NULL label -> never mined
        ],
        "vec_id long, embedding array<double>, label string",
    )
    out = hard_negatives(
        df,
        df.filter(F.col("vec_id") == 1),
        id_col="vec_id",
        vec_col="embedding",
        label_col="label",
        k=2,
    ).collect()
    assert [(r["negative_id"], r["rn"]) for r in sorted(out, key=lambda r: r["rn"])] == [
        (3, 1),
        (4, 2),
    ]
    assert all(r["anchor_id"] == 1 and r["anchor_label"] == "a" for r in out)
    # NULL-labeled anchor has no label to differ from -> zero rows
    assert (
        hard_negatives(
            df,
            df.filter(F.col("vec_id") == 5),
            id_col="vec_id",
            vec_col="embedding",
            label_col="label",
            k=2,
        ).count()
        == 0
    )


def test_incremental_semantic_filter_matches_bruteforce(spark):
    """Batch-vs-corpus semantic admission equals the exhaustive cosine
    recount (numpy twin) — batch/corpus pairs only, keep iff no corpus
    vector reaches the threshold."""
    import numpy as np

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        incremental_semantic_filter,
    )

    rng = np.random.default_rng(5)
    dim = 8
    base = rng.normal(size=(6, dim))
    corpus_rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
    batch_vecs = {
        10: base[0] + rng.normal(scale=0.01, size=dim),  # near-dup of 0
        11: rng.normal(size=dim),                        # novel
        12: base[3] * 2.0,                               # scaled dup of 3
    }
    batch_rows = [(i, [float(x) for x in v]) for i, v in batch_vecs.items()]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>"
    )
    t = 0.9

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return 0.0 if na == 0 or nb == 0 else float(a @ b / (na * nb))

    expect = {}
    for i, v in batch_vecs.items():
        nd = sum(1 for j in range(6) if round(cos(v, base[j]), 4) >= t)
        expect[i] = (nd, nd == 0)
    got = {
        r["vec_id"]: (r["n_corpus_dups"], r["keep"])
        for r in incremental_semantic_filter(
            corpus, batch, "vec_id", "embedding", dim,
            threshold=t, nbits=2, n_tables=24, verify_broadcast=True,
        ).collect()
    }
    assert got == expect
    assert not got[10][1] and not got[12][1] and got[11][1]


def test_pq_encode_python_replay_and_compression_shape(spark):
    """PQ codes replayed in numpy over fixed hand codebooks (the encode
    pass must be exactly per-slice L2-argmin after normalization), and
    the encoded table is m_sub small ints per row."""
    import numpy as np

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        pq_encode,
    )

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(float)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    codebooks = rng.normal(size=(2, 4, 4))  # m=2 slices, 4 codes, 4 dims
    got = {
        r["vec_id"]: list(r["pq_codes"])
        for r in pq_encode(df, "vec_id", "embedding", codebooks).collect()
    }
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for i, v in enumerate(unit):
        expect = [
            int(np.argmin(((codebooks[j] - v[j * 4 : (j + 1) * 4]) ** 2).sum(axis=1)))
            for j in range(2)
        ]
        assert got[i] == expect, (i, got[i], expect)
        assert len(got[i]) == 2


def test_pq_topk_matches_exact_on_fixture(spark, sf_dir):
    """The catalog configuration (m=16, 64 codes, shortlist 200) must
    return EXACTLY the brute-force top-10 on the embeddings fixture —
    the recall-1.0 contract the driver oracle checks; uniform-random
    embeddings are PQ's adversarial case, so this is the conservative
    end of the knob."""
    from pyspark.sql import functions as F

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = [
        (r["vec_id"], r["sim"])
        for r in brute_force_topk(emb, "vec_id", "embedding", q, 10).collect()
    ]
    got = [
        (r["vec_id"], r["sim"])
        for r in pq_topk(
            emb, "vec_id", "embedding", q,
            k=10, m_sub=16, n_codes=64, shortlist=200,
        ).collect()
    ]
    assert got == exact


def test_pq_guards(spark):
    """Non-divisible dims and a zero query fail loud."""
    import pytest

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        pq_codebooks,
        pq_topk,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks(df, "vec_id", "embedding", m_sub=2)
    df4 = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="zero query"):
        pq_topk(df4, "vec_id", "embedding", [0.0, 0.0, 0.0, 0.0], m_sub=2, n_codes=2)


def test_mmr_topk_diversifies_and_replays(spark):
    """MMR on a hand-built corpus: three near-copies of the best hit
    plus two orthogonal-ish vectors — plain top-3 returns the copies,
    MMR's rank-2/3 picks must skip them for the diverse vectors; the
    full greedy (pool cut, redundancy maxes, tie-breaks) replays in
    python to the integer."""
    import math

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        _cos_fold,
        mmr_topk,
    )

    q = [1.0, 0.0, 0.0, 0.0]
    vecs = {
        1: [0.990, 0.141, 0.0, 0.0],    # best hit
        2: [0.985, 0.172, 0.0, 0.0],    # near-copy of 1 (cos ~0.999)
        3: [0.980, 0.199, 0.0, 0.0],    # near-copy of 1
        4: [0.500, 0.0, 0.866, 0.0],    # relevant but different
        5: [0.450, 0.0, 0.0, 0.893],    # different again
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, v array<double>"
    )
    got = [
        (r["mmr_rank"], r["vec_id"], r["rel_q"], r["mmr_score"])
        for r in mmr_topk(
            df, "vec_id", "v", q, k=3, pool_size=5, lambda_pct=30
        ).collect()
    ]
    # python replay with the identical quantized greedy
    scale, lp, mu = 10_000, 30, 70
    rel = {
        i: math.floor(_cos_fold(v, q) * scale + 0.5)
        for i, v in vecs.items()
    }
    sel, expect = [], []
    cand = dict(vecs)
    for rank in range(1, 4):
        best = None
        for i, v in cand.items():
            ms = (
                max(
                    math.floor(_cos_fold(v, s) * scale + 0.5)
                    for s in sel
                )
                if sel
                else 0
            )
            score = lp * rel[i] - mu * ms
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, v, score)
        _, bi, bv, bs = best
        expect.append((rank, bi, rel[bi], bs))
        sel.append(bv)
        del cand[bi]
    assert got == expect, (got, expect)
    # the diversity contract: ranks 2 and 3 are NOT the near-copies
    assert [g[1] for g in got][0] == 1
    assert set(g[1] for g in got[1:]) == {4, 5}, got
    # plain top-3 WOULD return the three copies (the thing MMR fixes)
    top3 = sorted(rel, key=lambda i: (-rel[i], i))[:3]
    assert set(top3) == {1, 2, 3}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pool_size"):
        mmr_topk(df, "vec_id", "v", q, k=6, pool_size=3)
    with _pytest.raises(ValueError, match="lambda_pct"):
        mmr_topk(df, "vec_id", "v", q, k=2, pool_size=5, lambda_pct=101)


def test_mmr_lambda_extremes(spark):
    """λ=100% degenerates to plain relevance top-k (redundancy ignored);
    λ=0% after the forced rank-1 pick maximizes pure diversity (most
    NEGATIVE max-sim-to-selected)."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        mmr_topk,
    )

    q = [1.0, 0.0, 0.0]
    vecs = {
        1: [0.99, 0.10, 0.00],
        2: [0.98, 0.11, 0.00],
        3: [-0.50, 0.86, 0.00],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, v array<double>"
    )
    pure_rel = [
        r["vec_id"]
        for r in mmr_topk(
            df, "vec_id", "v", q, k=2, pool_size=3, lambda_pct=100
        ).collect()
    ]
    assert pure_rel == [1, 2]
    diverse = [
        r["vec_id"]
        for r in mmr_topk(
            df, "vec_id", "v", q, k=2, pool_size=3, lambda_pct=0
        ).collect()
    ]
    assert diverse == [1, 3]


def test_mmr_id_type_preserved_and_bad_vectors_filtered(spark):
    """ADVICE r12: the output id field carries the INPUT column's type
    (int ids used to crash the hardcoded 'id long' schema), and null /
    zero-norm corpus vectors are filtered before the pool cut instead
    of null-poisoning the driver greedy."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        mmr_topk,
    )

    q = [1.0, 0.0]
    df = spark.createDataFrame(
        [
            (1, [0.9, 0.1]),
            (2, [0.0, 0.0]),   # zero norm: cosine is null
            (3, None),         # null vector
            (4, [0.1, 0.9]),
        ],
        "vec_id int, v array<double>",
    )
    out = mmr_topk(df, "vec_id", "v", q, k=2, pool_size=4)
    assert out.schema["vec_id"].dataType.simpleString() == "int"
    got = [r["vec_id"] for r in out.collect()]
    assert got == [1, 4], got  # 2 and 3 never reach the pool


def test_lloyd_assignments_blobs_replay_and_empty_cluster(spark):
    """Exact-integer Lloyd on two separated 2-D blobs: assignments
    converge to the blobs and replay in python to the integer; two
    identical seed vectors empty one cluster (argmin ties go to the
    lower id) which then KEEPS its centroid instead of crashing."""
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        lloyd_assignments,
    )

    pts = {
        0: [0.00, 0.01],   # seed c0 (blob A)
        1: [0.00, 0.01],   # seed c1 — identical: c1 empties on ties
        2: [0.90, 0.88],   # seed c2 (blob B)
        3: [0.02, 0.00],
        4: [0.01, 0.03],
        5: [0.91, 0.90],
        6: [0.88, 0.93],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in pts.items()], "vec_id long, v array<double>"
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in lloyd_assignments(df, "vec_id", "v", k=3, iters=2).collect()
    }

    # python twin with the identical quantized arithmetic
    import math

    scale = 10**6
    q = {i: [math.floor(x * scale + 0.5) for x in v] for i, v in pts.items()}
    cents = [q[0], q[1], q[2]]

    def assign(cs):
        out = {}
        for i, v in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(v, c)), ci)
                for ci, c in enumerate(cs)
            )
            out[i] = best[1]
        return out

    for _ in range(2):
        a = assign(cents)
        new = []
        for ci in range(3):
            members = [q[i] for i, c in a.items() if c == ci]
            if not members:
                new.append(cents[ci])  # emptied: keep previous
                continue
            dims = len(members[0])
            cent = []
            for d in range(dims):
                s, n = sum(m[d] for m in members), len(members)
                t = abs(s) // n
                cent.append(-t if s < 0 else t)
            new.append(cent)
        cents = new
    expect = assign(cents)
    assert got == expect, (got, expect)
    # blob structure: B is cluster 2; A splits between 0 and the
    # REACTIVATED cluster 1 — it emptied on the round-1 tie rule, KEPT
    # its centroid (the contract under test), and that unmoved centroid
    # sits exactly on the duplicate seeds while c0's moved to A's mean,
    # so the seeds legitimately re-join it in the final assignment
    assert {got[i] for i in (0, 1, 3, 4)} <= {0, 1}
    assert {got[2], got[5], got[6]} == {2}
    assert got[0] == 1  # the reactivation actually happened

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds"):
        lloyd_assignments(df, "vec_id", "v", k=100, iters=1)
    with _pytest.raises(ValueError, match="iters"):
        lloyd_assignments(df, "vec_id", "v", k=2, iters=0)
    with _pytest.raises(ValueError, match="overflow"):
        lloyd_assignments(df, "vec_id", "v", k=2, iters=1, scale=10**16)
