"""5× structure-preserving scale replicas for the round-12 rows
(VERDICT r11 #4 — the five r11 operators had only single-SF points
before entering the driver gate).

Replica constructions, per operator:

- ``eigenvector_centrality`` / ``fastrp_embeddings``: five disjoint
  id-offset copies of the symmetrized co-order edges — per-copy degree
  structure identical, SAME iteration count over 5× data per round,
  output rows exactly 5× (asserted). Eigenvector's L1 total is global,
  so x5 scores differ by the 5× denominator — values change, row count
  and per-round join shape don't, which is what the protocol times.
- ``landmark_betweenness``: id-offset copies put all k landmarks in
  copy 0, which IS the operator's documented 100-TB shape — cost ∝
  landmarks × reachable set, NOT graph size ("landmark count is the
  precision/cost knob"). Expected wall ratio ≪ 5: the (seed, node)
  state stays x1-sized while only the adjacency side of each
  frontier join grows 5×. Output rows (all nodes) still 5× exactly.
- ``cms sketch+estimate``: 5× orders rows into the SAME fixed 4×256
  sketch (counters sum — sketch rows bounded, asserted ≤ depth·width),
  5× candidate keys → 5× output rows (asserted).
- ``events_cms_rollup``: 5× events with disjoint user ranges into the
  fixed-size merged sketch — the bounded-state control row: output
  bounded by depth·width at BOTH scales (asserted), wall should grow
  ~data (one narrow explode + a ≤16k-key groupBy).
- ``importance_weights`` (+ the composed top-fraction selection): five
  doc-id-offset copies, text/source unchanged — bucket counts scale
  uniformly (weights shift by the +1 smoothing only), per-doc rows and
  survivors grow exactly 5× (asserted; 0.25·2500 divides evenly).

Both scales read from parquet (replica build cost is untimed). Run:

    python scripts/scale_replica_r12.py [--trials N]

Prints one JSON line per operator: x1/x5 best-of-N seconds + ratio.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark.queries import (
    _BLOOM_K,
    _BLOOM_M,
    _BLOOM_ROLLUP_K,
    _BLOOM_ROLLUP_M,
    _BLOOM_SEED,
    _CMS_DEPTH,
    _CMS_ROLLUP_WIDTH,
    _CMS_SEED,
    _CMS_WIDTH,
    _DSIR_BUCKETS,
    _DSIR_SCALE,
    _DSIR_SELECT_FRACTION,
    _DSIR_TARGET_SOURCES,
    _co_order_edges,
)

OFFSET = 100_000_000


def replicate(df, id_cols, copies=5):
    """Five disjoint copies: id columns offset per copy, the rest
    carried verbatim."""
    out = None
    for r in range(copies):
        c = df.select(
            *[
                (F.col(x) + F.lit(r * OFFSET)).alias(x)
                if x in id_cols
                else F.col(x)
                for x in df.columns
            ]
        )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-replica-r12")
    root = tempfile.mkdtemp(prefix="r12_replica_")

    co30 = _co_order_edges(spark, sf_dir)
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") >= 30)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    co30w = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    from pyspark.sql import Window as PW

    ow = PW.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chains = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey").alias("sourceNodeId"),
            F.lead("o_orderkey").over(ow).alias("targetNodeId"),
        )
        .filter(F.col("targetNodeId").isNotNull())
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey"
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "ts", "user_id", "value", "event_id"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    inputs = {
        "co30": (co30, ["sourceNodeId", "targetNodeId"]),
        "co43": (
            _co_order_edges(spark, sf_dir, min_qty=43),
            ["sourceNodeId", "targetNodeId"],
        ),
        "heavyadj": (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_quantity") >= 45)
            .select(
                F.col("l_partkey").alias("sourceNodeId"),
                F.col("l_orderkey").alias("targetNodeId"),
            ),
            ["sourceNodeId", "targetNodeId"],
        ),
        "liqty": (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
                F.col("l_orderkey").alias("k"),
                "l_extendedprice", "l_quantity",
            ),
            ["k"],
        ),
        "ordwin": (
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                "o_custkey", "o_orderkey",
                F.col("o_orderdate").alias("win"),
            ),
            ["o_custkey", "o_orderkey"],
        ),
        "cc_delta": (
            _co_order_edges(spark, sf_dir, min_qty=42).exceptAll(
                _co_order_edges(spark, sf_dir, min_qty=43)
            ),
            ["sourceNodeId", "targetNodeId"],
        ),
        "liprice": (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
                F.col("l_orderkey").alias("k"), "l_extendedprice"
            ),
            ["k"],
        ),
        "liparts": (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
                F.col("l_orderkey").alias("bk"),
                F.col("l_partkey").alias("it"),
            ),
            ["bk", "it"],
        ),
        "emb": (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            ["vec_id"],
        ),
        "custorder": (
            spark.read.parquet(f"{sf_dir}/orders.parquet").select(
                F.col("o_custkey").alias("sourceNodeId"),
                (F.col("o_orderkey") + F.lit(1_000_000_000)).alias(
                    "targetNodeId"
                ),
            ),
            ["sourceNodeId", "targetNodeId"],
        ),
        "co30w": (co30w, ["u", "v"]),  # w carried verbatim per copy
        "chains": (chains, ["sourceNodeId", "targetNodeId"]),
        "orders": (orders, ["o_custkey"]),
        "customer": (customer, ["c_custkey"]),
        "events": (events, ["user_id", "event_id"]),
        "docs": (docs, ["doc_id"]),
    }
    paths: dict[str, dict[int, str]] = {}
    for name, (df, cols) in inputs.items():
        paths[name] = {}
        for scale in (1, 5):
            p = f"{root}/{name}_x{scale}"
            (df if scale == 1 else replicate(df, cols)).write.mode(
                "overwrite"
            ).parquet(p)
            paths[name][scale] = p

    def rd(name, scale):
        return spark.read.parquet(paths[name][scale])

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        community_modularity,
        dag_longest_path,
        eigenvector_centrality,
        fastrp_embeddings,
        label_propagation,
        landmark_betweenness,
        pagerank_weighted,
        rwr_sample,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        cms_estimate,
        cms_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.sampling import (
        importance_weights,
        top_fraction_per_group,
    )

    def cms_freq(s):
        sk = cms_sketch(
            rd("orders", s), "o_custkey",
            depth=_CMS_DEPTH, width=_CMS_WIDTH, seed=_CMS_SEED,
        )
        return cms_estimate(
            sk, rd("customer", s), "c_custkey",
            depth=_CMS_DEPTH, width=_CMS_WIDTH, seed=_CMS_SEED,
        )

    def cms_rollup(s):
        daily = rd("events", s).select(
            F.to_date("ts").alias("day"), "user_id"
        )
        per_day = cms_sketch(
            daily, "user_id",
            depth=_CMS_DEPTH, width=_CMS_ROLLUP_WIDTH, seed=_CMS_SEED,
            group_cols=("day",),
        )
        return per_day.groupBy("cms_row", "cms_bucket").agg(
            F.sum("cnt").alias("cnt")
        )

    def dsir_weights(s):
        d = rd("docs", s)
        return importance_weights(
            d, d.filter(F.col("source").isin(*_DSIR_TARGET_SOURCES)),
            "doc_id", "text",
            n_buckets=_DSIR_BUCKETS, ngram=2, scale=_DSIR_SCALE, seed=0,
        )

    def dsir_selection(s):
        d = rd("docs", s)
        scored = d.select("doc_id", "source").join(dsir_weights(s), "doc_id")
        return top_fraction_per_group(
            scored, "source", "importance_fp", "doc_id",
            fraction=_DSIR_SELECT_FRACTION,
        )

    def prw(s):
        pw = rd("co30w", s)
        edges = pw.select(
            F.col("u").alias("sourceNodeId"),
            F.col("v").alias("targetNodeId"), "w",
        ).unionByName(
            pw.select(
                F.col("v").alias("sourceNodeId"),
                F.col("u").alias("targetNodeId"), "w",
            )
        )
        nodes = edges.select(
            F.col("sourceNodeId").alias("nodeId")
        ).distinct()
        return pagerank_weighted(nodes, edges, "w", iters=4)

    ops = {
        "graph_eigenvector": lambda s: eigenvector_centrality(
            rd("co30", s), iters=4, directed=False
        ),
        # r12 growth ops: weighted PageRank (same per-round shape as
        # pagerank — ratio should track graph_pagerank's measured
        # trajectory) and DAG levels (rounds = chain depth, identical
        # per copy — the BFS-family shape)
        "graph_pagerank_weighted": prw,
        "graph_dag_levels": lambda s: dag_longest_path(
            rd("chains", s), max_iter=64
        ),
        # LPA is structure-deterministic per copy, so communities (and
        # their modularity rows) grow exactly 5×
        "graph_modularity": lambda s: community_modularity(
            rd("co30", s),
            label_propagation(
                rd("co30", s)
                .select(F.col("sourceNodeId").alias("nodeId"))
                .unionByName(
                    rd("co30", s).select(
                        F.col("targetNodeId").alias("nodeId")
                    )
                )
                .distinct(),
                rd("co30", s),
                iters=3,
                assume_canonical=True,
            ),
        ),
        "graph_betweenness": lambda s: landmark_betweenness(
            rd("co30", s), k_landmarks=4, max_hops=12
        ),
        "graph_fastrp": lambda s: fastrp_embeddings(
            rd("co30", s), dims=4, iter_weights=(1, 2, 1), seed=7,
            sparsity=3,
        ),
        "profile_cms_frequencies": cms_freq,
        "events_cms_rollup": cms_rollup,
        "sample_importance_weights": dsir_weights,
        "sample_dsir_selection": dsir_selection,
    }
    def rwr(s):
        seeds = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_size") == 50)
            .select((F.col("p_partkey")).alias("nodeId"))
        )
        # seeds replicated to match the graph copies
        if s == 5:
            seeds = replicate(seeds, ["nodeId"])
        canon = rd("co30", s)
        sym = canon.unionByName(
            canon.select(
                F.col("targetNodeId").alias("sourceNodeId"),
                F.col("sourceNodeId").alias("targetNodeId"),
            )
        )
        return rwr_sample(
            seeds, sym, walks_per_seed=3, walk_length=6, restart_ppt=200
        )

    ops["graph_rwr_sample"] = rwr

    # ---- r12 second wave: conductance, topo sort, bloom family ----
    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        portable_hash64_col,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        community_conductance,
        topological_order,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        bloom_probe,
        bloom_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.quality import (
        ngrams_col,
        words_col,
    )

    def conductance(s):
        # same LPA-label composition as modularity: label structure is
        # copy-deterministic, so community rows grow exactly 5×
        e = rd("co30", s)
        nodes = (
            e.select(F.col("sourceNodeId").alias("nodeId"))
            .unionByName(e.select(F.col("targetNodeId").alias("nodeId")))
            .distinct()
        )
        return community_conductance(
            e, label_propagation(nodes, e, iters=3, assume_canonical=True)
        )

    def topo(s):
        # levels identical per copy; ranks interleave copies in the
        # (level, id) order but the row count stays exactly 5×.
        # id offsets (≤ 4·10⁸ + orderkeys) stay far inside 2⁴⁰
        return topological_order(rd("chains", s), max_iter=64)

    def bloom_grams(side):
        return side.select(
            "doc_id",
            F.explode(ngrams_col(words_col(F.col("text")), 8)).alias(
                "_gram"
            ),
        ).select("doc_id", portable_hash64_col(F.col("_gram")).alias("_gh"))

    def decontaminate_bloom(s):
        # OFFSET is a multiple of 10, so every copy keeps its doc's
        # eval/train split; texts are verbatim per copy, so the filter
        # CONTENT is scale-invariant (same distinct gram hashes) and
        # per-train-doc flag counts replicate exactly
        d = rd("docs", s)
        ev = bloom_grams(d.filter(F.col("doc_id") % 10 == 0)).select("_gh")
        sk = bloom_sketch(
            ev, "_gh", m_bits=_BLOOM_M, k=_BLOOM_K, seed=_BLOOM_SEED
        )
        tr = bloom_grams(d.filter(F.col("doc_id") % 10 != 0))
        verdicts = bloom_probe(
            sk, tr.select("_gh").distinct(), "_gh",
            m_bits=_BLOOM_M, k=_BLOOM_K, seed=_BLOOM_SEED,
        )
        return (
            tr.join(verdicts, "_gh")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(
                    F.when(F.col("maybe_present"), 1).otherwise(0)
                ).cast("long").alias("n_flagged"),
            )
        )

    def bloom_rollup(s):
        daily = rd("events", s).select(
            F.to_date("ts").alias("day"), "user_id"
        )
        per_day = bloom_sketch(
            daily, "user_id",
            m_bits=_BLOOM_ROLLUP_M, k=_BLOOM_ROLLUP_K, seed=_BLOOM_SEED,
            group_cols=("day",),
        )
        return per_day.groupBy("bloom_word").agg(
            F.bit_or("bits").alias("bits")
        )

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        k1_coloring,
    )

    def k1(s):
        # q43 co-order fixture (the k-core graph): id-offset copies
        # keep per-copy priority structure IDENTICAL in distribution
        # but not in value (hashes change with ids), so round count may
        # drift ±1-2 across copies while rows stay exactly 5×
        return k1_coloring(rd("co43", s), seed=0, max_iter=24)

    ops["graph_k1coloring"] = k1

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        articlerank_fixedpoint,
    )

    def articlerank(s):
        # namespaced customer→order graph (the pagerank fixture): five
        # id-offset copies keep per-copy degree structure identical;
        # N and m grow 5× together so the mean-degree divisor is
        # copy-invariant and output rows are exactly 5×
        orders = rd("custorder", s)
        nodes = (
            orders.select(F.col("sourceNodeId").alias("nodeId"))
            .unionByName(
                orders.select(F.col("targetNodeId").alias("nodeId"))
            )
            .distinct()
        )
        return articlerank_fixedpoint(nodes, orders, iters=4)

    ops["graph_articlerank"] = articlerank

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        louvain_local_move,
    )

    def louvain(s):
        # id-offset copies change per-node activation hashes, so the
        # active half differs per copy — labels are copy-local either
        # way (communities never span copies) and rows stay exactly 5×
        return louvain_local_move(rd("co30", s), rounds=4)

    ops["graph_louvain_move"] = louvain

    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        pq_topk,
    )

    def pq(s):
        # 5x corpus through the SAME catalog configuration: codebooks
        # retrain on the bigger corpus (deterministic low-id sample),
        # the encode pass is the part that scales, and the output is
        # k rows at ANY corpus size (the bounded-output control)
        emb = rd("emb", s)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        return pq_topk(
            emb, "vec_id", "embedding", qv,
            k=10, m_sub=16, n_codes=64, shortlist=200,
        )

    ops["similarity_pq_topk"] = pq

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_quantiles,
    )

    def quantiles(s):
        # 5x the value multiset (copies carry prices verbatim): ranks
        # quintuple but every narrowing round still moves ≤ n_buckets
        # count rows; output is 4 rows at any scale
        return exact_quantiles(
            rd("liprice", s), "l_extendedprice",
            [0.25, 0.5, 0.9, 0.99], local_threshold=5_000,
        )

    ops["stats_exact_quantiles"] = quantiles

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    def snm(s):
        # texts are verbatim per copy, so each copy's sorted run
        # INTERLEAVES with the others' (equal keys order by offset
        # ids) — the window fills with identical cross-copy twins:
        # candidates stay ∝ n·(window−1) (the SNM linearity the wall
        # ratio verifies) while VERIFIED pairs may exceed 5× (twins
        # always pass the threshold; band-asserted, not exact)
        return sorted_neighborhood_pairs(
            rd("docs", s), "doc_id", "text", window=8, threshold=0.5
        )

    ops["dedup_sorted_neighborhood"] = snm
    ops["graph_conductance"] = conductance
    ops["graph_topo_order"] = topo
    ops["text_decontaminate_bloom"] = decontaminate_bloom
    ops["events_bloom_rollup"] = bloom_rollup

    # ---- r12 fourth wave: KMV, MMR, association rules, assortativity
    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        degree_assortativity,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.itemsets import (
        frequent_pair_rules,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        kmv_estimate,
        kmv_sketch,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        mmr_topk,
    )
    from dataflow_flex_pyarrow_to_gds_spark.queries import (
        _ASSOC_MAX_BASKET,
        _ASSOC_MIN_SUPPORT,
        _KMV_K,
        _KMV_ROLLUP_K,
        _KMV_SEED,
        _MMR_LAMBDA_PCT,
        _MMR_POOL,
        _MMR_SCALE,
    )

    def kmv_distinct(s):
        # 5× rows AND 5× distinct part keys (both bk and it offset per
        # copy) — the sketch state stays k rows, the estimate tracks
        # the 5× cardinality; output is ONE row at any scale
        return kmv_estimate(
            kmv_sketch(rd("liparts", s), "it", k=_KMV_K, seed=_KMV_SEED),
            k=_KMV_K,
        )

    def kmv_rollup(s):
        daily = rd("events", s).select(
            F.to_date("ts").alias("day"), "user_id"
        )
        per_day = kmv_sketch(
            daily, "user_id",
            k=_KMV_ROLLUP_K, seed=_KMV_SEED, group_cols=("day",),
        )
        from pyspark.sql import Window as _W

        w = _W.orderBy(F.asc("kmv_hash"))
        return (
            per_day.select("kmv_hash")
            .distinct()
            .select(
                "kmv_hash", F.row_number().over(w).alias("kmv_pos")
            )
            .filter(F.col("kmv_pos") <= _KMV_ROLLUP_K)
            .select("kmv_pos", "kmv_hash")
        )

    def mmr(s):
        # 5× corpus through the same pool/λ: the distributed pool cut
        # is the part that scales, the greedy stays pool-bounded and
        # the output is k rows at ANY corpus size
        emb = rd("emb", s)
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        return mmr_topk(
            emb, "vec_id", "embedding", qv,
            k=5, pool_size=_MMR_POOL, lambda_pct=_MMR_LAMBDA_PCT,
            scale=_MMR_SCALE,
        )

    def assoc(s):
        # both basket and item ids offset per copy → five disjoint
        # markets with identical per-copy pair structure: rule rows
        # exactly 5× (per-copy supports identical; lift shifts with
        # the 5× basket total — values change, shape doesn't)
        return frequent_pair_rules(
            rd("liparts", s), "bk", "it",
            min_support=_ASSOC_MIN_SUPPORT,
            max_basket_items=_ASSOC_MAX_BASKET,
        )

    ops["stats_kmv_distinct"] = kmv_distinct
    ops["events_kmv_rollup"] = kmv_rollup
    ops["similarity_mmr_topk"] = mmr
    ops["assoc_rules_parts"] = assoc
    ops["graph_assortativity"] = lambda s: degree_assortativity(
        rd("co30", s)
    )

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        scale_properties,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        lloyd_assignments,
    )

    def kmeans(s):
        # copies are identical point sets on offset ids: the k lowest
        # ids stay in copy 0 (same seeds), and 5 identical copies have
        # the same per-cluster means as one — so every copy reproduces
        # the x1 assignment and rows grow exactly 5×; the iteration
        # count is fixed by contract either way
        return lloyd_assignments(
            rd("emb", s), "vec_id", "embedding", k=4, iters=3
        )

    def scaleprops(s):
        # min/max are copy-invariant and sum/n grow together, so every
        # scaled value replicates exactly; rows exactly 5×
        d = rd("liprice", s).select(
            F.col("k").alias("id"),
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_c"),
        )
        return scale_properties(d, "id", "price_c")

    ops["graph_kmeans"] = kmeans
    ops["graph_scale_properties"] = scaleprops

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        token_set_col,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        drift_buckets,
    )

    def drift(s):
        # texts are verbatim per copy, so both sides' bucket counts
        # grow exactly 5x together: proportions (and the occupied
        # bucket set) are copy-invariant while the chi-square terms
        # scale ~linearly with N, the statistic's defined behavior
        toks = rd("docs", s).select(
            "source",
            F.explode(token_set_col(F.col("text"))).alias("token"),
        ).filter(F.col("token") != "")
        return drift_buckets(
            toks.filter(F.col("source") == "src1").select("token"),
            toks.filter(F.col("source") == "src2").select("token"),
            "token",
            n_buckets=64,
        )

    ops["stats_drift_tokens"] = drift

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        robust_outliers,
        value_histogram,
    )

    def hist(s):
        # min/max copy-invariant (prices verbatim per copy) -> same
        # edges, counts exactly 5x, bucket set identical
        d = rd("liprice", s).select(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_c")
        )
        return value_histogram(d, "price_c", n_buckets=32)

    def outliers(s):
        # values verbatim per copy -> median and MAD copy-invariant,
        # flagged rows exactly 5x; each quantile pass still moves only
        # <= n_buckets count rows per round
        return robust_outliers(
            rd("events", s), "event_id", "value", local_threshold=5_000
        )

    ops["stats_histogram_prices"] = hist
    ops["events_robust_outliers"] = outliers

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        connected_components,
        connected_components_incremental,
    )

    def cc_inc(s):
        # id-offset copies keep per-copy merge structure identical:
        # old labels, delta edges, and the super-graph all grow 5x
        # together while staying delta-bounded; output rows exactly 5x
        old_e = rd("co43", s)
        delta = rd("cc_delta", s)
        nodes = (
            old_e.select(F.col("sourceNodeId").alias("nodeId"))
            .unionByName(
                old_e.select(F.col("targetNodeId").alias("nodeId"))
            )
            .distinct()
        )
        labels = connected_components(nodes, old_e, max_iter=30)
        return connected_components_incremental(
            labels, delta, max_iter=30
        )

    ops["graph_cc_incremental"] = cc_inc

    from dataflow_flex_pyarrow_to_gds_spark.streaming.events import (
        resample_locf,
    )

    def locf(s):
        # user ids offset per copy, (ts, value) verbatim: each copy
        # reproduces the x1 grid and fills -> rows exactly 5x; the
        # window partitions stay span-bounded per key at both scales
        return resample_locf(
            rd("events", s), "user_id", "ts", "value", "event_id"
        )

    ops["events_resample_locf"] = locf

    from dataflow_flex_pyarrow_to_gds_spark.operators.asof import (
        interval_overlap_join,
    )

    def ovl(s):
        # custkey AND orderkey offset per copy: five disjoint customer
        # namespaces with identical per-copy window structure -> pairs
        # exactly 5x
        days = F.datediff(
            F.col("win"), F.lit("1970-01-01").cast("date")
        ).cast("long")
        o = rd("ordwin", s).select(
            "o_custkey", "o_orderkey", days.alias("s"),
            (days + F.lit(14)).alias("e"),
        )
        out = interval_overlap_join(
            o.withColumnRenamed("o_orderkey", "o1"),
            o.withColumnRenamed("o_orderkey", "o2"),
            left_id="o1", left_start="s", left_end="e",
            right_id="o2", right_start="s", right_end="e",
            keys=("o_custkey",), bucket=16,
        )
        return out.filter(F.col("o1") < F.col("o2"))

    ops["overlap_join_orders"] = ovl

    from dataflow_flex_pyarrow_to_gds_spark.operators.profile import (
        exact_weighted_quantiles,
    )

    def wq(s):
        # prices and quantities verbatim per copy: every weighted rank
        # quintuples but lands on the same VALUE (each copy contributes
        # the identical weight mass); per round the exchange still
        # moves <= n_buckets (weight, count) pairs. Output fixed at
        # one row per requested q.
        d = rd("liqty", s)
        return exact_weighted_quantiles(
            d, "l_extendedprice", "l_quantity",
            [0.25, 0.5, 0.9], local_threshold=5_000,
        )

    ops["stats_weighted_quantiles"] = wq

    from dataflow_flex_pyarrow_to_gds_spark.operators.graph_algo import (
        node_similarity,
    )
    from pyspark.sql import Window as _PW

    def nstopk(s):
        # part AND order ids offset per copy -> five disjoint
        # adjacencies with identical per-copy neighbor sets: pair
        # stream, per-node lists, and ranks replicate exactly 5x
        pairs = node_similarity(rd("heavyadj", s), threshold=0.1)
        sym = pairs.select(
            F.col("node_a").alias("node"),
            F.col("node_b").alias("peer"),
            "jaccard_ppm",
        ).unionByName(
            pairs.select(
                F.col("node_b").alias("node"),
                F.col("node_a").alias("peer"),
                "jaccard_ppm",
            )
        )
        w = _PW.partitionBy("node").orderBy(
            F.desc("jaccard_ppm"), F.asc("peer")
        )
        return sym.select(
            "node", "peer", "jaccard_ppm",
            F.row_number().over(w).alias("rk"),
        ).filter(F.col("rk") <= 3)

    ops["graph_node_similarity_topk"] = nstopk

    # fixed-size sketch outputs: name -> max rows at ANY input scale
    bounded = {
        "events_cms_rollup": _CMS_DEPTH * _CMS_ROLLUP_WIDTH,
        "events_bloom_rollup": _BLOOM_ROLLUP_M // 64,
        "similarity_pq_topk": 10,  # top-k at any corpus size
        "stats_exact_quantiles": 4,  # one row per requested q
        "stats_kmv_distinct": 1,  # one estimate row at any scale
        "events_kmv_rollup": _KMV_ROLLUP_K,  # ≤ k sketch rows
        "similarity_mmr_topk": 5,  # k picks at any corpus size
        "graph_assortativity": 1,  # one statistics row
        "stats_drift_tokens": 64,  # <= n_buckets rows at any scale
        "stats_histogram_prices": 32,  # <= n_buckets rows at any scale
        "stats_weighted_quantiles": 3,  # one row per requested q
    }
    #: hash-driven walks differ per id-offset copy, so the distinct
    #: visited set varies per copy — assert the ratio, not exactness
    #: (the graph_walk_skipgrams precedent)
    ratio_only = {"graph_rwr_sample"}
    #: SNM x5: equal-key runs interleave the five copies, so the window
    #: fills with jaccard-1.0 cross-copy twins that PASS the threshold
    #: where x1's boundary pairs did not — VERIFIED pairs can therefore
    #: exceed 5× (measured 5.6×) even though CANDIDATES stay exactly
    #: ∝ n·(window−1); the hard ceiling is candidates(x5)/verified(x1)
    band_only = {"dedup_sorted_neighborhood": (1.0, 8.0)}

    if "--only" in sys.argv:
        keep = set(
            sys.argv[sys.argv.index("--only") + 1].split(",")
        )
        ops = {k: v for k, v in ops.items() if k in keep}

    results = {}
    for name, fn in ops.items():
        rows = {}
        best = {1: 1e9, 5: 1e9}
        for scale in (1, 5):
            rows[scale] = fn(scale).count()  # warm + structure check
        if name in bounded:
            assert rows[1] <= rows[5] <= bounded[name], (name, rows)
        elif name in ratio_only:
            assert 4.0 <= rows[5] / rows[1] <= 6.0, (name, rows)
        elif name in band_only:
            lo, hi = band_only[name]
            assert lo <= rows[5] / rows[1] <= hi, (name, rows)
        elif name == "sample_dsir_selection":
            # per-source survivors are ceil(f·n): 5·ceil(f·n) − ceil(f·5n)
            # ∈ [0, 4] per source, so the x5 count may fall short of 5×
            # by up to 4 × n_sources — ceiling granularity, not replica
            # coupling
            assert 0 <= 5 * rows[1] - rows[5] <= 4 * 20, (name, rows)
        else:
            assert rows[5] == 5 * rows[1], (name, rows)
        for _ in range(trials):
            for scale in (1, 5):
                t0 = time.perf_counter()
                fn(scale).write.format("noop").mode("overwrite").save()
                best[scale] = min(best[scale], time.perf_counter() - t0)
        results[name] = {
            "x1_sec": round(best[1], 2),
            "x5_sec": round(best[5], 2),
            "wall_ratio": round(best[5] / best[1], 2),
            "rows_x1": rows[1],
            "rows_x5": rows[5],
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"all": results, "loadavg": os.getloadavg()[0]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
