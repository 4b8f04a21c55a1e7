"""5× structure-preserving scale replicas for the four round-10
non-graph catalog rows (VERDICT r10 #7 — the graph family got this
protocol in r10; these rows had only single-SF points).

Replica constructions, per row:

- ``retrieval_hybrid_rrf``: five id-offset copies of documents AND
  embeddings. BM25 scores are ratio-invariant under exact 5×
  replication (n_docs, df, and dl all scale together), and each
  replica's cosine scores repeat exactly, so the fused top-20 stays a
  20-row output — the realistic shape for a top-k operator (corpus
  grows, shortlist doesn't). Asserted: 20 rows at both scales.
- ``dedup_containment_groups``: five copies of the containment fixture
  with id offsets AND per-replica token tags (every token prefixed
  ``r{k}·``) — within-replica containment relations are preserved
  exactly, cross-replica overlap is zero, so group rows grow exactly
  5× (asserted).
- ``stats_hll_rollup``: five copies of events with disjoint user-id
  ranges, same days — per-day exact distincts grow exactly 5× (the
  sketch estimate must track), output stays days+1 rows (asserted,
  plus the 5× exact_users check).
- ``web_url_normalize``: five id-offset copies of the doc-id seed
  column — output rows grow exactly 5× (asserted); the operator is a
  zero-shuffle narrow map, so this is the control row.

Both scales read from parquet (replica build cost is untimed). Run:

    python scripts/scale_replica_r10misc.py [--trials N]

Prints one JSON line per row: x1/x5 best-of-N seconds + wall ratio.
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

OFFSET = 100_000_000


def main() -> int:
    trials = 3
    if "--trials" in sys.argv:
        trials = int(sys.argv[sys.argv.index("--trials") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="scale-replica-r10misc")
    root = tempfile.mkdtemp(prefix="r10misc_replica_")

    import dataflow_flex_pyarrow_to_gds_spark.queries as Q

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding", "label"
    )
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "ts", "user_id"
    )
    fixture = Q._containment_fixture(spark, sf_dir).select("doc_id", "text")

    def write_both(name, x1, x5):
        p1, p5 = f"{root}/{name}_x1", f"{root}/{name}_x5"
        x1.write.mode("overwrite").parquet(p1)
        x5.write.mode("overwrite").parquet(p5)
        return {1: p1, 5: p5}

    def idcopies(df, idcols, textcol=None, copies=5):
        out = None
        for r in range(copies):
            c = df
            for col in idcols:
                c = c.withColumn(col, F.col(col) + F.lit(r * OFFSET))
            if textcol is not None:
                c = c.withColumn(
                    textcol,
                    F.regexp_replace(F.col(textcol), r"(\S+)", f"r{r}·$1"),
                )
            out = c if out is None else out.unionByName(c)
        return out

    paths = {
        "docs": write_both("docs", docs, idcopies(docs, ["doc_id"])),
        "emb": write_both("emb", emb, idcopies(emb, ["vec_id"])),
        "events": write_both(
            "events", events, idcopies(events, ["user_id"])
        ),
        "fixture": write_both(
            "fixture", fixture, idcopies(fixture, ["doc_id"], "text")
        ),
    }

    def rd(name, scale):
        return spark.read.parquet(paths[name][scale])

    from dataflow_flex_pyarrow_to_gds_spark.operators.dedup import (
        containment_near_dup_pairs,
        near_dup_groups,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.retrieval import (
        bm25_topk,
        hybrid_rrf_topk,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.similarity import (
        brute_force_topk,
    )
    from dataflow_flex_pyarrow_to_gds_spark.operators.web import (
        normalize_url_col,
        seed_synthetic_urls_col,
        url_domain_col,
        url_host_col,
    )

    def rrf(s):
        lex = bm25_topk(
            rd("docs", s), "doc_id", "text",
            ["hash", "vector", "window"], k=50,
        )
        qv = Q._query_vec(spark, sf_dir)
        sem = brute_force_topk(
            rd("emb", s), "vec_id", "embedding", qv, k=50
        ).withColumnRenamed("vec_id", "doc_id")
        return hybrid_rrf_topk([(lex, "bm25"), (sem, "sim")], "doc_id", k=20)

    def containment_groups(s):
        pairs = containment_near_dup_pairs(
            rd("fixture", s), "doc_id", "text",
            threshold=0.9, shingle_k=3,
            # the session sweeps two corpora — use the r11 lifecycle
            # option instead of leaking two slim-projection caches
            unpersist_after=True,
        )
        return near_dup_groups(pairs)

    def hll(s):
        ev = rd("events", s).select(F.to_date("ts").alias("day"), "user_id")
        daily = ev.groupBy("day").agg(
            F.hll_sketch_agg("user_id").alias("_sk"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        per_day = daily.select(
            F.col("day").cast("string").alias("day"),
            F.col("exact_users").cast("long").alias("exact_users"),
            (
                F.abs(F.hll_sketch_estimate("_sk") - F.col("exact_users"))
                / F.col("exact_users") <= 0.10
            ).alias("apx_ok"),
        )
        exact_total = ev.agg(F.countDistinct("user_id").alias("exact_users"))
        merged = (
            daily.agg(
                F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_apx")
            )
            .crossJoin(exact_total)
            .select(
                F.lit("ALL").alias("day"),
                F.col("exact_users").cast("long").alias("exact_users"),
                (
                    F.abs(F.col("_apx") - F.col("exact_users"))
                    / F.col("exact_users") <= 0.10
                ).alias("apx_ok"),
            )
        )
        return per_day.unionByName(merged)

    def urls(s):
        u = seed_synthetic_urls_col(F.col("doc_id"))
        return rd("docs", s).select(
            "doc_id",
            u.alias("url_raw"),
            normalize_url_col(u).alias("url_norm"),
            url_host_col(u).alias("host"),
            url_domain_col(u).alias("domain"),
        )

    ops = {
        "retrieval_hybrid_rrf": (rrf, "topk"),       # 20 rows both scales
        "dedup_containment_groups": (containment_groups, "x5"),
        "stats_hll_rollup": (hll, "fixed"),          # days+1 both scales
        "web_url_normalize": (urls, "x5"),
    }

    results = {}
    for name, (fn, kind) in ops.items():
        rows = {}
        for scale in (1, 5):
            rows[scale] = fn(scale).count()  # warm + structure check
        if kind == "x5":
            assert rows[5] == 5 * rows[1], (name, rows)
        elif kind == "topk":
            assert rows[1] == rows[5] == 20, (name, rows)
        else:
            assert rows[1] == rows[5], (name, rows)
        if name == "stats_hll_rollup":
            # per-day exact distincts must scale exactly 5× and every
            # sketch estimate must stay within its bound
            base_days: dict = {}
            for scale in (1, 5):
                got = {
                    r["day"]: (r["exact_users"], r["apx_ok"])
                    for r in fn(scale).collect()
                }
                assert all(ok for _, ok in got.values()), (scale, got)
                if scale == 1:
                    base_days = {d: v[0] for d, v in got.items()}
                else:
                    for day, (n, _ok) in got.items():
                        assert n == 5 * base_days[day], (day, n)
        best = {1: 1e9, 5: 1e9}
        for _ in range(trials):
            for scale in (1, 5):
                if name == "dedup_containment_groups":
                    spark.catalog.clearCache()
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
    print(json.dumps({"all": results, "sf_dir": sf_dir,
                      "load1": os.getloadavg()[0]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
