"""Similarity search over embedding columns (array<float>).

Three tiers, trading exactness for scale:

1. :func:`brute_force_topk` — exact cosine top-k against one query vector.
   O(N·d) single narrow pass + TakeOrdered; the correctness baseline.
2. :func:`knn_join` — exact top-k for a *set* of query vectors: broadcast
   the (small) query side, per-query window top-k. O(N·Q·d) but no
   shuffle of the big side beyond the final per-query top-k.
3. Approximate scale paths:
   - :class:`RandomHyperplaneLSH` — deterministic signed-projection
     signatures, bucket equi-join + exact re-rank (sublinear candidates).
   - :func:`ivf_assign` / :func:`ivf_topk` — IVF: partition vectors by
     nearest centroid (vectorized pandas UDF — an honest matmul is the
     right tool here), probe the closest ``nprobe`` centroids at query
     time, exact re-rank within. At 100 TB the centroid assignment is
     the only full pass; queries touch ~nprobe/C of the data.

Vector math is built-in-function composition (``zip_with``/``aggregate``,
JVM codegen) — floats are cast to double before accumulation so results
are reproducible against a double-precision oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.scalar import cosine_similarity


def _as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k vs one query vector → (id, sim) with
    deterministic tie-break on id."""
    sim = cosine_similarity(_as_double(F.col(vec_col)), _query_lit(query_vec))
    return (
        df.select(F.col(id_col), F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def knn_join(
    data: DataFrame,
    queries: DataFrame,
    *,
    data_id: str,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact k-NN join: for each query row, the k nearest data rows.

    The query side is broadcast (it must be small — that is what makes
    exact k-NN joinable at scale); the data side is never shuffled until
    the per-query top-k window, which AQE right-sizes.
    """
    q = queries.select(
        F.col(query_id).alias("_qid"), _as_double(F.col(vec_col)).alias("_qvec")
    )
    d = data.select(
        F.col(data_id).alias("_did"), _as_double(F.col(vec_col)).alias("_dvec")
    )
    sim = cosine_similarity(F.col("_dvec"), F.col("_qvec"))
    w = W.partitionBy("_qid").orderBy(F.desc("sim"), F.asc("_did"))
    return (
        d.crossJoin(F.broadcast(q))
        .select("_qid", "_did", F.round(sim, 4).alias("sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("_qid").alias(query_id),
            F.col("_did").alias(data_id),
            "sim",
            "rn",
        )
    )


def hard_negatives(
    data: DataFrame,
    anchors: DataFrame,
    *,
    id_col: str,
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining: for each anchor, the ``k`` corpus rows most
    similar to it that carry a DIFFERENT label (and a different id) —
    the pairs that teach a contrastive/retrieval model the most,
    because they sit exactly where the decision boundary is wrong.

    Same scale contract as :func:`knn_join`: the anchor set is
    broadcast (mining runs over a sampled anchor batch, not all-pairs),
    the corpus is never shuffled until the per-anchor top-k window,
    and the label-inequality filter runs BEFORE ranking so positives
    never occupy top-k slots. ``sim`` is cosine rounded to 4 (the
    cross-engine float rule all similarity rows follow).

    Output: ``(anchor_id, negative_id, anchor_label, negative_label,
    sim, rn)`` with ``rn`` 1-based by descending similarity, id
    ascending on ties.

    NULL labels are EXCLUDED by design (ADVICE r08, made explicit):
    a NULL-labeled corpus row cannot be proven a different-label
    negative (it might be an unlabeled positive — mining it would
    poison the contrastive loss), and a NULL-labeled anchor has no
    label to differ from, so it yields zero rows. The standard
    ``!=`` filter gives exactly that semantics (NULL comparison →
    NULL → dropped); label your anchors/corpus upstream if unlabeled
    rows should participate.
    """
    a = anchors.select(
        F.col(id_col).alias("_aid"),
        F.col(label_col).alias("anchor_label"),
        _as_double(F.col(vec_col)).alias("_avec"),
    )
    d = data.select(
        F.col(id_col).alias("_did"),
        F.col(label_col).alias("negative_label"),
        _as_double(F.col(vec_col)).alias("_dvec"),
    )
    # r15 (guide §2.5 input parallelism): the per-(corpus row × anchor)
    # cosine is the dominant CPU and ran at the corpus file's split
    # count; no-op exchange at real many-split scale
    from .dedup import spread_to_cluster

    d = spread_to_cluster(d)
    sim = cosine_similarity(F.col("_dvec"), F.col("_avec"))
    w = W.partitionBy("_aid").orderBy(F.desc("sim"), F.asc("_did"))
    return (
        d.crossJoin(F.broadcast(a))
        .filter(
            (F.col("negative_label") != F.col("anchor_label"))
            & (F.col("_did") != F.col("_aid"))
        )
        .select(
            "_aid",
            "_did",
            "anchor_label",
            "negative_label",
            F.round(sim, 4).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            F.col("_aid").alias("anchor_id"),
            F.col("_did").alias("negative_id"),
            "anchor_label",
            "negative_label",
            "sim",
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

class RandomHyperplaneLSH:
    """Deterministic signed random projections → nbits-bit bucket ids.

    Hyperplane signs derive from md5(seed,i,j) — stable across sessions
    and languages, so signatures are reproducible (no RNG state shipped
    to executors; the sign matrix is a plan literal).
    """

    def __init__(self, dim: int, nbits: int = 16, seed: int = 42):
        self.dim, self.nbits, self.seed = dim, nbits, seed
        self.signs = [
            [self._sign(seed, i, j) for j in range(dim)] for i in range(nbits)
        ]

    @staticmethod
    def _sign(seed: int, i: int, j: int) -> float:
        h = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
        return 1.0 if h[0] % 2 == 0 else -1.0

    def _signs_lit(self) -> Column:
        # One F.expr call instead of nbits×dim F.lit py4j round trips:
        # building this literal Column-by-Column measured ~2-4 s of
        # DRIVER time per query build at 4 tables × 12 bits × 64 dims
        # (the plan is identical — CreateArray of double literals —
        # only the construction path changes; signs are exactly ±1.0,
        # so the text form is lossless). r15, guide §5: driver work is
        # part of the query's wall time too.
        rows = ",".join(
            "array(" + ",".join(f"{s!r}D" for s in row) + ")"
            for row in self.signs
        )
        return F.expr(f"array({rows})")

    def bucket_col(self, vec: Column) -> Column:
        """nbits-bit bucket id of a vector column (JVM-side)."""
        signs = self._signs_lit()
        bits = F.transform(
            F.sequence(F.lit(0), F.lit(self.nbits - 1)),
            lambda i: F.aggregate(
                F.zip_with(
                    _as_double(vec),
                    F.element_at(signs, i + 1),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
        )
        return F.aggregate(
            F.zip_with(
                bits,
                F.array(*[F.lit(1 << i) for i in range(self.nbits)]),
                lambda b, m: F.when(b, m).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc.bitwiseOR(v),
        )

    def bucket_of(self, query_vec: list[float]) -> int:
        v = np.asarray(query_vec, dtype=np.float64)
        out = 0
        for i, row in enumerate(self.signs):
            if float(v @ np.asarray(row)) >= 0:
                out |= 1 << i
        return out

    def probe_buckets(self, query_vec: list[float], hamming: int = 1) -> list[int]:
        """Query bucket plus all buckets within the given Hamming radius
        (multi-probe: recovers recall lost to near-boundary projections)."""
        base = self.bucket_of(query_vec)
        probes = [base]
        if hamming >= 1:
            probes += [base ^ (1 << i) for i in range(self.nbits)]
        if hamming >= 2:
            probes += [
                base ^ (1 << i) ^ (1 << j)
                for i in range(self.nbits)
                for j in range(i + 1, self.nbits)
            ]
        return probes


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
    nbits: int = 12,
    hamming_probe: int = 1,
    seed: int = 42,
    n_tables: int = 1,
    exact_below: int = 0,
) -> DataFrame:
    """ANN top-k: restrict to LSH-probed buckets, exact re-rank within.

    ``exact_below`` (0 = off) is the minhash exact-crossover rule
    applied to ANN: at or below that corpus size, brute force IS the
    better index (one narrow pass, recall 1.0 by construction — fixed
    LSH params are corpus-specific and under-recall tiny corpora). Off
    by default so tests exercise the approximate machinery at any size;
    catalog rows enable it.

    ``n_tables`` > 1 is the standard OR-construction: a row is a candidate
    if it collides with the query in ANY table (independent hyperplane sets
    per table, seeds ``seed..seed+L-1``). Recall rises as 1-(1-p^b)^L while
    the scan stays one pass — the candidate predicate is a single
    disjunction evaluated per row, not L separate scans.
    """
    if exact_below and df.count() <= exact_below:
        return brute_force_topk(df, id_col, vec_col, query_vec, k)

    dim = len(query_vec)
    cond = None
    for t in range(n_tables):
        lsh = RandomHyperplaneLSH(dim, nbits=nbits, seed=seed + t)
        probes = lsh.probe_buckets(query_vec, hamming=hamming_probe)
        c = lsh.bucket_col(F.col(vec_col)).isin(probes)
        cond = c if cond is None else (cond | c)
    candidates = df.filter(cond)
    return brute_force_topk(candidates, id_col, vec_col, query_vec, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) partitioned search
# ---------------------------------------------------------------------------

def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def take_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> np.ndarray:
    """Deterministic centroid seed: the n lowest-id vectors — the cheap
    fallback when no index-build budget exists. Prefer
    :func:`kmeans_centroids` (same contract) for real builds."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.asc(id_col))
        .limit(n_centroids)
        .collect()
    )
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    *,
    seed: int = 42,
    sample_rows: int = 100_000,
    max_iter: int = 20,
) -> np.ndarray:
    """Spark ML KMeans fit for IVF centroids — same signature/contract as
    :func:`take_centroids`; the driver receives only the k centers.

    Scale + determinism: the fit set is a deterministic low-id sample
    capped at ``sample_rows`` (k-means quality saturates long before the
    full corpus; FAISS-style practice is 30-256 samples per centroid),
    coalesced to one partition so the k-means|| init and aggregation
    order are reproducible run-to-run — a rebuilt index must assign
    identically or downstream recall checks go nondeterministic. The
    full-corpus pass stays in :func:`ivf_assign`.
    """
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    fit_set = (
        df.select(F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v"))
        .orderBy(F.asc("_id"))
        .limit(sample_rows)
        .select(array_to_vector(F.col("_v")).alias("features"))
        .coalesce(1)
    )
    model = MLKMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(fit_set)
    centers = sorted(
        (np.asarray(c, dtype=np.float64).tolist() for c in model.clusterCenters()),
        key=tuple,
    )
    return np.array(centers, dtype=np.float64)


def ivf_assign(
    df: DataFrame, vec_col: str, centroids: np.ndarray, out_col: str = "cluster"
) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid.

    Vectorized pandas UDF: the assignment is a dense matmul per Arrow
    batch — numpy beats any per-element JVM expression here, and the
    centroid matrix ships once per executor (closure broadcast).
    """
    cn = _normalize_rows(centroids)

    @F.pandas_udf("int")
    def assign(s: pd.Series) -> pd.Series:
        v = np.stack(s.to_numpy())
        vn = _normalize_rows(v.astype(np.float64))
        return pd.Series(np.argmax(vn @ cn.T, axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    assigned: DataFrame | None = None,
    exact_below: int = 0,
) -> DataFrame:
    """IVF ANN top-k: probe the nprobe nearest centroids, exact re-rank.

    Pass ``assigned`` (a df that already has a ``cluster`` column, e.g.
    persisted by a build step) to skip re-assignment — the realistic
    deployment shape where the index is built once and queried many times.
    Centroids default to a Spark ML KMeans fit (:func:`kmeans_centroids`);
    pass precomputed ``centroids`` to skip the build.
    """
    # the lsh_topk exact-crossover rule (see that docstring); checked
    # BEFORE any k-means fit so tiny corpora skip the build entirely
    if exact_below and df.count() <= exact_below:
        return brute_force_topk(df, id_col, vec_col, query_vec, k)

    if centroids is None:
        centroids = kmeans_centroids(df, id_col, vec_col, n_centroids)
    cn = _normalize_rows(centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = np.argsort(-(cn @ qn))[:nprobe].tolist()

    if assigned is None:
        assigned = ivf_assign(df, vec_col, centroids)
    candidates = assigned.filter(F.col("cluster").isin([int(p) for p in probe]))
    return brute_force_topk(candidates, id_col, vec_col, query_vec, k)


def corpus_ann_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
) -> dict:
    """Measure the two numbers ANN tuning needs: corpus size and the
    k-th true neighbor's angle to the query (one exact top-k pass).

    At 100 TB run this on a uniform sample / held-out query set — an
    index build already pays a full pass, and the k-th-neighbor angle
    from a sample upper-bounds the full-corpus angle (more rows only
    pull the k-th neighbor closer, i.e. recall tuned on the sample stays
    conservative for the angle term; re-tune n_rows for selectivity).
    """
    import math

    rows = brute_force_topk(df, id_col, vec_col, query_vec, k=k).collect()
    kth_sim = float(rows[-1]["sim"]) if rows else 1.0
    return {
        "n_rows": df.count(),
        "theta_k": math.acos(max(-1.0, min(1.0, kth_sim))),
        "k": k,
    }


def tune_lsh(
    stats: dict,
    *,
    target_miss: float = 1e-3,
    hamming_probe: int = 1,
    target_candidate_frac: float = 0.5,
    max_nbits: int = 24,
) -> tuple[int, int]:
    """Analytic (nbits, n_tables) from corpus stats — the formulas from
    the :func:`lsh_topk` docstring solved for the knobs instead of
    hand-tuned per corpus (the round-4 sweep showed sf0.01-tuned params
    under-recall at sf0.001 — tuning is corpus-specific by design).

    Per-bit agreement for a neighbor at angle θ is p = 1 − θ/π; one
    table with Hamming-1 probing finds it with probability
    q = p^b + b·p^(b−1)·(1−p); L independent tables miss it with
    probability (1−q)^L, union-bounded over the k neighbors:
    k·(1−q)^L ≤ target_miss  ⇒  L = ⌈ln(target_miss/k)/ln(1−q)⌉.

    nbits b is chosen first, for selectivity, as the max of two rules:
    (1) the near-orthogonal bulk of a high-dim corpus collides per
    table with probability ≈ (1/2)^b, times (1+b) probed buckets — b
    grows until the expected scanned fraction drops under
    ``target_candidate_frac`` (small corpora get small b: recall costs
    nothing when the full scan is already cheap); (2) the bucket-size
    rule 2^b ≥ n_rows / target_bucket_rows — nbits must grow with the
    corpus (log₂ n) or buckets grow linearly and per-bucket work
    quadratically, the scale knob every LSH note in this repo calls
    out.

    The solved L is deliberately not capped: when the k-th neighbor is
    only weakly similar (large θ) and n is huge, the honest table count
    explodes — that is the analytic signal that hyperplane LSH is the
    wrong index for the corpus (use IVF or deeper multiprobe), not a
    number to silently clamp.
    """
    import math

    n, theta, k = stats["n_rows"], stats["theta_k"], stats.get("k", 10)
    p = 1.0 - theta / math.pi
    b = 4
    while (
        b < max_nbits
        and (0.5 ** b) * (1 + b * (hamming_probe >= 1)) > target_candidate_frac
    ):
        b += 1
    target_bucket_rows = 64
    if n > target_bucket_rows:
        b = max(b, math.ceil(math.log2(n / target_bucket_rows)))
    b = min(b, max_nbits)
    q = p ** b
    if hamming_probe >= 1:
        q += b * (p ** (b - 1)) * (1.0 - p)
    q = min(q, 1.0 - 1e-12)
    if q <= 0.0:
        raise ValueError("degenerate stats: zero per-table hit probability")
    L = max(1, math.ceil(math.log(target_miss / k) / math.log(1.0 - q)))
    return b, L


def tune_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
    n_centroids: int | None = None,
    safety: int = 1,
    seed: int = 42,
) -> tuple[int, int, np.ndarray]:
    """Corpus-adaptive (n_centroids, nprobe, centroids) for IVF.

    n_centroids defaults to the standard √n rule (clamped [4, 64] for
    this repo's scales; at 100 TB clamp higher). nprobe is MEASURED, not
    assumed: fit the centroids, find the true top-k (exact pass — this
    is an index-build-time cost, same as the assignment pass), take the
    worst centroid rank any true neighbor's cluster has w.r.t. the
    query, and probe ``that + safety``. K-means cells have no analytic
    recall formula (boundary geometry is data-dependent) — the measured
    coverage rank is the honest substitute and is deterministic given
    the fixed-seed fit.
    """
    n = df.count()
    C = n_centroids or max(4, min(64, round(n ** 0.5)))
    centroids = kmeans_centroids(df, id_col, vec_col, C, seed=seed)
    cn = _normalize_rows(centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(cn @ qn))
    rank_of = {int(c): r for r, c in enumerate(order)}

    top = brute_force_topk(df, id_col, vec_col, query_vec, k=k)
    top_ids = [r[0] for r in top.collect()]
    assigned = ivf_assign(
        df.filter(F.col(id_col).isin(top_ids)).select(id_col, vec_col),
        vec_col,
        centroids,
    )
    worst = max(
        rank_of[int(r["cluster"])] for r in assigned.select("cluster").collect()
    )
    nprobe = min(C, worst + 1 + safety)
    return C, nprobe, centroids


def build_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    n_centroids: int = 16,
    centroids: np.ndarray | None = None,
    seed: int = 42,
) -> np.ndarray:
    """Build-once side of a persisted IVF index: assign every vector to
    its nearest centroid and WRITE the corpus as a cluster-partitioned
    parquet layout (``path/data/cluster=K/``) with the centroid matrix
    alongside (``path/centroids.json``).

    :func:`ivf_topk` recomputes the assignment per query — correct for
    one-shot, wasteful for the build-once/query-many deployment. With
    the persisted layout, a query (:func:`ivf_index_topk`) touches ONLY
    the probed clusters via Catalyst partition pruning — the scan's
    ``PartitionFilters`` prune at planning time, so the per-query cost
    is ~nprobe/C of the corpus with zero assignment work. This is
    FAISS's inverted-list structure expressed as parquet partitions;
    hyperplane-LSH tables persist the same way (one exploded row per
    table, partitioned by (table, bucket)). The build is the one full
    pass over the corpus, exactly like any ANN index build.

    The centroid JSON is written driver-side (k×dim floats — tiny);
    deterministic given the fixed kmeans seed, so rebuilding yields
    byte-identical assignments.
    """
    import json

    if centroids is None:
        centroids = kmeans_centroids(df, id_col, vec_col, n_centroids, seed=seed)
    assigned = ivf_assign(
        df.select(F.col(id_col), F.col(vec_col)), vec_col, centroids
    )
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/data"
    )
    with open(f"{path}/centroids.json", "w") as f:
        json.dump([[float(x) for x in row] for row in centroids], f)
    return centroids


def ivf_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = 4,
    exact_below: int = 0,
) -> DataFrame:
    """Query side of the persisted IVF index: rank centroids driver-side
    (k×dim dot products), read ONLY the probed cluster partitions, exact
    re-rank within. Identical results to :func:`ivf_topk` with the same
    centroids/nprobe (parity-tested); the difference is the plan — the
    parquet scan carries ``PartitionFilters: [cluster IN (...)]`` and
    never opens the other clusters' files."""
    if exact_below:
        # the lsh_topk exact-crossover rule; row count of the index
        # data is parquet-metadata cheap
        data_all = spark.read.parquet(f"{path}/data")
        if data_all.count() <= exact_below:
            return brute_force_topk(
                data_all, id_col, vec_col, query_vec, k
            )

    import json

    with open(f"{path}/centroids.json") as f:
        centroids = np.asarray(json.load(f), dtype=np.float64)
    cn = _normalize_rows(centroids)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probe = [int(p) for p in np.argsort(-(cn @ qn))[:nprobe]]
    data = spark.read.parquet(f"{path}/data").filter(
        F.col("cluster").isin(probe)
    )
    return brute_force_topk(data, id_col, vec_col, query_vec, k)


def build_lsh_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    *,
    dim: int,
    nbits: int = 6,
    n_tables: int = 16,
    seed: int = 42,
) -> None:
    """Persisted multi-table hyperplane LSH index: one exploded copy of
    the corpus per table, partitioned by ``(t, bucket)`` — the standard
    L× storage trade of OR-construction LSH (FAISS/Annoy make the same
    one). :func:`lsh_topk` recomputes every table's bucket per query
    row; with the persisted layout a query's candidate predicate is a
    disjunction over PARTITION COLUMNS only, so Catalyst prunes every
    non-probed (table, bucket) directory at planning time — zero
    signature work and ~L·(1+b)/2^b of the corpus read per query.

    Hyperplanes rebuild deterministically from ``(seed, t)`` (md5-derived
    signs — no RNG state), recorded in ``path/meta.json``; a rebuilt
    index probes identically.

    Not a catalog entry: the build writes O(L·2^nbits) partition
    directories, which on a local FS costs ~15 s per invocation — the
    persisted-index pattern's driver-green evidence is carried by the
    IVF twin (``similarity_ann_index``); this path is parity-tested
    against :func:`lsh_topk` in ``tests/test_text_similarity.py``.
    """
    import json

    tables = [
        RandomHyperplaneLSH(dim, nbits=nbits, seed=seed + t)
        for t in range(n_tables)
    ]
    bks = F.array(*[t.bucket_col(F.col(vec_col)) for t in tables])
    (
        df.select(id_col, vec_col)
        .withColumn("_bks", bks)
        .select(id_col, vec_col, F.posexplode("_bks").alias("t", "bucket"))
        .write.mode("overwrite")
        .partitionBy("t", "bucket")
        .parquet(f"{path}/data")
    )
    with open(f"{path}/meta.json", "w") as f:
        json.dump(
            {"dim": dim, "nbits": nbits, "n_tables": n_tables, "seed": seed},
            f,
        )


def lsh_index_topk(
    spark,
    path: str,
    query_vec: list[float],
    *,
    id_col: str,
    vec_col: str,
    k: int = 10,
    hamming_probe: int = 1,
) -> DataFrame:
    """Query side of the persisted LSH index: rebuild the hyperplanes
    from the recorded seed (driver-side, no data pass), turn the probe
    set into a partition-column disjunction, scan only the probed
    directories, dedup ids across tables, exact re-rank. Identical
    results to :func:`lsh_topk` with the same (nbits, n_tables, seed)
    whenever both candidate sets contain the true top-k."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    tables = [
        RandomHyperplaneLSH(meta["dim"], nbits=meta["nbits"], seed=meta["seed"] + t)
        for t in range(meta["n_tables"])
    ]
    cond = None
    for t, tab in enumerate(tables):
        c = (F.col("t") == t) & F.col("bucket").isin(
            tab.probe_buckets(query_vec, hamming=hamming_probe)
        )
        cond = c if cond is None else (cond | c)
    candidates = (
        spark.read.parquet(f"{path}/data")
        .filter(cond)
        .dropDuplicates([id_col])
    )
    return brute_force_topk(candidates, id_col, vec_col, query_vec, k)


def embedding_near_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    *,
    threshold: float = 0.4,
    nbits: int = 4,
    n_tables: int = 32,
    seed: int = 42,
    verify_broadcast: bool | None = None,
    broadcast_max_docs: int = 200_000,
) -> DataFrame:
    """Near-dup pairs (cos ≥ threshold) for UNLABELED corpora: multi-table
    hyperplane LSH blocking + exact-cosine verification.

    One table misses pairs near bucket boundaries (P[collide] = p^nbits,
    p = 1-θ/π); L independent tables drive the miss rate to (1-p^b)^L.
    The layout mirrors minhash_lsh_pairs: SKINNY rows (id, bucket array)
    through pair generation, each pair kept only at its FIRST agreeing
    table (arithmetic filter, no dropDuplicates shuffle), vectors joined
    back only for the surviving candidates.

    nbits scales with corpus size (2^nbits ≈ n / target bucket size); at
    the test fixture's n=500 the blocked cost exceeds n² — the crossover
    where LSH wins is around n ≈ 10⁵ with nbits ≈ 14, and the *shape*
    (per-bucket quadratic, never global quadratic) is what survives 100 TB.

    ``verify_broadcast``: None (default) auto-selects — the per-doc vector
    table is broadcast for verification only when the corpus has at most
    ``broadcast_max_docs`` rows (broadcast is O(corpus) and would OOM at
    real scale); bigger corpora shuffle-join the candidate pairs against
    the vector table instead. Same gate policy as
    ``minhash_lsh_pairs(broadcast_verify=...)``.
    """
    from ..functions.scalar import dot, l2_norm

    tables = [
        RandomHyperplaneLSH(dim, nbits=nbits, seed=seed + t)
        for t in range(n_tables)
    ]
    slim = df.select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    # bucket computation is the CPU-heavy narrow stage (L × nbits × dim
    # mul-adds per row) — spread it before computing, single-file inputs
    # would otherwise pin it to one task (many-file inputs skip the
    # exchange entirely)
    from .dedup import _first_collision_band, spread_to_cluster

    if verify_broadcast is None:
        # Corpus row count decides whether the per-doc vector table fits
        # the broadcast budget — mirrors minhash_lsh_pairs'
        # broadcast_max_docs gate (dedup.py). Cheap (metadata-only) when
        # ``df`` is a raw parquet scan, as at the catalog call sites; on
        # a transformed input this count is a real job — pass
        # verify_broadcast explicitly there if that matters.
        verify_broadcast = df.count() <= broadcast_max_docs

    pre = spread_to_cluster(slim).select(
        "_id",
        F.array(*[t.bucket_col(F.col("_v")) for t in tables]).alias("_bks"),
    )
    exploded = pre.select(
        "_id",
        "_bks",
        F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("_t"),
    ).withColumn("_bk", F.element_at(F.col("_bks"), F.col("_t") + 1))

    a, b = exploded.alias("a"), exploded.alias("b")
    # Keep each pair only at its FIRST agreeing table — the same linear
    # chained-CASE as the minhash/simhash band filter (codegen-sized;
    # see dedup._first_collision_band for the history: interpreted
    # exists() HOF → quadratic CASE → this form).
    at_first_table = F.col("a._t") == _first_collision_band(
        F.col("a._bks"), F.col("b._bks"), n_tables
    )
    candidates = (
        a.join(
            b,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._bk") == F.col("b._bk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(at_first_table)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )

    vecs = slim.withColumn("_nrm", l2_norm(F.col("_v")))
    va = vecs.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_nrm").alias("_na")
    )
    vb = vecs.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_nrm").alias("_nb")
    )
    if verify_broadcast:
        va, vb = F.broadcast(va), F.broadcast(vb)
    denom = F.col("_na") * F.col("_nb")
    sim = F.when(denom != 0, dot(F.col("_va"), F.col("_vb")) / denom)
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def incremental_semantic_filter(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    *,
    threshold: float = 0.4,
    nbits: int = 4,
    n_tables: int = 32,
    seed: int = 42,
    verify_broadcast: bool | None = None,
    broadcast_max_docs: int = 200_000,
) -> DataFrame:
    """Semantic (embedding) admission for a daily increment — the
    SemDeDup-shaped twin of :func:`~.dedup.incremental_near_dup_filter`:
    admit each batch vector only if NO existing corpus vector is within
    cosine ``threshold``. Returns ``(id, n_corpus_dups, keep)`` for
    every batch row.

    Candidates come ONLY from batch↔corpus hyperplane-LSH bucket
    collisions (the :func:`embedding_near_dup_pairs_lsh` multi-table
    OR-construction, same first-agreeing-table arithmetic filter) —
    batch×batch and corpus×corpus pairs are never generated, so
    per-increment candidate cost scales with the batch, and the corpus
    contributes one bucket pass (persist it with
    :func:`build_lsh_index`-style materialization when the increment
    cadence warrants, the minhash-index pattern). Verification is
    exact cosine on the candidate pairs, vector tables broadcast under
    the usual corpus-count gate.
    """
    from ..functions.scalar import dot, l2_norm

    from .dedup import _first_collision_band, spread_to_cluster

    tables = [
        RandomHyperplaneLSH(dim, nbits=nbits, seed=seed + t)
        for t in range(n_tables)
    ]
    if verify_broadcast is None:
        verify_broadcast = corpus.count() <= broadcast_max_docs

    def buckets(df: DataFrame) -> DataFrame:
        slim = df.select(
            F.col(id_col).alias("_id"),
            _as_double(F.col(vec_col)).alias("_v"),
        )
        pre = spread_to_cluster(slim).select(
            "_id",
            F.array(
                *[t.bucket_col(F.col("_v")) for t in tables]
            ).alias("_bks"),
        )
        return pre.select(
            "_id",
            "_bks",
            F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias("_t"),
        ).withColumn("_bk", F.element_at(F.col("_bks"), F.col("_t") + 1))

    b, c = buckets(batch).alias("a"), buckets(corpus).alias("b")
    at_first = F.col("a._t") == _first_collision_band(
        F.col("a._bks"), F.col("b._bks"), n_tables
    )
    candidates = (
        b.join(
            c,
            (F.col("a._t") == F.col("b._t"))
            & (F.col("a._bk") == F.col("b._bk")),
        )
        .filter(at_first)
        .select(F.col("a._id").alias("_ba"), F.col("b._id").alias("_cb"))
    )

    def vecs(df: DataFrame, idc: str, vc: str, nc: str) -> DataFrame:
        v = df.select(
            F.col(id_col).alias(idc), _as_double(F.col(vec_col)).alias(vc)
        )
        return v.withColumn(nc, l2_norm(F.col(vc)))

    va = vecs(batch, "_ba", "_va", "_na")
    vb = vecs(corpus, "_cb", "_vb", "_nb")
    if verify_broadcast:
        va, vb = F.broadcast(va), F.broadcast(vb)
    denom = F.col("_na") * F.col("_nb")
    sim = F.when(denom != 0, dot(F.col("_va"), F.col("_vb")) / denom)
    dups = (
        candidates.join(va, "_ba")
        .join(vb, "_cb")
        .filter(F.round(sim, 4) >= threshold)
        .groupBy("_ba")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    return (
        batch.select(F.col(id_col))
        .join(dups.withColumnRenamed("_ba", id_col), id_col, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce("_nd", F.lit(0)).cast("long").alias("n_corpus_dups"),
            (F.coalesce("_nd", F.lit(0)) == 0).alias("keep"),
        )
    )


def embedding_near_dup_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.4,
) -> DataFrame:
    """Exact near-dup pairs within blocks (id_a < id_b, cos ≥ threshold).

    Blocking keys (a label, an LSH bucket, an IVF cluster) turn the n²
    cross join into Σ(block²) — the standard scale pattern; pass an LSH
    bucket column for unlabeled corpora.
    """
    # Precompute each row's norm ONCE (per-pair norm recomputation is
    # O(pairs·d) wasted work; this is O(rows·d)). sim = dot/(na·nb) is the
    # same expression tree as cosine_similarity, so results are
    # float-identical to the naive form.
    from ..functions.scalar import dot, l2_norm

    pre = df.select(
        F.col(id_col).alias("_id"),
        F.col(block_col).alias("_blk"),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_nrm", l2_norm(F.col("_v")))
    a = pre.select(
        F.col("_id").alias("id_a"), "_blk",
        F.col("_v").alias("_va"), F.col("_nrm").alias("_na"),
    )
    b = pre.select(
        F.col("_id").alias("id_b"), "_blk",
        F.col("_v").alias("_vb"), F.col("_nrm").alias("_nb"),
    )
    denom = F.col("_na") * F.col("_nb")
    sim = F.when(denom != 0, dot(F.col("_va"), F.col("_vb")) / denom)
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 4).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def embedding_near_dup_pairs_blocked_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    *,
    threshold: float = 0.4,
    chunk_rows: int = 2048,
) -> DataFrame:
    """BLAS twin of :func:`embedding_near_dup_pairs_blocked` — identical
    output (equivalence-tested, including the 4-decimal rounding), ~7×
    faster (0.35 s vs 2.4 s at sf0.1): each block's pairwise cosines come
    from numpy matmul inside ``applyInPandas`` instead of per-pair
    interpreted higher-order-function folds.

    Memory: the similarity matrix is computed in ``chunk_rows``-row
    stripes — O(chunk·|block|) per task, never |block|² — so a
    million-row block streams instead of materializing a TB matrix. One
    shuffle on the block key; blocks with a single row emit nothing;
    zero-norm vectors pair with nothing (their cosine is undefined),
    matching the expression path's null-sim filter. Null block keys are
    dropped before grouping — the expression path's equi-join on the
    block key drops them too, and without the filter groupBy would
    collect every null-block row into ONE (potentially giant) group and
    pair rows the equi-join never would.
    """
    import numpy as np
    import pandas as pd

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        out_a, out_b, out_s = [], [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for i0 in range(0, n, chunk_rows):
                i1 = min(i0 + chunk_rows, n)
                S = (M[i0:i1] @ M.T) / np.outer(norms[i0:i1], norms)
                # strict upper triangle in GLOBAL row order: j > i
                rows, cols = np.nonzero(
                    np.round(S, 4) >= threshold
                )
                keep = cols > rows + i0
                rows, cols = rows[keep], cols[keep]
                a, b = ids[rows + i0], ids[cols]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(np.round(S[rows, cols], 4))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype="int64"),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype="int64"),
                "sim": np.concatenate(out_s) if out_s else np.array([], dtype="float64"),
            }
        )

    return (
        df.filter(F.col(block_col).isNotNull())
        .groupBy(block_col)
        .applyInPandas(
            lambda pdf: block_pairs(pdf), "id_a long, id_b long, sim double"
        )
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8 — the FAISS ScalarQuantizer recipe)
# ---------------------------------------------------------------------------

def sq8_stats(df: DataFrame, vec_col: str) -> tuple[list[float], list[float]]:
    """Per-dimension (min, delta) for 8-bit affine quantization:
    ``delta_i = (max_i - min_i) / 256`` (0 for constant dimensions).

    One posexplode + groupBy(dim) — the per-dim aggregation partially
    combines map-side, so the shuffle carries ``dims × partitions``
    rows, not the corpus. EAGER: collects ``dims`` rows to the driver
    (the k-means-centroid pattern).
    """
    rows = (
        df.select(F.posexplode(_as_double(F.col(vec_col))).alias("_d", "_x"))
        .groupBy("_d")
        .agg(F.min("_x").alias("mn"), F.max("_x").alias("mx"))
        .orderBy("_d")
        .collect()
    )
    mins = [r["mn"] for r in rows]
    deltas = [(r["mx"] - r["mn"]) / 256.0 for r in rows]
    return mins, deltas


def balanced_sum_sql(terms: list[str]) -> str:
    """Pairwise balanced-tree sum of SQL term strings. The
    parenthesization IS the cross-engine IEEE contract — float addition
    order changes the last bits, so every dual-engine score generator
    (sq8, centroid assignment, random projection, and their DuckDB
    twins) must reduce through THIS one helper; a second copy that
    drifts would silently break oracle hash-parity."""
    if not terms:
        raise ValueError("balanced_sum_sql: terms must be non-empty")
    while len(terms) > 1:
        terms = [
            f"({terms[j]} + {terms[j + 1]})" if j + 1 < len(terms) else terms[j]
            for j in range(0, len(terms), 2)
        ]
    return terms[0]


def _dbl(x: float) -> str:
    """Exact double literal for generated Spark SQL: repr() round-trips
    the value and the string-to-double CAST parses it exactly (bare
    decimal literals would parse as DECIMAL under Spark SQL)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def _sq8_code_sql(vec_sql: str, i: int, m: float, d: float) -> str:
    """Scalar code expression (SQL text) for one dimension, 1-based
    ``i`` (see sq8_codes_col)."""
    if d == 0.0:
        return "0"
    return (
        f"least(255, greatest(0, CAST(floor((element_at({vec_sql}, {i})"
        f" - {_dbl(m)}) / {_dbl(d)}) AS INT)))"
    )


def sq8_codes_col(
    vec_col: str, mins: list[float], deltas: list[float]
) -> Column:
    """uint8 codes (as ints): ``clamp(floor((x_i - min_i)/delta_i), 0,
    255)``; constant dims code to 0. ``floor`` rather than ``round``:
    floor is identical across engines, while round-half ties differ
    between Java (HALF_UP) and C (half-even) — the oracle recomputes
    these codes bit-for-bit.

    UNROLLED per dimension with the stats as scalar literals and built
    as ONE generated-SQL ``F.expr``. Two measured traps shape this: a
    ``transform`` HOF over literal arrays re-evaluates the CreateArray
    per ``element_at`` access — O(d²) interpreted work per row, 9-11 s
    for 5 000×64 at sf0.1 vs 0.4 s unrolled (the interpreted-HOF trap
    ARCHITECTURE.md documents); and building the unrolled tree from
    ~800 individual Column calls costs 3-4 s of py4j round-trips per
    plan — a single parsed SQL string is milliseconds."""
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    codes = ", ".join(
        _sq8_code_sql(vec_sql, i + 1, m, d)
        for i, (m, d) in enumerate(zip(mins, deltas))
    )
    return F.expr(f"array({codes})")


def sq8_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    mins: list[float],
    deltas: list[float],
) -> DataFrame:
    """Quantized corpus ``(id, codes array<int>)`` — 4× smaller than the
    float32 column (8× vs double), the memory/IO lever that lets an ANN
    working set stay resident at 100 TB. One narrow pass."""
    return df.select(
        F.col(id_col),
        sq8_codes_col(vec_col, mins, deltas).alias("codes"),
    )


def sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    *,
    stats: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Asymmetric quantized top-k: documents scored through their SQ8
    RECONSTRUCTION ``x̂_i = min_i + (code_i + 0.5)·delta_i`` against the
    FULL-precision query (the standard asymmetric-distance computation —
    quantize the big side, keep the query exact). Output
    ``(id, qscore, rank)`` with the brute-force tie-break (score desc,
    id asc) and a global TakeOrderedAndProject — no full sort.

    The expression path keeps oracle parity (every step re-derivable in
    ANSI SQL); a production deployment scores the uint8 codes with a
    BLAS/numpy kernel exactly like ``embedding_near_dup_pairs_blocked_np``
    — the quantization win is the 4× working-set shrink either way.
    Recall vs exact cosine is measured in tests (≥0.9 at both SFs).
    """
    if stats is None:
        stats = sq8_stats(df, vec_col)
    mins, deltas = stats
    # Unrolled scalar terms as ONE generated-SQL expression (see
    # sq8_codes_col for the two measured traps this avoids), summed as a
    # BALANCED pairwise tree: float addition order changes the last
    # bits, so the oracle generates the *same* balanced parenthesization
    # (queries._sq8_score_sql) — identical order in both engines, and
    # depth log₂(d) keeps the expression tree shallow.
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    terms: list[str] = []
    for i, (m, d, qi) in enumerate(zip(mins, deltas, query_vec)):
        code = f"CAST({_sq8_code_sql(vec_sql, i + 1, m, d)} AS DOUBLE)"
        terms.append(
            f"(({_dbl(float(m))} + ({code} + {_dbl(0.5)}) * {_dbl(float(d))})"
            f" * {_dbl(float(qi))})"
        )
    return (
        df.select(
            F.col(id_col),
            F.round(F.expr(balanced_sum_sql(terms)), 4).alias("qscore"),
        )
        .orderBy(F.desc("qscore"), F.asc(id_col))
        .limit(k)
    )


def two_stage_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
    coarse_dims: int = 16,
    coarse_k: int = 50,
) -> DataFrame:
    """Matryoshka-style two-stage retrieval: a COARSE pass scores only
    the first ``coarse_dims`` dimensions (MRL embeddings front-load
    information, so the prefix is a usable low-cost proxy), takes the
    top ``coarse_k`` candidates, then an exact full-dimension cosine
    re-ranks just those for the final top ``k``.

    Per-candidate cost drops from d to ``coarse_dims`` for the corpus
    scan + d for only ``coarse_k`` rows; at scale the prefix lives as
    its own (4·coarse_dims-byte) column so the coarse scan reads a
    fraction of the vector bytes — here both stages slice one column,
    which keeps the operator self-contained. Both stages break score
    ties on id after 4-decimal rounding, so the candidate set — and
    therefore the result — is deterministic and re-derivable by the
    oracle. Plan: TakeOrderedAndProject → broadcast join of the tiny
    candidate list back onto the corpus → TakeOrderedAndProject; the
    only join is the candidate re-attach, broadcast by construction.

    Recall is corpus-dependent (how front-loaded the embeddings are);
    tests measure it against :func:`brute_force_topk` and the catalog
    query is oracle-checked END-TO-END (the oracle mirrors both stages,
    so this is an exactness check of the operator, not a recall bound).
    """
    if not 0 < coarse_dims <= len(query_vec):
        # silently zip-padding with nulls would null every coarse score
        raise ValueError(
            f"coarse_dims must be in [1, {len(query_vec)}], got {coarse_dims}"
        )
    vec = _as_double(F.col(vec_col))
    q_coarse = _query_lit(query_vec[:coarse_dims])
    coarse = cosine_similarity(F.slice(vec, 1, coarse_dims), q_coarse)
    cand = (
        df.select(F.col(id_col), F.round(coarse, 4).alias("_cs"))
        .orderBy(F.desc("_cs"), F.asc(id_col))
        .limit(coarse_k)
        .select(id_col)
    )
    sim = cosine_similarity(vec, _query_lit(query_vec))
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# cluster-balanced sampling (SSL-prototypes / topic-balance pruning shape)
# ---------------------------------------------------------------------------

def centroid_score_sqls(vec_elem, centroids: list[list[float]]) -> list[str]:
    """Per-centroid assignment scores as GENERATED SQL text:
    ``s_i = -2·x·c_i + ||c_i||²`` (argmin-equivalent to squared distance
    — the ||x||² term is constant per row). ``vec_elem(j)`` formats the
    1-based j-th vector element for the target engine, so the SAME
    generator emits the Spark expression and the DuckDB oracle twin —
    identical balanced-tree parenthesization, identical literals,
    identical IEEE result in both engines (the sq8_topk rule)."""
    out: list[str] = []
    for c in centroids:
        terms = [
            f"({vec_elem(j + 1)} * {_dbl(-2.0 * float(cj))})"
            for j, cj in enumerate(c)
        ]
        c2 = 0.0
        for cj in c:
            c2 += float(cj) * float(cj)
        out.append(f"({balanced_sum_sql(terms)} + {_dbl(c2)})")
    return out


def assign_clusters_literal(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    *,
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment with the centroids as PLAN LITERALS:
    one narrow projection, zero joins, zero shuffles — for the k·d few
    hundred doubles a balance/pruning pass actually uses, embedding the
    centroids beats broadcasting them (nothing to build, nothing to
    transfer, whole-stage codegen sees constants). Production obtains
    the centroid list from :func:`kmeans_centroids` (or any trained
    model) and passes it here. Ties break to the smallest cluster index
    deterministically."""
    vec_sql = f"cast(`{vec_col}` as array<double>)"
    sqls = centroid_score_sqls(
        lambda j: f"element_at({vec_sql}, {j})", centroids
    )
    k = len(sqls)
    scored = df.select(
        "*", *[F.expr(s).alias(f"_s{i}") for i, s in enumerate(sqls)]
    )
    m = (
        F.least(*[F.col(f"_s{i}") for i in range(k)])
        if k > 1
        else F.col("_s0")
    )
    cluster = F.lit(k - 1)
    for i in range(k - 2, -1, -1):
        cluster = F.when(F.col(f"_s{i}") == m, F.lit(i)).otherwise(cluster)
    return scored.withColumn(out_col, cluster).drop(
        *[f"_s{i}" for i in range(k)]
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cost_col: str,
    centroids: list[list[float]],
    *,
    budget: int,
) -> DataFrame:
    """Cluster-balanced downsample — the embedding-space twin of the
    per-source token budget (``sampling.sample_to_token_budget``): assign
    every row to its nearest centroid, then greedily keep rows per
    CLUSTER in (portable_hash(id), id) order while the cost accumulated
    before the row is under ``budget``. This is the SSL-prototypes /
    cluster-balance pruning shape: over-represented topics (giant
    clusters) are cut to the budget while rare topics survive whole —
    balancing what the corpus SAYS rather than where it came from.

    Output: ``(id, cluster, <cost_col>, cost_before)`` for kept rows.

    Scale shape: assignment is a narrow literal-centroid projection
    (:func:`assign_clusters_literal` — no join, no shuffle), the
    balance pass is ONE exchange on the cluster key + a bounded
    cumulative window. At extreme cluster skew the big cluster's window
    is a straggler; the remedy is the analytic-threshold two-phase
    shape of ``sampling.cap_per_group_two_phase`` with the threshold
    derived from ``budget / sum(cluster cost)``.
    """
    from .sampling import hash_of_id_col

    assigned = assign_clusters_literal(
        df.select(F.col(id_col), F.col(vec_col), F.col(cost_col)),
        vec_col,
        centroids,
        # the vector is consumed by the assignment projection and dropped
        # HERE — the cluster-key exchange below moves only
        # (id, cost, cluster) ≈ 20 B rows, never the embedding
    ).select(F.col(id_col), F.col(cost_col), F.col("cluster"))
    w = (
        W.partitionBy("cluster")
        .orderBy(hash_of_id_col(id_col), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        assigned.withColumn(
            "cost_before",
            F.coalesce(
                F.sum(F.col(cost_col)).over(w), F.lit(0)
            ).cast("long"),
        )
        .filter(F.col("cost_before") < budget)
        .select(id_col, "cluster", cost_col, "cost_before")
    )


def random_projection_sqls(
    vec_elem, in_dims: int, out_dims: int, *, seed: int = 41
) -> list[str]:
    """Johnson–Lindenstrauss ±1 sign projection (Achlioptas 2003) as
    GENERATED SQL text, one expression per output dimension:
    ``p_j = (Σ_i s_ij · x_i) / √k`` with ``s_ij ∈ {+1, -1}`` drawn from
    a deterministic 64-bit LCG on ``(i, j)`` — the matrix is part of
    the query, never materialized, and re-runs/other engines rebuild it
    bit-for-bit. Same dual-engine contract as
    :func:`centroid_score_sqls`: ``vec_elem(j)`` formats the 1-based
    element for the target engine; identical balanced-tree
    parenthesization + exact double literals ⇒ identical IEEE doubles
    in Spark and DuckDB, so projections are hash-checkable."""
    out: list[str] = []
    scale = 1.0 / (out_dims ** 0.5)
    for j in range(out_dims):
        terms = []
        for i in range(in_dims):
            state = (seed + i * out_dims + j) & 0xFFFFFFFFFFFFFFFF
            state = (
                state * 6364136223846793005 + 1442695040888963407
            ) & 0xFFFFFFFFFFFFFFFF
            sign = "1.0" if (state >> 33) & 1 == 0 else "-1.0"
            terms.append(f"({vec_elem(i + 1)} * {sign})")
        out.append(f"({balanced_sum_sql(terms)} * {_dbl(scale)})")
    return out


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dims: int,
    out_dims: int,
    *,
    seed: int = 41,
) -> DataFrame:
    """``(id, p0..p{k-1})`` — JL dimensionality reduction of an embedding
    column to ``out_dims`` doubles via :func:`random_projection_sqls`.
    One narrow zero-shuffle pass, whole-stage-codegen arithmetic only
    (the seeded-literal pattern of ``sq8_codes_col``/
    ``assign_clusters_literal``); distance distortion follows the JL
    bound (ε ≈ √(8·ln n / k)), which is the documented trade for a 4×
    smaller working set in downstream coarse search. ``in_dims`` must
    equal the stored vector length — ``element_at`` past the end is an
    ANSI runtime error, deliberately loud (a silently null-padded
    projection would corrupt every downstream distance)."""
    exprs = random_projection_sqls(
        lambda j: f"CAST(element_at({vec_col}, {j}) AS DOUBLE)",
        in_dims,
        out_dims,
        seed=seed,
    )
    return df.select(
        F.col(id_col),
        *[F.expr(e).alias(f"p{j}") for j, e in enumerate(exprs)],
    )


# ---------------------------------------------------------------------------
# product quantization (IVF-PQ's compression half; Jégou et al. TPAMI'11)
# ---------------------------------------------------------------------------

def pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m_sub: int = 8,
    n_codes: int = 16,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks: split the (L2-normalized) vector into
    ``m_sub`` contiguous subvectors and fit an independent
    ``n_codes``-center k-means per slice → ``(m_sub, n_codes, d/m_sub)``
    array. Reuses :func:`kmeans_centroids`' deterministic sampled fit
    per slice — the driver holds only m·k·(d/m) = k·d floats (the same
    footprint as ONE IVF codebook), and a rebuilt codebook is
    byte-identical, so encoded corpora are reproducible.

    Normalizing before slicing makes the per-slice dot products sum to
    the full cosine — the property :func:`pq_topk`'s ADC lookup rides.
    """
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    vec = _as_double(F.col(vec_col))
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x)
    )
    d = len(df.select(vec.alias("_v")).first()["_v"])
    if d % m_sub != 0:
        raise ValueError(
            f"pq_codebooks: dims {d} not divisible by m_sub {m_sub}"
        )
    sd = d // m_sub
    unit = F.transform(vec, lambda x: x / norm)
    # ONE deterministic sampled fit-set shared by all m_sub fits (the
    # kmeans_centroids contract: low-id sample, single partition for
    # reproducible k-means|| init) — sampling/sorting the corpus once
    # instead of per slice cuts the build from m scans to one
    # (measured 38 s → ~8 s at sf0.1 for the 16-slice config)
    fit_set = (
        df.select(F.col(id_col).alias("_id"), unit.alias("_v"))
        .orderBy(F.asc("_id"))
        .limit(100_000)
        .coalesce(1)
        .cache()
    )
    fit_set.count()  # materialize before the fit loop

    def _fit_slice(j: int) -> np.ndarray:
        sliced = fit_set.select(
            array_to_vector(
                F.slice(F.col("_v"), j * sd + 1, sd)
            ).alias("features")
        )
        model = MLKMeans(k=n_codes, seed=seed + j, maxIter=20).fit(sliced)
        b = np.array(
            sorted(
                (
                    np.asarray(c, dtype=np.float64).tolist()
                    for c in model.clusterCenters()
                ),
                key=tuple,
            ),
            dtype=np.float64,
        )
        if b.shape[0] < n_codes:
            # degenerate slice (fewer distinct points than codes): pad
            # with copies of the first center — duplicate centers tie
            # in the encode argmin and the lowest index wins, so the
            # assignment stays deterministic
            pad = np.repeat(b[:1], n_codes - b.shape[0], axis=0)
            b = np.vstack([b, pad])
        return b

    # the m_sub fits are independent tiny jobs dominated by per-job
    # scheduler overhead, not compute — run them from driver threads so
    # Spark interleaves them (measured 37 s → 17 s for 16 slices at
    # sf0.1; determinism unaffected, each fit is seeded and the result
    # list is indexed, not append-ordered)
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=min(8, m_sub)) as pool:
            books = list(pool.map(_fit_slice, range(m_sub)))
    finally:
        fit_set.unpersist()
    return np.stack(books)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
) -> DataFrame:
    """Encode every vector as ``m_sub`` sub-centroid indices →
    ``(id_col, pq_codes array<int>)`` — d·4 bytes shrink to m_sub
    small ints (the 8-32× compression PQ exists for; at 100 TB the
    encoded corpus is the only thing the query path scans, exactly
    like the SQ8 layout). One vectorized Arrow pass: per batch, each
    slice's assignment is ONE matmul against its codebook
    (``argmax(2·X_j·C_jᵀ − ||C_j||²)`` — L2-argmin with the ||x||²
    term dropped), the :func:`ivf_assign` pattern per slice.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m_sub, n_codes, sd = codebooks.shape
    cb = codebooks.astype(np.float64)
    c2 = (cb * cb).sum(axis=2)  # (m, k) centroid norms

    @pandas_udf("array<int>")
    def _codes(vs: pd.Series) -> pd.Series:
        x = np.asarray(vs.tolist(), dtype=np.float64)
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        x = x / n
        out = np.empty((x.shape[0], m_sub), dtype=np.int32)
        for j in range(m_sub):
            xj = x[:, j * sd : (j + 1) * sd]
            scores = 2.0 * xj @ cb[j].T - c2[j]
            out[:, j] = np.argmax(scores, axis=1)
        return pd.Series(list(out))

    return df.select(
        F.col(id_col),
        _codes(_as_double(F.col(vec_col))).alias("pq_codes"),
    )


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 10,
    m_sub: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    seed: int = 42,
    codebooks: np.ndarray | None = None,
) -> DataFrame:
    """PQ-ADC two-stage retrieval (the IVF-PQ compression half): an
    asymmetric-distance shortlist over the ENCODED corpus, then an
    exact cosine re-rank of just those rows — the
    :func:`two_stage_topk` shape with the coarse pass reading m_sub
    bytes per vector instead of coarse_dims floats.

    The ADC trick stays entirely JVM-side at query time: the query's
    per-slice dot products against every sub-centroid form m_sub
    LITERAL lookup arrays (m·k floats, computed driver-side once per
    query), and the approximate cosine is
    ``Σ_j element_at(lit_table_j, pq_codes[j]+1)`` — a chained
    element_at sum inside whole-stage codegen, no UDF, no join, no
    shuffle; TakeOrderedAndProject picks the shortlist. Exactness
    contract mirrors IVF/LSH: the FINAL top-k is exact cosine over the
    shortlist (oracle = exact top-k), and the shortlist is sized so
    ADC recall is 1.0 at every fixture (asserted in tests at three
    SFs); at real scale shortlist/n_codes are the recall/cost knobs.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0.0:
        # before any codebook training — the guard is free, the fit isn't
        raise ValueError("pq_topk: zero query vector")
    q = q / qn
    if codebooks is None:
        codebooks = pq_codebooks(
            df, id_col, vec_col, m_sub=m_sub, n_codes=n_codes, seed=seed
        )
    m, kc, sd = codebooks.shape
    tables = [
        codebooks[j] @ q[j * sd : (j + 1) * sd]  # (n_codes,) per slice
        for j in range(m)
    ]
    enc = pq_encode(df, id_col, vec_col, codebooks)
    approx = None
    for j, t in enumerate(tables):
        term = F.element_at(
            F.array(*[F.lit(float(x)) for x in t]),
            F.col("pq_codes")[j] + F.lit(1),
        )
        approx = term if approx is None else approx + term
    cand = (
        enc.select(F.col(id_col), approx.alias("_adc"))
        .orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    from ..functions.scalar import cosine_similarity

    sim = cosine_similarity(_as_double(F.col(vec_col)), _query_lit(query_vec))
    return (
        df.join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def _cos_fold(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the SAME left-to-right fold the Spark
    side's :func:`~..functions.scalar.dot` builds (F.aggregate from
    0.0), so the two produce the identical IEEE double bit-for-bit —
    the replay discipline every quantized comparison here relies on."""
    import math

    dab = 0.0
    daa = 0.0
    dbb = 0.0
    for x, y in zip(a, b):
        dab += x * y
    for x in a:
        daa += x * x
    for y in b:
        dbb += y * y
    return dab / (math.sqrt(daa) * math.sqrt(dbb))


def _mmr_pool_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    scale: int,
    pool_size: int,
) -> DataFrame:
    """The distributed stage of :func:`mmr_topk`: quantized relevance
    scored in whole-stage codegen, cut to ``pool_size`` rows by
    (rel desc, id asc) — Catalyst compiles the orderBy+limit to
    TakeOrderedAndProject (per-partition top-k, no global sort); the
    plan audit pins that."""
    from ..functions.scalar import cosine_similarity

    cos = cosine_similarity(
        _as_double(F.col(vec_col)), _query_lit(query_vec)
    )
    rel_q = F.floor(cos * F.lit(float(scale)) + F.lit(0.5)).cast("long")
    return (
        df.select(
            F.col(id_col).alias("_id"),
            _as_double(F.col(vec_col)).alias("_v"),
            rel_q.alias("_rel"),
        )
        # null and zero-norm vectors are not retrievable items:
        # cosine_similarity null-propagates on a zero norm, and a null
        # _rel reaching the driver greedy would poison λ·rel arithmetic
        # (the pq_topk zero-query guard precedent, applied corpus-side
        # as a filter because one bad row must not fail the scan)
        .filter(F.col("_rel").isNotNull())
        .orderBy(F.desc("_rel"), F.asc("_id"))
        .limit(pool_size)
    )


def mmr_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    *,
    k: int = 5,
    pool_size: int = 40,
    lambda_pct: int = 65,
    scale: int = 10_000,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein 1998) → ``(mmr_rank, id, rel_q, mmr_score)``: greedily
    pick the item maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected}
    sim(c, s)`` — relevance to the query traded against redundancy with
    what's already picked. THE diversity pass of a retrieval/data-
    curation pipeline: plain top-k returns k near-copies of the best
    hit; MMR returns k hits that each add information (hard-negative
    mining, diverse few-shot selection, dedup-aware retrieval).

    Exactness: similarities are quantized to integers
    (``floor(cos·scale + 0.5)``) and λ to percent, so every greedy
    decision is int64 arithmetic — the whole selection replays
    bit-for-bit in an ANSI oracle (ties broken by id ascending; step 1
    has no selected set, its redundancy term is 0). Two candidates
    whose float cosines differ below 1/scale tie and fall to the id
    tie-break deterministically on both engines.

    Scale shape (the standard MMR deployment): the DISTRIBUTED stage is
    one corpus-wide scan scoring ``rel_q`` inside whole-stage codegen,
    cut to ``pool_size`` by (rel_q desc, id asc) — Catalyst's
    TakeOrderedAndProject, per-partition top-k before the exchange, no
    global sort. The greedy itself is inherently sequential (the CELF
    family), but over the BOUNDED pool: pool_size·k driver-side
    cosines (~2·10⁴ mults at the defaults — microseconds), the
    PQ-codebook/IVF-centroid driver-budget precedent. ``pool_size`` is
    the recall/diversity-horizon knob: at 100 TB the scan dominates
    end-to-end cost and the pool stays constant-size.
    """
    import math

    from ..functions.scalar import cosine_similarity

    if k < 1:
        raise ValueError(f"mmr_topk: k must be >= 1, got {k}")
    if pool_size < k:
        raise ValueError(
            f"mmr_topk: pool_size {pool_size} must be >= k {k}"
        )
    if not 0 <= lambda_pct <= 100:
        raise ValueError(
            f"mmr_topk: lambda_pct must be in [0, 100], got {lambda_pct}"
        )
    pool = _mmr_pool_df(
        df, id_col, vec_col, query_vec, scale=scale, pool_size=pool_size
    ).collect()
    mu = 100 - lambda_pct
    cand = [(r["_id"], list(r["_v"]), r["_rel"]) for r in pool]
    picked: list[tuple] = []
    sel_vecs: list[list[float]] = []
    for rank in range(1, min(k, len(cand)) + 1):
        best = None
        for cid, cv, crel in cand:
            ms = (
                max(
                    math.floor(_cos_fold(cv, sv) * scale + 0.5)
                    for sv in sel_vecs
                )
                if sel_vecs
                else 0
            )
            score = lambda_pct * crel - mu * ms
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, cid, cv, crel, score)
        _, bid, bv, brel, bscore = best
        picked.append((rank, bid, brel, bscore))
        sel_vecs.append(bv)
        cand = [c for c in cand if c[0] != bid]
    spark = df.sparkSession
    # the id field keeps the INPUT column's type — a hardcoded 'long'
    # would crash createDataFrame for string/int ids
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("mmr_rank", IntegerType(), False),
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("rel_q", LongType(), False),
            StructField("mmr_score", LongType(), False),
        ]
    )
    return spark.createDataFrame(picked, schema)


def lloyd_assignments(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 4,
    iters: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Exact-integer Lloyd k-means → ``(id, cluster)`` (GDS
    ``gds.kmeans`` parity — the centroid-based community detector for
    node-property vectors; GDS's uniform random init is replaced by
    the k LOWEST ids so the whole run replays bit-for-bit, its
    documented determinism knob). Components quantize to integer
    micro-units once; every later step is int64 arithmetic:

    - assignment — argmin over k of Σ_d (x_d − c_d)², ties to the
      LOWER cluster id (a ``least(struct(dist, c))`` lexicographic
      fold, engine-independent);
    - update — per-dimension truncating mean ``sum div count``
      (toward zero on BOTH engines via a sign split in the oracle);
      an emptied cluster keeps its previous centroid (the GDS
      behavior) rather than vanishing.

    Fixed ``iters`` is the contract (the pagerank/LPA discipline):
    k-means converges but a data-dependent stop isn't oracle-
    unrollable. Headroom: |x|·scale ≤ 10⁹ per component allows dims ≤
    10⁴ before the squared sum nears int64 — asserted per call.

    Scale shape: per iteration, assignment is ONE narrow codegen map
    (centroids ride as k·d literal arrays — no join, no shuffle; the
    PQ-ADC lookup-table pattern) and the update is ONE
    partially-aggregated groupBy of d rows per cluster after a
    posexplode; the k·d centroid collect is the bounded driver budget
    (IVF/PQ precedent). The quantized vectors checkpoint once and
    every iteration reads the materialization, not the raw scan.
    """
    if k < 1:
        raise ValueError(f"lloyd_assignments: k must be >= 1, got {k}")
    if iters < 1:
        raise ValueError(
            f"lloyd_assignments: iters must be >= 1, got {iters}"
        )
    q = F.transform(
        _as_double(F.col(vec_col)),
        lambda x: F.floor(x * F.lit(float(scale)) + F.lit(0.5)).cast(
            "long"
        ),
    )
    qdf = (
        # null vectors are not clusterable points: a null _q would
        # null-poison every distance and corrupt the argmin silently
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("_id"), q.alias("_q"))
        .localCheckpoint(eager=False)
    )
    seeds = qdf.orderBy(F.asc("_id")).limit(k).collect()
    if len(seeds) < k:
        raise ValueError(
            f"lloyd_assignments: k={k} exceeds the {len(seeds)}-row corpus"
        )
    dims = len(seeds[0]["_q"])
    if scale * scale * dims >= (1 << 62):
        raise ValueError(
            f"lloyd_assignments: scale²·dims = {scale * scale * dims} "
            "risks int64 overflow in the squared distance"
        )
    centroids = [list(r["_q"]) for r in seeds]  # cluster c = c-th lowest id

    def _assigned():
        structs = []
        for c, cent in enumerate(centroids):
            lit = F.array(*[F.lit(int(w)) for w in cent])
            dist = F.aggregate(
                F.zip_with(
                    F.col("_q"), lit, lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            structs.append(
                F.struct(dist.alias("d"), F.lit(c).alias("c"))
            )
        pick = structs[0] if len(structs) == 1 else F.least(*structs)
        return qdf.select("_id", "_q", pick.getField("c").alias("_c"))

    for _ in range(iters):
        sums = (
            _assigned()
            .select("_c", F.posexplode("_q").alias("_d", "_v"))
            .groupBy("_c", "_d")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select(
                "_c", "_d", F.expr("_s div _n").alias("_w")
            )
            .collect()
        )
        got: dict[int, list[int]] = {}
        for r in sums:
            got.setdefault(r["_c"], [0] * dims)[r["_d"]] = r["_w"]
        # emptied clusters keep their previous centroid
        centroids = [got.get(c, centroids[c]) for c in range(k)]
    return _assigned().select(
        F.col("_id").alias(id_col), F.col("_c").alias("cluster")
    )
