"""Deterministic sampling operators for corpus curation.

Production pipelines downsample over-represented groups (domains,
sources, languages) and take reproducible corpus subsamples. Random
``sample()``/``sampleBy()`` are seed-and-partitioning dependent — results
change when the cluster layout changes, and no external engine can
re-derive them. Everything here orders by a CONTENT hash instead: the
same rows survive on any cluster, any partitioning, any engine — and a
DuckDB oracle can recompute the exact survivor set (the md5-derived
portable hash has a verbatim ANSI-SQL twin, see the simhash oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from ._materialize import materialize
from .dedup import portable_hash64_col


def hash_of_id_col(id_col: str) -> Column:
    """Portable 64-bit hash of a (numeric or string) id column."""
    return portable_hash64_col(F.col(id_col).cast("string"))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the lowest ``cap`` by
    (portable_hash(id), id): a uniform, reproducible choice, not "first
    cap rows some scan happened to produce".

    One shuffle on the group key + a bounded rank window. At extreme
    group skew (one domain = half the corpus) the window partition for
    that group is a straggler; the scale remedy is a two-phase threshold
    pass — keep rows with hash below ≈ (cap / |group|)-quantile (narrow
    filter, survivors ≈ 2·cap), then rank only the survivors. The
    single-window form is kept here because it is exact by construction
    and the oracle checks it row-for-row.
    """
    w = W.partitionBy(group_col).orderBy(hash_of_id_col(id_col), F.col(id_col))
    return (
        df.select(
            F.col(id_col),
            F.col(group_col),
            F.row_number().over(w).cast("long").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= cap)
    )


def cap_per_group_two_phase(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    *,
    safety: float = 4.0,
) -> DataFrame:
    """Skew-resistant twin of :func:`cap_per_group` — identical output
    (asserted by an equivalence test), different physical shape.

    The single-window form funnels each group through one task; a group
    holding half the corpus becomes a straggler no AQE rule splits
    (skew-join splitting does not apply to windows). Here the heavy
    window never sees the big groups:

    1. per-group counts — a partially-aggregated groupBy, skew-immune;
    2. analytic threshold: the hash is uniform over int64, so the
       expected ``safety·cap``-th smallest of ``|g|`` draws sits at
       ``LONG_MIN + safety·cap/|g| · 2⁶⁴`` — pure arithmetic on the
       count, no quantile sketch;
    3. narrow filter ``hash ≤ threshold`` keeps ≈ safety·cap rows per
       group (undershoot probability is the binomial lower tail at
       1/safety of the mean — negligible at safety 4), and the rank
       window runs over survivors only, never the raw group;
    4. exactness guard: any group whose survivor count came in under
       ``cap`` while the group itself is larger (binomial-tail
       undershoot) is re-ranked from the full data — only those groups,
       via a broadcast semi join on the tiny group list.
    """
    h = hash_of_id_col(id_col)
    hashed = df.select(
        F.col(id_col), F.col(group_col), h.alias("_hv")
    )
    counts = hashed.groupBy(group_col).agg(F.count("*").alias("_n"))
    frac = F.least(F.lit(1.0), F.lit(float(safety * cap)) / F.col("_n"))
    stats = counts.select(
        group_col,
        "_n",
        # double→long under ANSI throws on overflow; a frac near 1 means
        # "keep everything", so clamp to LONG_MAX before the cast bites
        F.when(frac >= 0.99, F.lit((1 << 63) - 1))
        .otherwise(
            (F.lit(float(-(2**63))) + frac * F.lit(float(2**64))).cast("long")
        )
        .alias("_thr"),
    )
    survivors = hashed.join(F.broadcast(stats), group_col).filter(
        (F.col("_n") <= cap) | (F.col("_hv") <= F.col("_thr"))
    )
    w = W.partitionBy(group_col).orderBy(F.col("_hv"), F.col(id_col))
    ranked = survivors.select(
        F.col(id_col),
        F.col(group_col),
        F.col("_n"),
        F.row_number().over(w).cast("long").alias("sample_rank"),
    )
    ok = ranked.filter(F.col("sample_rank") <= cap)
    # Groups where the filter undershot the cap re-rank exactly. Anchored
    # on the COUNTS table, not the survivor stream: a group whose filter
    # kept zero rows appears nowhere in `ranked` and would otherwise
    # silently vanish from the output (binomial tail ~e^(-safety·cap)).
    kept = ranked.groupBy(group_col).agg(F.max("sample_rank").alias("_kept"))
    short = (
        counts.join(kept, group_col, "left_outer")
        .filter(
            F.coalesce(F.col("_kept"), F.lit(0))
            < F.least(F.lit(cap), F.col("_n"))
        )
        .select(group_col)
    )
    redo = hashed.join(F.broadcast(short), group_col, "left_semi").select(
        F.col(id_col),
        F.col(group_col),
        F.row_number().over(w).cast("long").alias("sample_rank"),
    ).filter(F.col("sample_rank") <= cap)
    return (
        ok.join(F.broadcast(short), group_col, "left_anti")
        .select(id_col, group_col, "sample_rank")
        .unionByName(redo)
    )


def sample_to_token_budget(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str,
    *,
    budget_tokens: int,
) -> DataFrame:
    """Greedy per-group downsample to a TOKEN budget — the unit that
    actually matters when balancing a pre-training mixture (a domain of
    10k long documents can outweigh one of 100k short ones; row caps
    like :func:`cap_per_group` can't see that).

    Within each group, documents are taken in (portable_hash(id), id)
    order — a uniform, reproducible shuffle — and kept while the tokens
    accumulated BEFORE the document are under ``budget_tokens``; the
    final kept document may overshoot (standard greedy prefix: the
    budget bounds where the cut happens, not the exact total). Token
    counts are whitespace words (``quality.words_col``).

    Output: ``(id, group, n_tokens, tokens_before)`` for kept rows —
    ``tokens_before`` doubles as the document's start offset in the
    group's packed token stream.

    One shuffle on the group key + a bounded cumulative window. At
    extreme group skew the big group's window is a straggler; the
    remedy is the analytic-threshold two-phase shape of
    :func:`cap_per_group_two_phase` with the threshold derived from
    ``budget_tokens / sum(group tokens)`` instead of ``cap / |group|``
    (survivors ≈ safety · budget worth of tokens, then one bounded
    window).
    """
    from .quality import words_col

    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(words_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(hash_of_id_col(id_col), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        base.withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
        )
        .filter(F.col("tokens_before") < budget_tokens)
        .select(id_col, group_col, "n_tokens", "tokens_before")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    target_shares: dict[str, float],
    budget_tokens: int,
) -> DataFrame:
    """Static mixture-weight computation (the DoReMi/Pile-style recipe's
    bookkeeping pass): given target corpus shares per group and a total
    token budget, derive each group's sampling rate.

    Per group: ``target_tokens = floor(share · budget)``,
    ``sampling_rate = min(1, target_tokens / n_tokens)`` (a rate > 1
    would mean up-sampling/epoch repetition — reported capped at 1 so
    the output composes directly with :func:`deterministic_sample`),
    and ``expected_tokens = min(n_tokens, target_tokens)``. Groups
    absent from ``target_shares`` get share 0.

    Scale shape: ONE partially-aggregated groupBy (map-side combine,
    skew-immune — per-group token sums never move rows); the share
    lookup is a literal ``create_map``, no join at all.
    """
    from .quality import words_col

    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(words_col(F.col(text_col))))
        .cast("long")
        .alias("n_tokens"),
    )
    if target_shares:
        share_map = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        share = F.coalesce(share_map[F.col(group_col)], F.lit(0.0))
    else:  # create_map() with zero args is invalid — empty shares = all 0
        share = F.lit(0.0)
    target = F.floor(share * F.lit(float(budget_tokens))).cast("long")
    return agg.select(
        F.col(group_col),
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("target_share"),
        target.alias("target_tokens"),
        F.round(
            F.least(
                F.lit(1.0),
                F.try_divide(target.cast("double"), F.col("n_tokens")),
            ),
            6,
        ).alias("sampling_rate"),
        F.least(F.col("n_tokens"), target).alias("expected_tokens"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str, *, rate: float, buckets: int = 10_000
) -> DataFrame:
    """Reproducible ~``rate`` Bernoulli sample: keep rows whose
    ``pmod(portable_hash(id), buckets)`` falls under ``rate·buckets``
    (rounded to the nearest bucket — a plain ``int()`` truncation turns
    float representation error into an off-by-one threshold for many
    rates, e.g. ``0.043 * 10000 == 429.999…``). Engine- and
    partitioning-independent, narrow (no shuffle), and consistent across
    tables sharing the id (a join of two sampled tables keeps exactly
    the co-sampled rows)."""
    return df.filter(
        F.pmod(hash_of_id_col(id_col), F.lit(buckets))
        < int(rate * buckets + 0.5)
    )


def stratified_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    *,
    out_col: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic dataset splitting — the train/val/test assignment a
    training pipeline needs to be REPRODUCIBLE and engine-independent:
    each row's split is a pure function of its id (portable hash mod
    ``buckets`` mapped through cumulative weight thresholds), so the
    assignment survives re-runs, repartitions, engine changes, and
    co-splits every table sharing the id (joining two split tables
    keeps rows in the SAME split together — the property a random
    split destroys).

    ``splits`` is an ordered list of (name, weight); weights are
    normalized, thresholds round to the nearest bucket (the
    :func:`deterministic_sample` rounding rule — truncation turns float
    dust into off-by-one splits). Narrow projection, no shuffle, no
    RNG. Expected |split| ≈ weight·|df| with binomial concentration;
    exact sizes are data-dependent by design (determinism over exact
    proportions).
    """
    total = sum(w for _, w in splits)
    bucket = F.pmod(hash_of_id_col(id_col), F.lit(buckets))
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w / total
        threshold = int(acc * buckets + 0.5)
        cond = bucket < threshold
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def grouped_split(
    df: DataFrame,
    groups: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    *,
    group_col: str = "keep_id",
    out_col: str = "split",
    buckets: int = 10_000,
) -> DataFrame:
    """Leakage-safe splitting: assign whole near-dup components to one
    split. :func:`stratified_split` hashes each row's OWN id, so two
    near-duplicate documents can land in train and test — and a
    held-out example the model effectively saw in training inflates
    eval scores (the split-contamination failure mode benchmark audits
    keep finding). Here the hashed key is the component REPRESENTATIVE
    (``groups`` = (id, group) from ``near_dup_groups``; ungrouped rows
    fall back to their own id), so every member of a duplicate group
    — and only whole groups — moves between splits together.

    Scale shape: one left join of the corpus against the (much smaller)
    grouped-doc table on the id, then the same narrow hash arithmetic;
    the join is the only shuffle and both sides carry ≤16-B keys.
    """
    g = groups.select(F.col(id_col), F.col(group_col).alias("_rep"))
    keyed = df.join(g, id_col, "left_outer").withColumn(
        "_skey", F.coalesce(F.col("_rep"), F.col(id_col))
    )
    return stratified_split(
        keyed, "_skey", splits, out_col=out_col, buckets=buckets
    ).drop("_rep", "_skey")


def split_leakage(
    pairs: DataFrame,
    assignment: DataFrame,
    *,
    id_col: str = "doc_id",
    split_col: str = "split",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Audit a split assignment against a near-duplicate pair set:
    1 row ``(total_pairs, cross_split_pairs)`` where ``cross`` counts
    pairs whose endpoints landed in DIFFERENT splits — the train/eval
    leakage a per-doc hash split permits and :func:`grouped_split`
    eliminates by construction (both endpoints of every pair share a
    component, hence a representative, hence a split).

    Two skinny equi-joins (pair ids against the (id, split) table) and
    a global count — the pair table is the small operand (near-dup
    pairs, not the corpus) and nothing wider than id+split shuffles.
    """
    a = assignment.select(
        F.col(id_col).alias(a_col), F.col(split_col).alias("_split_a")
    )
    b = assignment.select(
        F.col(id_col).alias(b_col), F.col(split_col).alias("_split_b")
    )
    return (
        pairs.select(a_col, b_col)
        .join(a, a_col)
        .join(b, b_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_pairs"),
            F.coalesce(
                F.sum(
                    (F.col("_split_a") != F.col("_split_b")).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("cross_split_pairs"),
        )
    )


def banded_sample(
    df: DataFrame,
    id_col: str,
    band_col: str,
    rates: dict[str, float],
    *,
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic per-band Bernoulli sampling — the quality-curriculum
    rung between the classifier and the mixture: keep a row iff
    ``portable_hash(id) mod buckets < round(rate(band) · buckets)``, so
    high-quality bands pass whole while low bands thin to their rate,
    and the decision is a pure function of the id (reproducible across
    engines/re-runs, co-sampled with any table sharing the id — the
    :func:`stratified_split` contract applied to rates). Bands absent
    from ``rates`` drop entirely (rate 0) — an explicit-allowlist
    default: a typo'd band name should vanish loudly in counts, not
    pass silently at full rate. Narrow, zero shuffle, no RNG.
    """
    bucket = F.pmod(hash_of_id_col(id_col), F.lit(buckets))
    expr = None
    for name, rate in rates.items():
        threshold = int(rate * buckets + 0.5)
        cond = (F.col(band_col) == name) & (bucket < threshold)
        expr = cond if expr is None else expr | cond
    if expr is None:
        expr = F.lit(False)
    return df.filter(expr)


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    *,
    fraction: float,
) -> DataFrame:
    """Keep the top ``ceil(fraction · |group|)`` rows of each group by
    ``(score DESC, id ASC)`` — the relative quality gate curation
    pipelines actually want ("keep the best 30 % per domain"): an
    absolute score cutoff over- or under-prunes every domain whose
    score distribution shifts, while a per-group fraction adapts by
    construction. The id tie-break makes the cut total and
    engine-independent (equal scores at the boundary would otherwise
    be partitioning luck). Output: ``(id, group, score, quality_rank)``
    for survivors.

    Shape: one group-key shuffle + a rank window + a broadcast of the
    tiny per-group counts. At extreme group skew the hot group's
    window is a straggler; the remedy is the analytic-threshold
    two-phase shape of :func:`cap_per_group_two_phase` with the
    threshold drawn from the group's score quantile sketch instead of
    the uniform-hash arithmetic (scores, unlike hashes, need the
    sketch).
    """
    if not 0 <= fraction <= 1:
        raise ValueError("top_fraction_per_group: fraction must be in [0,1]")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w = W.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.select(id_col, group_col, score_col)
        .withColumn("quality_rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(counts), group_col)
        .filter(
            F.col("quality_rank")
            <= F.ceil(F.lit(float(fraction)) * F.col("_n"))
        )
        .select(id_col, group_col, score_col, "quality_rank")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    budget_docs: int,
    seed: int = 0,
) -> DataFrame:
    """Temperature-scaled mixture sampling (α = 0.5): downsample each
    group so the OUTPUT mixture follows ``p(g) ∝ n_g^α`` under a total
    document budget — the standard multilingual-pretraining rebalance
    (XLM-R §3.1 shape: raw proportions starve tail languages; a uniform
    mixture overfits them; temperature interpolates). High-resource
    groups thin toward the budget, low-resource groups pass (rates cap
    at 1 — no upsampling/repetition here; compose with epoch logic for
    that).

    α is fixed at 1/2 because ``sqrt`` is the one power IEEE 754
    guarantees correctly rounded — ``floor(sqrt(n·10⁶))`` is therefore
    bit-identical on every engine, keeping the whole rate derivation in
    exact integers (an arbitrary ``pow(n, α)`` differs in the last ulp
    across libms and could flip a floor). Weights carry 3 extra decimal
    digits (the ·10⁶ under the root) so small groups don't quantize to
    equal weights.

    Per group: ``w_g = floor(sqrt(n_g·10⁶))``, ``target_g =
    (budget·w_g) div Σw``, ``rate_ppm_g = min(10⁶, (target_g·10⁶) div
    n_g)``; a row survives iff ``pmod(portable_hash(id # seed), 10⁶) <
    rate_ppm`` — the :func:`banded_sample` gate, so survival is a pure
    function of the row and any ANSI engine re-derives it. All
    products run in DECIMAL(38,0) headroom (budget·w can pass int64).

    Scale shape: ONE map-side-combined groupBy for the counts (group
    cardinality is tiny — sources/languages), the ≤|groups|-row rate
    table broadcasts back, and the gate itself is a narrow filter —
    the corpus never shuffles. Output: the surviving rows' ``(id,
    group)`` plus the group's ``rate_ppm`` for audit.
    """
    if budget_docs < 0:
        raise ValueError("temperature_sample: budget_docs must be >= 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    weighted = counts.select(
        group_col,
        "_n",
        F.floor(F.sqrt(F.col("_n").cast("double") * F.lit(1e6)))
        .cast("long")
        .alias("_w"),
    )
    tot = weighted.agg(F.sum("_w").alias("_tw"))
    rates = weighted.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.least(
            F.lit(10**6).cast("long"),
            F.expr(
                f"(CAST(CAST({budget_docs} AS DECIMAL(19,0)) * _w div _tw"
                f" AS DECIMAL(25,0)) * 1000000) div _n"
            ).cast("long"),
        ).alias("rate_ppm"),
    )
    gate = F.pmod(
        portable_hash64_col(
            F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
        ),
        F.lit(10**6),
    )
    return (
        df.select(id_col, group_col)
        .join(F.broadcast(rates), group_col)
        .filter(gate < F.col("rate_ppm"))
        .select(id_col, group_col, "rate_ppm")
    )


def training_order(
    df: DataFrame,
    id_col: str,
    *,
    seed: int = 0,
    n_buckets: int = 32,
    out_col: str = "position",
) -> DataFrame:
    """Deterministic global training order: adds ``out_col`` = this
    row's 0-based position in the corpus-wide shuffle order given by
    ``(portable_hash(id # seed), id)``.

    Training-data pipelines need the example ORDER to be reproducible
    (restart a run, re-materialize a shard, audit what the model saw at
    step N) and re-drawable per epoch — ``seed`` salts the hash, so
    each epoch is a fresh, equally-uniform permutation that any ANSI
    engine can re-derive row-for-row (same portable-hash contract as
    :func:`stratified_split`; a ``Rand()``-based shuffle is
    partitioning- and engine-dependent). Uniformity is the md5 mix;
    ties (hash collisions) break on the id, so the order is total.

    Scale shape — the :func:`~.packing.global_prefix_sum` pattern, a
    global ``row_number()`` window would funnel 100 TB through ONE
    task: range-bucket the hash on sketched quantile boundaries (the
    approximation skews only bucket BALANCE, never the order — bucket
    ranges are contiguous in the hash, ties land in one bucket via the
    ``<=`` boundary rule), rank per bucket in parallel windows, then
    add broadcast per-bucket offsets. One corpus shuffle on the 8-byte
    bucket key, one ≤ ``n_buckets``-row driver window.
    """
    from .packing import bucket_offsets, range_bucketed

    h = portable_hash64_col(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
    )
    d = df.withColumn("_h", h)
    bucketed = range_bucketed(d, F.col("_h"), n_buckets=n_buckets)
    offsets = bucket_offsets(bucketed, F.lit(1))
    w_local = W.partitionBy("_pb").orderBy(F.col("_h"), F.col(id_col))
    return (
        bucketed.join(F.broadcast(offsets), "_pb")
        .withColumn(
            out_col,
            (F.row_number().over(w_local) - 1 + F.col("_off")).cast(
                "long"
            ),
        )
        .drop("_h", "_pb", "_off")
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1024,
    ngram: int = 2,
    scale: int = 10**6,
    seed: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    NeurIPS 2023) weights over hashed n-gram features →
    ``(id_col, n_feats, importance_fp)``: score every RAW-corpus
    document by how much more its features look drawn from the TARGET
    corpus than from the raw corpus itself — the standard "select
    web-scale pretraining data to match a quality/domain target"
    pass; resample raw by descending weight (compose with
    :func:`top_fraction_per_group` / :func:`token_budget_sample`).

    Per bucket b (features are word ``ngram``-grams hashed into
    ``n_buckets`` — DSIR's hashed feature space), with add-one
    smoothing so unseen buckets stay finite::

        p̂(b)  = ((count(b) + 1) · scale) div (total + n_buckets)
        w(b)   = p̂_target(b) − p̂_raw(b)
        score(doc) = Σ_positions w(bucket(gram))

    This is the LINEAR (probability-difference) member of the DSIR
    estimator family: the paper's log-likelihood-ratio weights need
    float ``log``, which is neither order-independent nor
    cross-engine exact — the difference form keeps every step integer
    micro-units (|w| ≤ scale, |score| ≤ positions · scale — int64 at
    any document length), so the weights hash-match an ANSI oracle
    bit-for-bit and re-runs are reproducible to the digit. Both rank
    "target-like" features up and "raw-typical" features down;
    documents with no n-grams (< ``ngram`` words) are omitted,
    matching the oracle.

    Scale shape: gram STRINGS never shuffle — each position hashes to
    its bucket id inside the projection (the
    :func:`~.dedup.repeated_passage_profile` rule); both corpus
    passes partial-aggregate to ≤ ``n_buckets`` rows; the weight
    table (≤ n_buckets rows) broadcast-joins back onto per-(doc,
    bucket) counts; one final id-keyed groupBy. The 100-TB raw corpus
    is read twice (stats pass + scoring pass) and shuffled only as
    (doc, bucket) partial counts — persist the weight table to skip
    the stats pass on re-scores.
    """
    from .dedup import portable_hash64_col, spread_to_cluster
    from .quality import ngrams_col, words_col

    if n_buckets < 1:
        raise ValueError("importance_weights: n_buckets must be >= 1")
    if ngram < 1:
        raise ValueError("importance_weights: ngram must be >= 1")

    def bucket_of(gram: Column) -> Column:
        return F.pmod(
            portable_hash64_col(F.concat_ws("#", gram, F.lit(str(seed)))),
            F.lit(n_buckets),
        ).cast("long")

    def corpus_buckets(df: DataFrame) -> DataFrame:
        # generators must sit top-level in a projection: explode to the
        # gram first, hash it to its bucket in the next select (the
        # gram string dies inside the same stage — nothing wide moves)
        return (
            spread_to_cluster(df)
            .select(
                F.explode(
                    ngrams_col(words_col(F.col(text_col)), ngram)
                ).alias("_g")
            )
            .select(bucket_of(F.col("_g")).alias("_b"))
        )

    def smoothed(counts: DataFrame, prob: str) -> DataFrame:
        tot = counts.agg(F.sum("_c").alias("_tot"))
        return counts.crossJoin(F.broadcast(tot)).select(
            "_b",
            F.expr(
                f"((_c + 1) * CAST({scale} AS BIGINT))"
                f" div (_tot + {n_buckets})"
            ).alias(prob),
        )

    # r15: the raw corpus used to be tokenized + gram-hashed TWICE —
    # once aggregated to the bucket histogram (stats pass), once to
    # per-(doc, bucket) counts (scoring pass). The per-doc counts
    # DETERMINE the histogram (raw_cnt = Σ_doc _n per bucket), so the
    # scoring pass checkpoints once (skinny (id, bucket, n) rows — ≤
    # n_buckets per doc, no gram strings) and the stats pass becomes a
    # partial-aggregated groupBy over it. One full tokenize+hash pass
    # saved at any scale; the target pass stays separate (the operator
    # contract allows an arbitrary target corpus, not a raw subset).
    doc_buckets = materialize(
        spread_to_cluster(raw)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                ngrams_col(words_col(F.col(text_col)), ngram)
            ).alias("_g"),
        )
        .select("_id", bucket_of(F.col("_g")).alias("_b"))
        .groupBy("_id", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    raw_cnt = doc_buckets.groupBy("_b").agg(F.sum("_n").alias("_c"))
    tgt_cnt = corpus_buckets(target).groupBy("_b").agg(
        F.count(F.lit(1)).alias("_c")
    )
    # Weights are needed only on buckets raw documents can hit — raw's
    # own bucket set; absent target buckets smooth to (1·scale) div
    # (total_t + n_buckets) exactly as if counted at 0.
    tgt_tot = tgt_cnt.agg(F.sum("_c").alias("_tt"))
    weights = (
        smoothed(raw_cnt, "_pr")
        .join(tgt_cnt.withColumnRenamed("_c", "_tc"), "_b", "left_outer")
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "_b",
            (
                F.expr(
                    f"((coalesce(_tc, 0L) + 1) * CAST({scale} AS BIGINT))"
                    f" div (coalesce(_tt, 0L) + {n_buckets})"
                )
                - F.col("_pr")
            ).alias("_w"),
        )
    )
    return (
        doc_buckets.join(F.broadcast(weights), "_b")
        .groupBy("_id")
        .agg(
            F.sum("_n").alias("n_feats"),
            F.sum(F.col("_n") * F.col("_w")).alias("importance_fp"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_feats",
            F.col("importance_fp").cast("long").alias("importance_fp"),
        )
    )
