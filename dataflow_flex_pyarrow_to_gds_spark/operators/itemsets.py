"""Frequent-itemset / association-rule mining over basket-shaped data.

The classic market-basket pass (Agrawal & Srikant, VLDB'94) expressed
declaratively: pair supports from ONE within-basket self-join, rule
metrics from two broadcast joins against per-item supports — no
candidate generation loops, no driver state. The reference has no
mining surface (its scope stops at ETL into GDS); this is part of the
§7.3 analytics growth the curation family (co-occurrence, retrieval)
already leans on, and Spark's own MLlib ships the same surface as
FPGrowth — here it stays whole-stage-codegen SQL so the result is
exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pair_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_basket_items: int | None = None,
    lift_scale: int = 1_000_000,
) -> DataFrame:
    """Pairwise association rules → one row per unordered item pair
    ``(item_a, item_b)`` with ``item_a < item_b``:

    - ``supp_ab``  — baskets containing BOTH items (≥ ``min_support``)
    - ``supp_a`` / ``supp_b`` — per-item basket counts
    - ``conf_a_to_b_pct`` / ``conf_b_to_a_pct`` — rule confidence
      P(b|a), P(a|b) in integer percent (floor division)
    - ``lift_ppm`` — lift · 10⁶ as an integer:
      ``(supp_ab · n_baskets · lift_scale) div (supp_a · supp_b)``;
      > 10⁶ means the pair co-occurs more than independence predicts.

    Every metric is integer end-to-end (counts, floor divisions in
    DECIMAL(38,0) — ``supp_ab·n·10⁶`` wraps int64 already at ~10⁹
    baskets), so the whole rule table hash-matches an ANSI oracle.

    Scale shape: items dedup to (basket, item) with a partial-agg
    distinct, pairs come from ONE equi-join on the basket key (shuffle
    keyed by basket — co-partitioned with the dedup, so AQE reuses the
    exchange) followed by a partial-agg pair count; the ``min_support``
    filter cuts the long tail (support-1 pairs dominate any corpus)
    BEFORE the metric joins; per-item supports are ≤ |items| rows and
    broadcast; ``n_baskets`` rides a 1-row broadcast cross join (the
    modularity 2m pattern — no driver action). Self-join fan-out is
    quadratic in basket SIZE, not corpus size — ``max_basket_items``
    EXCLUDES degenerate mega-baskets (a crawler session touching every
    item carries no signal and would alone produce more pairs than the
    rest of the corpus); exclusion is part of the contract and replays
    in the oracle.
    """
    if min_support < 1:
        raise ValueError(
            f"frequent_pair_rules: min_support must be >= 1, got "
            f"{min_support}"
        )
    if max_basket_items is not None and max_basket_items < 2:
        raise ValueError(
            f"frequent_pair_rules: max_basket_items must be >= 2, got "
            f"{max_basket_items}"
        )
    baskets = (
        df.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .groupBy("_bk", "_it")
        .agg(F.count(F.lit(1)).alias("_n"))
        .drop("_n")
    )
    if max_basket_items is not None:
        sizes = baskets.groupBy("_bk").agg(
            F.count(F.lit(1)).alias("_sz")
        )
        baskets = (
            baskets.join(sizes, "_bk")
            .filter(F.col("_sz") <= max_basket_items)
            .drop("_sz")
        )
    # five downstream consumers (pair self-join ×2, item supports,
    # basket count, and the size filter already applied) would each
    # re-derive the distinct from the raw scan — materialize the skinny
    # (basket, item) table ONCE instead (lazy local checkpoint: one
    # distinct shuffle total, the iterative-family discipline)
    baskets = baskets.localCheckpoint(eager=False)
    pairs = (
        baskets.alias("a")
        .join(baskets.alias("b"), on="_bk")
        .filter(F.col("a._it") < F.col("b._it"))
        .select(
            F.col("a._it").alias("item_a"), F.col("b._it").alias("item_b")
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= min_support)
    )
    supports = baskets.groupBy("_it").agg(
        F.count(F.lit(1)).alias("_supp")
    )
    nb = baskets.select("_bk").distinct().agg(
        F.count(F.lit(1)).alias("_nb")
    )
    dec = "DECIMAL(38,0)"
    return (
        pairs.join(
            F.broadcast(
                supports.select(
                    F.col("_it").alias("item_a"),
                    F.col("_supp").alias("supp_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                supports.select(
                    F.col("_it").alias("item_b"),
                    F.col("_supp").alias("supp_b"),
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "supp_ab",
            "supp_a",
            "supp_b",
            F.expr("100 * supp_ab div supp_a").alias("conf_a_to_b_pct"),
            F.expr("100 * supp_ab div supp_b").alias("conf_b_to_a_pct"),
            F.expr(
                f"CAST(CAST(supp_ab AS {dec}) * _nb * {lift_scale} div "
                f"(CAST(supp_a AS {dec}) * supp_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
