"""Market-basket association mining over a (basket, item) relation.

The co-occurrence statistics behind "frequently bought together",
query-expansion dictionaries, and co-citation curation: which item
pairs appear in the same basket more often than chance. This module is
the support/confidence/lift half of Apriori — pair generation bounded
by basket width, never by catalog size², with the support threshold
applied BEFORE any per-item statistics join.

Scale notes: pair candidates are Σ_baskets C(k, 2) — quadratic in
BASKET WIDTH, linear in basket count — so the one production knob that
matters is ``max_basket``: a pathological basket (a crawler session
with 10^4 items) contributes 5·10^7 pairs on its own; real pipelines
drop or sample such baskets, and this operator drops them loudly by
default rather than letting one row explode the shuffle. All
statistics are exact integer counts; confidence/lift ship as exact
PARTS-PER-MILLION integers (floor division) because quotients of small
integers are exactly the values that can land on a rounding half and
fork engines (catalog rounding convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Directed association rules ``antecedent → consequent`` for every
    item pair co-occurring in at least ``min_support`` baskets.

    Returns one row per DIRECTED rule: ``(antecedent, consequent,
    n_both, n_antecedent, n_consequent, n_baskets, confidence_ppm,
    lift_ppm)`` where ``confidence_ppm = 10^6 · n_both DIV n_antecedent``
    and ``lift_ppm = 10^6 · n_both · n_baskets DIV (n_antecedent ·
    n_consequent)`` — all exact int64 (ppm floor), no float division
    anywhere. Duplicate (basket, item) rows collapse first (a basket
    contains an item or not). Baskets wider than ``max_basket`` items
    are EXCLUDED from all statistics (support counts and basket total
    alike — the statistics stay mutually consistent).

    Plan: distinct (basket, item) → per-basket width filter → pair
    equi-join on the basket key (canonical ``a < b``) → one pair-count
    agg → support filter → two broadcast-able item-count joins. The
    pair relation exists only for baskets that survived the width
    guard; the support filter runs before any join.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_basket < 2:
        raise ValueError(f"max_basket must be >= 2, got {max_basket}")
    bi = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .filter(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )
    width_ok = (
        bi.groupBy("_b")
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") <= max_basket)
        .select("_b")
    )
    # eager=False: the basket-count scalar below materializes it (r14)
    bi = bi.join(width_ok, "_b", "left_semi").localCheckpoint(eager=False)
    n_baskets = bi.select("_b").distinct().count()  # scalar, inlined

    a, b = bi.alias("a"), bi.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._b") == F.col("b._b"))
            & (F.col("a._i") < F.col("b._i")),
        )
        .groupBy(
            F.col("a._i").alias("_x"), F.col("b._i").alias("_y")
        )
        .agg(F.count("*").alias("_nb"))
        .filter(F.col("_nb") >= min_support)
    )
    item_n = bi.groupBy(F.col("_i")).agg(F.count("*").alias("_ni"))
    directed = pairs.select(
        F.col("_x").alias("_ant"), F.col("_y").alias("_con"), "_nb"
    ).unionByName(
        pairs.select(
            F.col("_y").alias("_ant"), F.col("_x").alias("_con"), "_nb"
        )
    )
    na = item_n.select(F.col("_i").alias("_ant"), F.col("_ni").alias("_na"))
    nc = item_n.select(F.col("_i").alias("_con"), F.col("_ni").alias("_nc"))
    out = (
        directed.join(F.broadcast(na), "_ant")
        .join(F.broadcast(nc), "_con")
        .select(
            F.col("_ant").alias("antecedent"),
            F.col("_con").alias("consequent"),
            F.col("_nb").cast("bigint").alias("n_both"),
            F.col("_na").cast("bigint").alias("n_antecedent"),
            F.col("_nc").cast("bigint").alias("n_consequent"),
            F.lit(n_baskets).cast("bigint").alias("n_baskets"),
            F.expr("CAST(1000000 * _nb DIV _na AS BIGINT)").alias(
                "confidence_ppm"
            ),
            F.expr(
                f"CAST(1000000 * _nb * {n_baskets} DIV (_na * _nc) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    return out
