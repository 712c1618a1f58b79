"""Skew mitigation: salted joins.

AQE's skew-join splitting handles sort-merge skew transparently (enabled in
session defaults), but two cases still need explicit salting at 100 TB:
aggregations on heavy-hitter keys, and joins where one side must be
replicated per salt. These helpers implement the standard replicate-and-salt
pattern with built-in expressions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a smaller table on ``on``, spreading each key
    over ``salts`` partitions.

    The skewed side gets a uniform random salt per row; the small side is
    replicated ``salts`` times (explode of a literal range). The join key
    becomes (key, salt) — a heavy-hitter key's rows land in ``salts``
    different tasks instead of one straggler.
    """
    salted_fact = skewed.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    out = salted_fact.join(replicated, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, str],
    salts: int = 16,
) -> DataFrame:
    """Heavy-hitter-safe aggregation: aggregate on (key, salt) first, then
    merge partials per key. ``agg_exprs`` maps output column → one of
    sum|count|min|max (the decomposable aggregates).

    Spark's hash aggregation already partial-aggregates map-side, which
    covers most skew; this explicit two-phase shape is for pipelines where a
    single key dominates entire partitions post-shuffle (e.g. groupBy after
    an explode).
    """
    partial_aggs, final_aggs = [], []
    for out_col, kind in agg_exprs.items():
        src = out_col
        if kind == "sum":
            partial_aggs.append(F.sum(src).alias(f"_p_{out_col}"))
            final_aggs.append(F.sum(f"_p_{out_col}").alias(out_col))
        elif kind == "count":
            partial_aggs.append(F.count("*").alias(f"_p_{out_col}"))
            final_aggs.append(F.sum(f"_p_{out_col}").alias(out_col))
        elif kind == "min":
            partial_aggs.append(F.min(src).alias(f"_p_{out_col}"))
            final_aggs.append(F.min(f"_p_{out_col}").alias(out_col))
        elif kind == "max":
            partial_aggs.append(F.max(src).alias(f"_p_{out_col}"))
            final_aggs.append(F.max(f"_p_{out_col}").alias(out_col))
        else:
            raise ValueError(f"non-decomposable aggregate: {kind}")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
