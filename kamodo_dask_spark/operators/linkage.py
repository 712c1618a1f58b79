"""Record linkage / entity resolution ACROSS relations.

The dedup stack resolves duplicates WITHIN one corpus; linkage matches
records BETWEEN two relations with no shared key — the "same real-world
entity, different spellings" problem of joining a crawl against a catalog,
a vendor feed against a master table, or a corrupted re-ingest against the
original. Classic blocking-and-verify shape (the scalable half of
Fellegi–Sunter): cheap blocking keys bound the candidate space, an exact
similarity verifies candidates, and a per-record argmax resolves to the
best match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kamodo_dask_spark.operators.text import words


def link_records(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    text_col: str = "name",
    threshold: float = 0.5,
    max_block: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Match every ``right`` record to its best ``left`` record by word-set
    Jaccard, with adjacent-word-BIGRAM blocking.

    Pipeline (each stage a bounded relation):

    1. blocking keys: adjacent word bigrams of the normalized name —
       far more selective than single words when the name vocabulary is
       small (catalog names drawn from ~100 words make single-word blocks
       quadratically explosive; bigrams square the vocabulary);
    2. frequency guard: bigrams whose combined document frequency exceeds
       ``max_block`` are DROPPED before pairing (the name-space's
       stop-words) — candidates are bounded by Σ df_L·df_R over kept keys,
       never |L|·|R|;
    3. candidates: distinct (left, right) pairs sharing a kept bigram —
       a hash-uniform equi-join, never a cross join;
    4. verify: exact Jaccard over DISTINCT word sets, computed
       relationally (candidates ⋈ left words ⋈ right words on the word,
       one count per pair) and rounded for engine-portable comparison;
    5. resolve: per right record, ``row_number`` over (jaccard desc,
       left id asc) — rank state is one row per right record, no global
       sort — keeping rank 1 at or above ``threshold``.

    Returns ``(right_id, left_id, jaccard)``. Right records with no
    candidate or no match ≥ threshold are absent (no forced match).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_block < 1:
        raise ValueError(f"max_block must be >= 1, got {max_block}")
    if left_id == right_id:
        raise ValueError(
            f"left_id and right_id must differ (both {left_id!r}) — the "
            "output carries one column per side"
        )

    def prep(df: DataFrame, id_col: str, tag: str) -> "tuple[DataFrame, DataFrame]":
        ws = words(F.col(text_col))
        base = df.select(
            F.col(id_col).alias(f"{tag}id"), ws.alias("_ws")
        ).filter(F.size("_ws") > 0)
        toks = base.select(
            f"{tag}id", F.explode(F.array_distinct("_ws")).alias("word")
        )
        n = F.size(F.col("_ws"))
        bigram = F.zip_with(
            F.slice("_ws", 1, F.greatest(n - 1, F.lit(0))),
            F.slice("_ws", 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        blocks = base.select(
            f"{tag}id", F.explode(F.array_distinct(bigram)).alias("bkey")
        )
        return toks, blocks

    ltoks, lblocks = prep(left, left_id, "l")
    rtoks, rblocks = prep(right, right_id, "r")

    # frequency guard over the UNION of both sides' block memberships
    df_counts = (
        lblocks.select("bkey")
        .unionByName(rblocks.select("bkey"))
        .groupBy("bkey")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_block)
        .select("bkey")
    )
    # rblocks needs no separate df_counts probe: the bkey equi-join with
    # the already-guard-filtered left side restricts it to kept keys
    cand = (
        lblocks.join(df_counts, "bkey")
        .join(rblocks, "bkey")
        .select("lid", "rid")
        .distinct()
    )
    lsize = ltoks.groupBy("lid").agg(F.count("*").alias("_ln"))
    rsize = rtoks.groupBy("rid").agg(F.count("*").alias("_rn"))
    shared = (
        cand.join(ltoks, "lid")
        .join(rtoks, ["rid", "word"])
        .groupBy("lid", "rid")
        .agg(F.count("*").alias("_shared"))
    )
    jac = F.round(
        F.col("_shared")
        / (F.col("_ln") + F.col("_rn") - F.col("_shared")),
        round_digits,
    )
    scored = (
        shared.join(lsize, "lid")
        .join(rsize, "rid")
        .select("rid", "lid", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    win = Window.partitionBy("rid").orderBy(
        F.col("jaccard").desc(), F.col("lid").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .select(
            F.col("rid").alias(right_id),
            F.col("lid").alias(left_id),
            "jaccard",
        )
    )
