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


def edit_distance_join(
    left: DataFrame,
    right: DataFrame | None,
    left_id: str,
    right_id: str | None,
    text_col: str = "name",
    max_dist: int = 1,
    hash_keys: bool = True,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` (1 or 2), by
    DELETION-NEIGHBORHOOD blocking (the FastSS/SymSpell family): two
    strings are within distance t iff their ≤t-deletion variant sets
    intersect, so candidate generation is one equi-join on variant keys
    — never a cross join, and never a quadratic scan of a length bucket.

    Soundness (t=1): a substitution at i makes ``delete(a,i) ==
    delete(b,i)``; an insertion makes the original of one side a
    1-deletion of the other; equality is the trivial intersection — so
    the variant join has NO false negatives, and the exact
    ``levenshtein`` verify removes its false positives. t=2 composes
    deletions twice.

    ``right=None`` switches to SELF-join mode over ``left`` (emitting
    each unordered pair once, ``id_a < id_b``); otherwise the join is
    between the two relations. Returns ``(id_a, id_b, dist)`` (self) or
    ``(left_id, right_id, dist)`` (two-relation).

    100 TB shape: variant generation is row-local (``1 + L`` keys per
    string at t=1, ``O(L²)`` at t=2 — the SymSpell precompute trade,
    which is why t is capped at 2); ``hash_keys`` exchanges 64-bit
    xxhash64 of each variant instead of the string (same trick as the
    substring-dedup anchors — hash collisions only ADD candidates, and
    the verify step removes them, so correctness is unaffected). The
    candidate relation is deduplicated BEFORE the verify so each pair
    pays one levenshtein however many variants it shares. Skew caveat:
    a cluster of k near-identical strings necessarily yields ~k²
    verified pairs — that is the answer's size, not an artifact;
    upstream exact-dedup first if identical strings dominate.
    """
    if max_dist not in (1, 2):
        raise ValueError(f"max_dist must be 1 or 2, got {max_dist}")
    self_mode = right is None
    if self_mode:
        right = left
        right_id = right_id or left_id
    elif right_id is None:
        raise ValueError("right_id required when right is given")
    if not self_mode and left_id == right_id:
        raise ValueError("left_id and right_id must differ in two-relation mode")

    # ≤1-deletion variants of a term, as a SQL expr (substring with
    # column positions has no literal-only binding problem in SQL form)
    def d1(term: str) -> str:
        return (
            f"array_union(array({term}), "
            f"transform(sequence(1, length({term})), i -> "
            f"concat(substring({term}, 1, i - 1), "
            f"substring({term}, i + 1, length({term}) - i))))"
        )

    def variants(col: str) -> str:
        if max_dist == 1:
            return d1(col)
        # ≤2 deletions: one more deletion applied to every ≤1-variant
        # (the lambda variable _x is deliberately distinct from any
        # column name in scope)
        return f"array_distinct(flatten(transform({d1(col)}, _x -> {d1('_x')})))"

    def keyed(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(f"{tag}id"),
            F.col(text_col).alias(f"{tag}s"),
        ).filter(F.col(f"{tag}s").isNotNull())
        v = F.expr(variants(f"{tag}s"))
        out = base.select(
            f"{tag}id", f"{tag}s", F.explode(v).alias("_var")
        )
        key = F.xxhash64("_var") if hash_keys else F.col("_var")
        return out.select(f"{tag}id", f"{tag}s", key.alias("_bk")).distinct()

    lk = keyed(left, left_id, "l")
    if self_mode:
        # one variant build serves both join sides (eagerly materialized:
        # generation is the expensive row-local stage, and without the
        # checkpoint the self-join would tokenize the corpus twice)
        lk = lk.localCheckpoint(eager=True)
        rk = lk.select(
            F.col("lid").alias("rid"),
            F.col("ls").alias("rs"),
            "_bk",
        )
    else:
        rk = keyed(right, right_id, "r")
    pair_filter = (
        (F.col("lid") < F.col("rid")) if self_mode else F.lit(True)
    )
    cand = (
        lk.join(rk, "_bk")
        .filter(pair_filter)
        .select("lid", "ls", "rid", "rs")
        .distinct()
    )
    out_a = left_id if not self_mode else "id_a"
    out_b = right_id if not self_mode else "id_b"
    return (
        cand.withColumn("dist", F.levenshtein("ls", "rs").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("lid").alias(out_a),
            F.col("rid").alias(out_b),
            "dist",
        )
    )
