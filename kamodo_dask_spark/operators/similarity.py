"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — broadcast the (small) query set
against the full corpus; dot products stay JVM-side via ``zip_with`` +
``aggregate`` higher-order functions (no Python in the hot path).

Scale path: LSH bucketing by random-hyperplane signs — candidates share a
signature bucket, turning the O(N·Q) scan into an equi-join; planes are
seeded & deterministic so results are reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def dot(a, b) -> Column:
    """Σ aᵢ·bᵢ over two array columns, evaluated left-to-right in float64."""
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Broadcast the query set (it is small by definition of "query"), score
    every corpus vector JVM-side, keep k per query with a window. One scan
    of the corpus, one shuffle (by query_id for top-k) — at 1000 executors
    this is the flat-scaling exact baseline.

    Ranking ties (identical scores) break by corpus id — deterministic.
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, score >= threshold).

    With ``block_col`` (a cluster/label/bucket column) the self-join is an
    equi-join within blocks — the standard blocked-dedup shape that keeps the
    pair count ~N²/B instead of N². Without it this is a full cross self-join:
    exact, but only for small corpora (use LSH bucketing as the block_col
    producer at scale).
    """
    sel = [F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")]
    if block_col:
        sel.append(F.col(block_col).alias("_blk"))
    base = df.select(*sel)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col:
        cond = (F.col("a._blk") == F.col("b._blk")) & cond
        joined = a.join(b, cond)
    else:
        joined = a.join(b, cond)
    scored = joined.select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        F.round(cosine(F.col("a._v"), F.col("b._v")), 6).alias("score"),
    )
    return scored.filter(F.col("score") >= threshold)


def hyperplane_signature(vec_col, planes: np.ndarray) -> Column:
    """Sign bits of the vector against each hyperplane, packed into a bigint."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        d = dot(vec_col, F.lit([float(x) for x in plane]))
        sig = sig + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    seed: int = 42,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k: candidates = corpus vectors sharing a
    random-hyperplane signature bucket with the query in ANY of ``n_tables``
    independent tables; exact rescoring within candidates.

    The bucket join is an equi-join on (table, signature) — shuffle keys are
    uniform hashes, so this scales linearly with corpus size. Recall is
    tunable via n_planes (bucket granularity) and n_tables (OR-amplification).
    """
    rng = np.random.default_rng(seed)
    tables = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]

    def signatures(df: DataFrame, ident: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    hyperplane_signature(F.col(vec_col), planes).alias("sig"),
                )
                for t, planes in enumerate(tables)
            ]
        )
        return (
            df.select(F.col(id_col).alias(ident), F.col(vec_col).alias(f"_{ident}_vec"), F.explode(sigs).alias("_s"))
            .select(ident, f"_{ident}_vec", F.col("_s.tbl").alias("tbl"), F.col("_s.sig").alias("sig"))
        )

    qs = signatures(queries, "query_id")
    cs = signatures(corpus, "neighbor_id")
    cand = (
        F.broadcast(qs)
        .join(cs, on=["tbl", "sig"])
        .select("query_id", "neighbor_id", "_query_id_vec", "_neighbor_id_vec")
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_query_id_vec"), F.col("_neighbor_id_vec")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )
