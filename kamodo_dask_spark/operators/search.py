"""Keyword search: BM25 scoring and top-k retrieval over a document table.

A training-data pipeline needs corpus search (inspect dedup clusters, pull
contamination candidates, audit quality gates). The Spark-first shape is an
inverted-index aggregation, NOT a scan-per-query: tokenize once, keep only
postings for the query terms (filter BEFORE the shuffle — the exploded
relation is |matching tokens|, not |all tokens|), aggregate term frequencies,
broadcast the tiny per-term document-frequency relation, score, and take
top-k with ``TakeOrderedAndProject`` (per-partition heaps, no global sort).

At 100 TB the same plan holds: the only wide exchange is the (doc, term)
partial-count aggregation over postings already restricted to query terms;
corpus statistics (N, avgdl) are one map-side agg, and every join after
tokenization is broadcast-sized (|Q| or |Q|·k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kamodo_dask_spark.operators.text import words


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 over lowercased whitespace tokens.

    Returns ``(id_col, score)`` ordered by (rounded score desc, id) — the
    rounding makes the ranking reproducible across engines (catalog
    convention). ``idf = ln((N - df + 0.5) / (df + 0.5) + 1)`` (the
    Lucene-style always-positive variant).
    """
    from pyspark import StorageLevel

    terms = [t.lower() for t in query_terms]
    # Cache the tokenized relation for the DURATION OF THIS CALL only: both
    # the stats pass and the postings materialization consume it, and
    # tokenization (split + lower over every document) is the dominant cost
    # — without the cache the corpus is tokenized TWICE. MEMORY_AND_DISK so
    # a corpus bigger than executor memory spills rather than recomputes.
    ws = docs.select(F.col(id_col), words(F.col(text_col)).alias("_ws")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        # one pass for corpus stats: N docs, average doc length — a 2-scalar
        # driver value inlined as literals (metadata-sized, like axis
        # collects). A scalar crossJoin would plan as
        # BroadcastNestedLoopJoin (Catalyst folds constant join keys), which
        # the plan sweep bans outright.
        n_docs, avgdl = ws.agg(F.count("*"), F.avg(F.size("_ws"))).first()
        if not n_docs or avgdl is None:
            # empty corpus: idf/avgdl are undefined — return an empty result
            # with the contract schema instead of crashing on float(None).
            return docs.select(F.col(id_col), F.lit(0.0).alias("score")).limit(0)

        # Materialize the postings (|docs matching any query term| rows —
        # corpus-independent small) with an EAGER localCheckpoint: the
        # returned plan reads the checkpointed relation, so the wide ws
        # cache can be released before returning instead of leaking with no
        # handle (r3 ADVICE). Checkpoint blocks are owned by the returned
        # DataFrame's RDD lineage and are GC-cleaned with it — unlike a
        # CacheManager entry, which pins until an explicit unpersist that
        # callers could never issue.
        postings = (
            ws.select(
                F.col(id_col), F.size("_ws").alias("_dl"), F.explode("_ws").alias("term")
            )
            .filter(F.col("term").isin(terms))  # before the agg shuffle
            .groupBy(id_col, "term")
            .agg(F.count("*").alias("_tf"), F.first("_dl").alias("_dl"))
            .localCheckpoint(eager=True)
        )
    finally:
        ws.unpersist()
    docfreq = postings.groupBy("term").agg(F.countDistinct(id_col).alias("_df"))

    scored = (
        postings.join(F.broadcast(docfreq), "term")
        .withColumn(
            "_idf",
            F.log((F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0),
        )
        .withColumn(
            "_s",
            F.col("_idf")
            * (F.col("_tf") * (k1 + 1))
            / (F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(float(avgdl)))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_s"), round_to).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
