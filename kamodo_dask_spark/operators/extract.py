"""Dictionary-gazetteer information extraction over a document table.

Tagging a corpus against a controlled vocabulary — product names, topic
phrases, PII terms, banned strings — is the IE step of most curation
pipelines, and at 100 TB it must be one tokenize pass + one broadcast
join, never a scan per dictionary entry (grep-in-a-loop) and never a
regex alternation that grows with the dictionary. Multi-word entities
are first-class: the corpus side materializes token n-grams only for
the n values the gazetteer actually contains, and (list-gazetteer path)
only at positions whose FIRST token can start a phrase — the relational
form of an Aho–Corasick prefix gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from kamodo_dask_spark.operators.text import words


def _ngrams(ws: Column, n: int) -> Column:
    """Adjacent token n-grams of a token array, space-joined, row-local
    (the linkage-bigram spelling generalized to n)."""
    if n == 1:
        return ws
    length = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    parts = [F.slice(ws, i + 1, length) for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.concat_ws(" ", a, b))
    return out


def gazetteer_match(
    docs: DataFrame,
    phrases: "list[str] | DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Count occurrences of every gazetteer phrase in every document:
    ``(id_col, phrase, n_mentions)`` — phrases that never occur in a
    document produce NO row for it (sparse output, the IE convention).

    Matching is whitespace-token exact after lowercasing (the corpus
    tokenizer's normalization); a phrase of n tokens matches the
    document's adjacent n-grams, overlaps counted per occurrence.

    ``phrases`` as a Python list ships as literals: the corpus-side
    n-gram arrays are pre-filtered row-locally against the phrase set
    (first-token gate folded in) so only true mentions ever explode —
    zero shuffle until the per-(doc, phrase) count. As a DataFrame
    (big/dynamic dictionaries) the n-grams explode and the gazetteer
    broadcast-joins; volume is Σ_n (tokens − n + 1) over the distinct
    phrase lengths only.

    100 TB: one corpus scan either way; the dictionary never drives scan
    count; the only exchange is the final (doc, phrase) partial-combined
    count.
    """
    as_list = isinstance(phrases, list)
    if as_list:
        normed = [" ".join(p.lower().split()) for p in phrases]
        if not normed or any(not p for p in normed):
            raise ValueError("phrases must be non-empty strings")
        ns = sorted({p.count(" ") + 1 for p in normed})
    else:
        pdf = phrases.select(
            F.col(phrase_col).cast("string").alias("_phrase")
        ).filter(F.col("_phrase").isNotNull())
        # normalize EXACTLY like the list path: lowercase, whitespace
        # tokenize, DROP empty tokens (a phrase with leading/trailing
        # whitespace would otherwise re-join with embedded empties and
        # silently never match a corpus n-gram), re-join single-spaced
        toks = F.filter(
            F.split(F.lower("_phrase"), r"\s+"), lambda x: x != ""
        )
        pdf = pdf.select(
            F.array_join(toks, " ").alias("_phrase"),
            F.size(toks).alias("_nt"),
        ).distinct()
        # distinct token counts in the dictionary: ONE metadata-sized
        # collect serves both validation (0 tokens = an all-whitespace
        # phrase) and the plan-time question of how many n-gram
        # projections to build
        ns = sorted(
            r[0] for r in pdf.select("_nt").distinct().collect()
        )
        if not ns:
            raise ValueError("empty gazetteer")
        if ns[0] == 0:
            raise ValueError("phrases must be non-empty strings")
        pdf = pdf.select("_phrase")

    ws = words(F.col(text_col))
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), ws.alias("_ws")
    )
    gram_arrays = [_ngrams(F.col("_ws"), n) for n in ns]
    if as_list:
        lits = F.array(*[F.lit(p) for p in sorted(set(normed))])
        gram_arrays = [
            F.filter(g, lambda x: F.array_contains(lits, x))
            for g in gram_arrays
        ]
    cand = base.select(
        id_col,
        F.explode(F.flatten(F.array(*gram_arrays))).alias("_g"),
    )
    if as_list:
        hits = cand
    else:
        hits = cand.join(
            F.broadcast(pdf), cand["_g"] == pdf["_phrase"], "left_semi"
        )
    return hits.groupBy(id_col, F.col("_g").alias(phrase_col)).agg(
        F.count("*").cast("bigint").alias("n_mentions")
    )
