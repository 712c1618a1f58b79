"""Byte-level BPE tokenization — tokenizer-FAITHFUL token counting.

Every real training pipeline budgets in actual BPE tokens, not
regex-approximate word counts (the gap the catalog's other token ops
accept). This module implements the GPT-2-style byte-level BPE *encode*
procedure (Sennrich et al. 2016; byte-level adaptation per Radford et al.
2019) in pure Python over an embedded merge table
(``_bpe_merges.py``, generated reproducibly by ``tools/gen_bpe_merges.py``
from a fixed corpus — data, not magic numbers):

- pretokenize with a simplified GPT-2 regex (ASCII letter/digit classes
  instead of ``\\p{L}``/``\\p{N}`` — a documented simplification; the merge
  procedure itself is exact);
- each pretoken's UTF-8 bytes start as single-byte tokens; the
  lowest-ranked mergeable pair is merged repeatedly until none remains
  (rank = merge-table position, the GPT-2 tie-break);
- merges NEVER cross pretoken boundaries — token counts are therefore
  exactly additive over pretoken concatenation, which is what makes a
  closed-form SQL oracle possible (see queries.py::bpe_token_counts).

Spark integration is an Arrow-batched ``mapInPandas`` stage (the catalog's
standard slow-path shape: zero shuffle, scales with partition count, no
row-at-a-time Python UDF). Encoding memoizes per DISTINCT pretoken within
a worker — natural-language word frequency follows Zipf's law, so the memo
hit rate is high and the per-document cost is dominated by the regex scan,
not the merge loop.

The reference has no tokenizer at all (its text handling stops at column
renames, kamodo_dask.py:300-320); this is additive capability for the
training-data pipeline story.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd

from pyspark.sql import DataFrame

from kamodo_dask_spark.operators._bpe_merges import MERGES

#: Simplified GPT-2 pretokenizer — MUST match tools/gen_bpe_merges.py
#: exactly (merge table and encoder must agree on pretoken boundaries).
PRETOKEN_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

_RANK: dict[tuple[bytes, bytes], int] = {pair: i for i, pair in enumerate(MERGES)}


@lru_cache(maxsize=65536)
def _encode_pretoken(tok: str) -> tuple[bytes, ...]:
    """BPE-encode one pretoken: repeatedly merge the lowest-ranked adjacent
    pair. The lru_cache is the Zipf memo — per-worker, bounded."""
    seq: list[bytes] = [bytes([b]) for b in tok.encode("utf-8")]
    while len(seq) > 1:
        best_rank, best_i = None, -1
        for i in range(len(seq) - 1):
            r = _RANK.get((seq[i], seq[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        # merge EVERY occurrence of the chosen pair left-to-right (the
        # trainer replaced all occurrences per step; encode must mirror it)
        pair = (seq[best_i], seq[best_i + 1])
        merged, out, i = pair[0] + pair[1], [], 0
        while i < len(seq):
            if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                out.append(merged)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return tuple(seq)


def bpe_encode(text: str) -> list[bytes]:
    """Token sequence for a text (token = merged byte string)."""
    out: list[bytes] = []
    for tok in PRETOKEN_RE.findall(text):
        out.extend(_encode_pretoken(tok))
    return out


def bpe_token_count(text: str) -> int:
    return sum(len(_encode_pretoken(tok)) for tok in PRETOKEN_RE.findall(text))


def _apply_merge(syms, left: str, right: str):
    """Greedy leftmost non-overlapping application of ONE merge rule to a
    symbol array, as a row-local fold (``F.aggregate``) — the exact
    semantics of the reference trainer's while-loop
    (tools/gen_bpe_merges.py::train): 'aaaa' under (a,a) → [aa, aa],
    'aaaa a' → [aa, aa, a]. The accumulator trick ``element_at('' ++ acc,
    -1)`` reads the last element without tripping ANSI's out-of-bounds
    error on the empty initial accumulator."""
    from pyspark.sql import functions as F

    merged = F.lit(left + right)

    def step(acc, s):
        last = F.element_at(F.concat(F.array(F.lit("")), acc), -1)
        hit = (last == F.lit(left)) & (s == F.lit(right))
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train_merges(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
    min_count: int = 2,
) -> "list[tuple[str, str, int, int]]":
    """Distributed BPE merge TRAINING (Sennrich et al. 2016) — the
    learn-the-merges half of the tokenizer stack (``bpe_encode`` applies a
    merge table; this produces one). Character-level over a word-frequency
    vocabulary: per round, count adjacent symbol pairs weighted by word
    frequency, take the most frequent (ties to the LARGEST pair — the
    embedded-table generator's ``max`` tie-break, so the two trainers
    agree), and apply it greedily leftmost non-overlapping to every word.

    Everything is integer/string arithmetic — no floats anywhere — so the
    whole trajectory is engine-exact: a relational oracle can unroll the
    rounds and hash-check each chosen pair, its count, AND the corpus
    token total after applying it (which pins the greedy application
    itself: for self-pairs the merged-occurrence count differs from the
    raw pair count exactly when runs overlap).

    100 TB shape: the corpus is tokenized ONCE into the (word, freq)
    vocabulary (one hash shuffle; Zipf makes the vocab orders of magnitude
    smaller than the corpus). Every training round then runs on the vocab
    relation only: pair emission is a row-local ``zip_with`` of shifted
    slices (no posexplode join), the count is one partial-combined
    aggregation whose exchange carries (pair, partial) rows, the winner is
    a ``TakeOrderedAndProject`` limit-1, and the merge application is a
    row-local fold. The vocab is checkpointed per round (lineage
    truncation — the connected-components discipline), LAZILY: the next
    round's winner collect is its first consumer and materializes it, so
    each round costs one driver-blocking action, and the per-round corpus
    totals are answered in one deferred union action over the checkpointed
    iterates (r15). Driver state: one (pair, count) per round.

    Returns ``[(left, right, pair_count, corpus_tokens_after), ...]``,
    stopping early when the best pair's count falls below ``min_count``
    (the generator's noise rule) or no pairs remain.
    """
    from pyspark.sql import functions as F

    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    freq = F.col(freq_col).cast("bigint")
    # eager=False throughout the loop (r15): the driver loop is strictly
    # sequential, and each round's winner collect is the FIRST consumer
    # of the current iterate — it materializes the lazy checkpoint, so
    # every round costs ONE driver-blocking action (was three: eager
    # checkpoint + winner collect + corpus-total collect; the totals are
    # deferred below).
    cur = vocab.select(
        freq.alias("_freq"),
        # per-character split; regexp_extract_all('.') has no zero-width
        # trailing-empty edge the way split-on-lookahead does
        F.regexp_extract_all(F.col(word_col), F.lit("."), F.lit(0)).alias(
            "_syms"
        ),
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    iterates: list[DataFrame] = []
    for _ in range(n_merges):
        syms = F.col("_syms")
        n = F.size(syms)
        pair = F.zip_with(
            F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        top = (
            cur.select(F.col("_freq"), F.explode(pair).alias("_p"))
            .groupBy(F.col("_p.l").alias("l"), F.col("_p.r").alias("r"))
            .agg(F.sum("_freq").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), F.desc("l"), F.desc("r"))
            .limit(1)  # TakeOrderedAndProject; driver gets ONE row
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        cur = cur.select(
            F.col("_freq"), _apply_merge(syms, left, right).alias("_syms")
        ).localCheckpoint(eager=False)
        merges.append((left, right, cnt))
        iterates.append(cur)
    if not merges:
        return []
    # the per-round corpus token totals, deferred to ONE action: each
    # applied round's iterate is checkpointed, so the totals are the
    # same numbers the old per-round collect returned, computed as a
    # union of per-iterate aggregates whose independent subtrees run
    # concurrently (guide §2.6 expressed in-plan). The LAST iterate's
    # aggregate also materializes its checkpoint for callers that keep
    # training.
    totals_df = None
    for i, it in enumerate(iterates):
        t = it.agg(
            F.lit(i).alias("_i"),
            F.sum(F.size(F.col("_syms")) * F.col("_freq"))
            .cast("bigint")
            .alias("_t"),
        )
        totals_df = t if totals_df is None else totals_df.unionByName(t)
    totals = {int(r["_i"]): int(r["_t"]) for r in totals_df.collect()}
    return [
        (left, right, cnt, totals[i])
        for i, (left, right, cnt) in enumerate(merges)
    ]


def with_bpe_token_count(
    df: DataFrame, text_col: str = "text", out_col: str = "n_bpe_tokens"
) -> DataFrame:
    """Append a tokenizer-faithful BPE token count column.

    One Arrow-batched ``mapInPandas`` pass — zero shuffle, all input
    columns carried through, NULL text counts as NULL (unknown ≠ empty).
    """
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` bigint"

    def count_batches(it):
        for pdf in it:
            counts = [
                bpe_token_count(t) if isinstance(t, str) else None
                for t in pdf[text_col]
            ]
            out = pdf.copy()
            out[out_col] = pd.array(counts, dtype="Int64")
            yield out

    return df.mapInPandas(count_batches, schema)
