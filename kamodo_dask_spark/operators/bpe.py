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
