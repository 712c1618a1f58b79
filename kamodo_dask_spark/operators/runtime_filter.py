"""Explicit runtime-filter pruning: bloom-filter a big relation by a
small one BEFORE the expensive part of the plan.

Spark's optimizer injects runtime bloom filters into shuffle joins on
its own (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only
between the two sides of a JOIN it can see. A pipeline often needs the
same trick where the optimizer cannot reach: prune a 100 TB scan by a
dynamically computed key set before a Python-worker stage (``mapInPandas``
decode, model scoring), before a write, or across two separately-built
DataFrames. This module makes the pattern a first-class operator with
EXACT results: the bloom probe is a row-local pre-filter (false
positives pass), and an optional exact semi join mops up — so
correctness never depends on the filter, only the pruning ratio does.

Scale design: the filter side is reduced to DISTINCT keys and hashed to
``n_hashes`` bit positions per key (one projection + distinct — the
relation shuffled is |keys| × h integers, nothing else). The bitmap is
assembled driver-side (metadata-sized by the broadcast-join-side
assumption: 1 M keys × 10 bits/key ≈ 1.2 MB) and shipped back as a
LITERAL array of longs, so the probe is pure whole-stage-codegen
arithmetic — ``element_at`` + shift + mask per hash, zero Python, zero
shuffle, evaluated straight after the scan. The mop-up semi join sees
only the surviving fraction. For filter sides too big to collect, use a
plain broadcast semi join instead — a bloom that does not fit driver
memory has no advantage over the hash relation it approximates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits per long word in the literal bitmap
_W = 64


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """The h bloom bit positions of a key: independent xxhash64 seeds,
    pmod m. Identical spelling on the build and probe sides (the whole
    contract)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits))
        for seed in range(n_hashes)
    ]


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    m_bits: int = 1 << 16,
    n_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """``big`` semi-joined to ``small``'s key set, with a bloom pre-probe
    doing the heavy pruning row-locally before any join machinery runs.

    NULL big-side keys never match (SQL semi-join semantics). With
    ``exact=True`` (default) the result is EXACTLY the semi join — the
    bloom only decides how much data reaches it; ``exact=False`` skips
    the mop-up join and admits the bloom's false positives (~0.1% at
    the defaults for 10k keys), the right trade when the consumer is a
    gate that tolerates overshoot (e.g. "candidate" generation).

    ``m_bits`` must be a power of two in [64, 2^30]; sizing rule of
    thumb: ``m_bits ≈ 10 × |distinct keys|`` for ~1% fpr at 3 hashes.
    """
    if m_bits < _W or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= {_W}, got {m_bits}")
    if not 1 <= n_hashes <= 8:
        raise ValueError(f"n_hashes must be in [1, 8], got {n_hashes}")
    small_key = small_key or big_key
    if big_key not in big.columns:
        raise ValueError(
            f"big_key {big_key!r} not in big frame columns {big.columns}"
        )
    if small_key not in small.columns:
        raise ValueError(
            f"small_key {small_key!r} not in small frame columns "
            f"{small.columns}"
        )
    # xxhash64 is TYPE-sensitive (int 7 and bigint 7 hash differently)
    # while the mop-up equi-join coerces — mismatched key types would
    # make the probe drop every true match. Canonicalize both hash
    # inputs to a common type, or refuse loudly.
    bt, st = dict(big.dtypes)[big_key], dict(small.dtypes)[small_key]
    integral = {"tinyint", "smallint", "int", "bigint"}
    if bt == st:
        cast_to = None
    elif bt in integral and st in integral:
        cast_to = "bigint"
    elif {bt, st} <= {"float", "double"}:
        cast_to = "double"
    else:
        raise ValueError(
            f"key types differ ({big_key}: {bt} vs {small_key}: {st}) and "
            "have no safe common hash type — cast one side explicitly"
        )

    def hash_input(col: Column) -> Column:
        return col.cast(cast_to) if cast_to else col

    keys = small.select(F.col(small_key).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct()
    pos_rows = keys.select(
        F.explode(
            F.array(*_positions(hash_input(F.col("_k")), m_bits, n_hashes))
        ).alias("_p")
    ).distinct()
    # metadata-sized by assumption (see module docstring): at most
    # |keys| × n_hashes distinct positions come back
    bitmap = [0] * (m_bits // _W)
    for row in pos_rows.collect():
        p = int(row["_p"])
        bitmap[p // _W] |= 1 << (p % _W)
    # a word with bit 63 set exceeds the signed-long range F.lit ships
    # over py4j — reinterpret as two's complement (the JVM-side bit
    # pattern is identical, and arithmetic shiftright still lands the
    # probed bit at position 0)
    lit_map = F.array(
        *[F.lit(w - (1 << _W) if w >= 1 << (_W - 1) else w) for w in bitmap]
    )

    # the probe needs a variable shift amount, which the PySpark
    # shiftright() binding does not take (int only) — stage the bit
    # positions and the literal bitmap as temp columns and do the word
    # indexing + shift in SQL expr (still whole-stage codegen, no UDF)
    pos_cols = _positions(hash_input(F.col(big_key)), m_bits, n_hashes)
    staged = big.withColumns(
        {"_bf_map": lit_map}
        | {f"_bf_p{i}": p for i, p in enumerate(pos_cols)}
    )
    probe = F.col(big_key).isNotNull()
    for i in range(n_hashes):
        probe = probe & F.expr(
            f"(shiftright(element_at(_bf_map, cast(_bf_p{i} / {_W} as int)"
            f" + 1), cast(_bf_p{i} % {_W} as int)) & 1) = 1"
        )
    pruned = staged.filter(probe).drop(
        "_bf_map", *[f"_bf_p{i}" for i in range(n_hashes)]
    )
    if not exact:
        return pruned
    return pruned.join(
        F.broadcast(keys),
        pruned[big_key] == keys["_k"],
        "left_semi",
    )
