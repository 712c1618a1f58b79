"""Deterministic sampling & splitting for training-data pipelines.

Splits must be a pure function of the row key — reproducible across runs,
engines, and cluster sizes (``rand()`` is none of those). The bucket is an
md5-derived integer, so the DuckDB oracle reproduces assignments exactly and
a re-run on different hardware yields the same split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Bucket space for split assignment; 10k buckets → 0.01% weight granularity.
_BUCKETS = 10_000


def split_bucket(col, salt: str = "") -> Column:
    """Deterministic bucket in [0, 10000) from a key column (md5-derived).

    COMPOSITION HAZARD — every operator in this module derives its
    threshold from this same hash, so two unsalted operators applied to the
    same key are perfectly correlated, not independent:
    ``deterministic_sample(df, k, 0.2)`` keeps exactly buckets < 2000, and
    a subsequent ``hash_split(sample, k, {"train": .8, "test": .2})``
    assigns every survivor to train — the test split is silently EMPTY.
    Pass a distinct ``salt`` per purpose (mixed into the md5 input) to
    decorrelate stages; the default stays unsalted because each catalog
    oracle reproduces the unsalted spelling.
    """
    c = col if isinstance(col, Column) else F.col(col)
    seeded = F.concat(F.lit(f"{salt}|"), c.cast("string")) if salt else c.cast("string")
    return (
        F.conv(F.substring(F.md5(seeded), 1, 8), 16, 10).cast("bigint")
        % _BUCKETS
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign each row to a named split by hashed key.

    ``weights`` maps split name → fraction (must sum to ~1). Assignment is
    per-key: the same key always lands in the same split, so a document and
    all its derived rows co-travel — the property random sampling lacks.
    Zero shuffles: a pure projection.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = split_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows by hashed key — the
    repeatable alternative to ``df.sample()`` (stable under retries,
    re-runs, and engine changes). Pass a ``salt`` when composing with any
    other operator in this module on the same key (see
    :func:`split_bucket`'s composition hazard)."""
    return df.filter(
        split_bucket(F.col(key_col), salt) < int(round(fraction * _BUCKETS))
    )


def weighted_mixture(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Dataset MIXING: keep a per-source fraction of rows ("100% en, 50%
    de, 25% fr...") with deterministic hash-threshold acceptance — the
    reproducible form of the weighted-mixture sampling every multi-source
    training pipeline runs before tokenization. A pure projection+filter:
    zero shuffles, engine-portable (the md5 bucket reproduces in SQL), and
    stable under retries/cluster resizes, unlike ``df.sample`` weights.

    ``rates`` maps stratum value → acceptance fraction in [0, 1]; strata
    not listed keep ``default_rate``. Upsampling (rate > 1) is out of
    scope — repeat-epoch logic belongs to the training loader, not the
    corpus relation.
    """
    for name, rate in {**rates, "default_rate": default_rate}.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1], got {rate}")
    bucket = split_bucket(F.col(key_col), salt)
    thr = None
    for name, rate in rates.items():
        cond = F.col(stratum_col) == name
        t = int(round(rate * _BUCKETS))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    default_t = int(round(default_rate * _BUCKETS))
    thr = F.lit(default_t) if thr is None else thr.otherwise(default_t)
    return df.filter(bucket < thr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hashed-key
    order — deterministic across runs and engines (domain-mix curation:
    "at most k documents per source/language").

    One shuffle, partitioned by stratum. Strata are assumed numerous
    relative to executors and individually heap-sized IN RANK TERMS only —
    ``row_number`` streams each stratum, holding one row of state, so a
    billion-row stratum costs sort-spill, not memory. For few/huge strata
    at 100 TB, pre-filter with ``deterministic_sample`` (zero-shuffle) to
    ~10·k expected survivors per stratum, then rank exactly."""
    from pyspark.sql import Window

    rank_key = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
