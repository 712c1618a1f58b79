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


def seeded_md5(col, salt: str = "") -> Column:
    """md5 of the stringified key, optionally prefixed ``{salt}|`` — the
    ONE seeding spelling every operator in this module (and its DuckDB
    oracles) must share; see :func:`split_bucket`'s composition hazard."""
    c = col if isinstance(col, Column) else F.col(col)
    seeded = F.concat(F.lit(f"{salt}|"), c.cast("string")) if salt else c.cast("string")
    return F.md5(seeded)


def md5_prefix_bucket(md5_col: Column, modulus: int) -> Column:
    """First 8 hex chars of an md5 → bigint in [0, modulus) — the
    engine-portable bucket parse (DuckDB: ``('0x' || substr(md5, 1,
    8))::BIGINT % modulus``)."""
    return F.conv(F.substring(md5_col, 1, 8), 16, 10).cast("bigint") % modulus


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
    return md5_prefix_bucket(seeded_md5(col, salt), _BUCKETS)


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


def token_budget_mixture(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    token_count_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    salt: str = "",
) -> DataFrame:
    """Dataset mixing by per-source TOKEN budget — the recipe real
    pretraining mixes specify (Dolma/Pile style: "500B tokens of web, 30B
    of code, ..."), where :func:`weighted_mixture`'s row fractions are the
    wrong unit because sources differ wildly in document length.

    ``budgets`` maps stratum value → token budget (absolute count); strata
    not listed get ``default_budget``. The acceptance rate per stratum is
    ``min(1, budget / total_tokens(stratum))`` — hash-threshold acceptance
    then keeps an expected ``budget`` tokens per source, deterministically
    (same keys accepted on every run, engine, and cluster size). The
    threshold uses pure INTEGER arithmetic, ``min(BUCKETS, budget *
    BUCKETS // total)``, so SQL oracles reproduce it bit-exactly with no
    float-rounding portability hazard (banker's vs half-up).

    100 TB design: pass 1 is one partial-combined aggregation to per-source
    token totals — a relation of ``n_sources`` rows (metadata-sized by
    construction: a mixture recipe names at most dozens of sources), which
    is the ONE documented driver-side collect; pass 2 inlines the
    thresholds as a CASE literal, so the acceptance scan is a zero-shuffle
    projection+filter exactly like :func:`weighted_mixture`. Token counts
    come in as a column (whitespace, BPE via ``operators/bpe.py``, or any
    tokenizer), so the budget unit matches whatever the training loader
    counts.
    """
    for name, b in {**budgets, "default_budget": default_budget}.items():
        if b < 0:
            raise ValueError(f"budget for {name!r} must be >= 0, got {b}")
    n_tok = F.col(token_count_col).cast("bigint")
    totals = {
        row["stratum"]: row["total"]
        for row in df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.sum(n_tok).alias("total"))
        .collect()  # metadata-sized: one row per source (see docstring)
    }

    def _thr(stratum: str) -> int:
        total = totals.get(stratum, 0)
        budget = budgets.get(stratum, default_budget)
        if total is None or total <= 0:
            return 0
        return min(_BUCKETS, budget * _BUCKETS // total)

    bucket = split_bucket(F.col(key_col), salt)
    thr = None
    for name in budgets:
        cond = F.col(stratum_col) == name
        t = _thr(name)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    # unlisted strata each get their own default-budget threshold (their
    # totals differ, so this cannot fold into one literal)
    for name, total in sorted(totals.items(), key=lambda kv: str(kv[0])):
        if name in budgets or name is None:
            continue
        cond = F.col(stratum_col) == name
        t = _thr(name)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = F.lit(0) if thr is None else thr.otherwise(0)
    return df.filter(bucket < thr)


def upsampled_token_mixture(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    token_count_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    max_repeats: int = 16,
    salt: str = "",
) -> DataFrame:
    """Token-budget mixing WITH upsampling: where
    :func:`token_budget_mixture` clamps an over-budget source to
    keep-everything, this emits each document ``epoch`` times so every
    source contributes ~its token budget even when the budget exceeds the
    source's total — the repeat-epochs half of a real pretraining recipe
    ("2 epochs of wiki, 0.3 epochs of web").

    The target repeat rate is ``budget / total_tokens(stratum)`` held as
    an exact integer number of ten-thousandths (``rate_bp = budget *
    BUCKETS // total``). Each document gets ``rate_bp // BUCKETS`` whole
    epochs, plus one more iff its md5 bucket falls under ``rate_bp %
    BUCKETS`` — so expected tokens per source ≈ budget, membership and
    epoch counts are pure functions of the key (reproducible across runs/
    engines/cluster sizes), and a rate < 1 degrades to exactly
    :func:`token_budget_mixture`'s subsampling. ``max_repeats`` guards
    against a mis-specified recipe replicating a tiny source into a blowup
    (a 100 TB safety rail, not a semantic knob).

    Output: the input columns plus ``epoch`` (1-based). Same two-pass
    shape as :func:`token_budget_mixture`: metadata-sized totals collect,
    then one zero-shuffle scan — the fan-out is a row-local
    ``explode(sequence(...))``, no join, no shuffle.
    """
    for name, b in {**budgets, "default_budget": default_budget}.items():
        if b < 0:
            raise ValueError(f"budget for {name!r} must be >= 0, got {b}")
    if max_repeats < 1:
        raise ValueError(f"max_repeats must be >= 1, got {max_repeats}")
    n_tok = F.col(token_count_col).cast("bigint")
    totals = {
        row["stratum"]: row["total"]
        for row in df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.sum(n_tok).alias("total"))
        .collect()  # metadata-sized: one row per source (see docstring)
    }

    def _rate_bp(stratum: str) -> int:
        total = totals.get(stratum, 0)
        budget = budgets.get(stratum, default_budget)
        if total is None or total <= 0:
            return 0
        return min(max_repeats * _BUCKETS, budget * _BUCKETS // total)

    rate = None
    for name in sorted(totals, key=str):
        if name is None:
            continue
        cond = F.col(stratum_col) == name
        r = _rate_bp(name)
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(0) if rate is None else rate.otherwise(0)
    bucket = split_bucket(F.col(key_col), salt)
    # rate/_BUCKETS is IEEE-exact whenever the true quotient is an integer
    # (both operands convert exactly; the correctly-rounded quotient of an
    # exact ratio IS that integer), so the floor cannot off-by-one
    repeats = F.floor(rate / _BUCKETS).cast("bigint") + (
        bucket < rate % _BUCKETS
    ).cast("bigint")
    return (
        df.withColumn("_n_epochs", repeats)
        .filter(F.col("_n_epochs") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("_n_epochs"))),
        )
        .drop("_n_epochs")
    )


def curriculum_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Assign each row a rank-quantile bucket of ``score_col`` in
    ``[0, n_buckets)`` — the binning step of curriculum/quality-stratified
    data recipes ("sample the top quality decile at 100%, the bottom at
    10%"). Compose with :func:`weighted_mixture` on the bucket column for
    the acceptance half.

    Semantics: ``bucket(s) = count(rows with score < s) * n_buckets DIV
    count(*)`` — EQUAL scores always share a bucket (deterministic with no
    tie-break hash, reproducible across engines/runs/cluster sizes), so
    bucket sizes are equal only up to tie mass; that is the honest
    contract for a corpus-derived score. All arithmetic is integer
    (``DIV``), so SQL oracles reproduce assignments bit-exactly.

    100 TB design: one partial-combined aggregation to per-distinct-score
    counts, a cumulative window over THAT relation (its size is the score
    cardinality — integer lengths / rounded quality scores, orders of
    magnitude below corpus size; round continuous scores first, which real
    curricula do anyway), and a broadcast join back. The corpus relation
    is scanned once and never shuffles; no driver-side collect anywhere.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    s = F.col(score_col)
    # NULL scores get a NULL bucket (no match below) rather than riding an
    # engine-specific NULL sort position (Spark NULLS FIRST vs DuckDB LAST)
    counts = (
        df.filter(s.isNotNull())
        .groupBy(s.alias("_cb_score"))
        .agg(F.count("*").alias("_cb_c"))
    )
    # single-partition window over the DISTINCT-SCORE relation only (score
    # cardinality ≪ corpus by contract) — the corpus itself never sorts
    w = Window.orderBy("_cb_score").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "_cb_score",
        F.coalesce(F.sum("_cb_c").over(w), F.lit(0)).alias("_cb_lt"),
        F.sum("_cb_c").over(
            Window.orderBy("_cb_score").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_cb_n"),
    )
    out = df.join(
        F.broadcast(cum), on=s == F.col("_cb_score"), how="left"
    ).withColumn(
        bucket_col,
        F.expr(f"CAST((_cb_lt * {int(n_buckets)}) DIV _cb_n AS BIGINT)"),
    )
    return out.drop("_cb_score", "_cb_lt", "_cb_n")


def pack_sequences(
    df: DataFrame,
    key_col: str,
    token_count_col: str,
    seq_len: int,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Training-SEQUENCE PACKING: lay every document's token stream end to
    end in a deterministic order and cut the concatenation into fixed
    ``seq_len``-token training sequences — the GPT-style
    concat-and-chunk packing step between tokenization and batching.

    Sequences are scoped **per shard**: each row is assigned to one of
    ``n_shards`` streams by md5 bucket of its key, documents are laid out
    within their shard in md5-rank order, and a sequence id is the pair
    ``(shard, first_seq)``. Per-shard scoping is the scale design — a
    single global stream would need a global sort plus a global running
    sum (one task finishes last no matter the cluster), while shards give
    ONE hash shuffle and an embarrassingly parallel per-partition running
    sum; ``n_shards`` scales with the cluster, and shard streams are
    consumed independently by data loaders. Everything is a pure function
    of the keys, so retries, re-runs, and engine ports produce identical
    layouts (the DuckDB oracle reproduces every offset exactly).

    Rows with a non-positive token count are dropped — an empty document
    occupies no tokens in the stream and would otherwise produce a
    degenerate ``last_seq < first_seq`` row.

    Returns the input's key plus ``shard``, ``n_tokens``, ``token_offset``
    (position of the document's first token within its shard stream),
    ``first_seq`` and ``last_seq`` (the range of ``seq_len``-token
    training sequences the document's tokens land in; a document longer
    than ``seq_len`` spans several).
    """
    from pyspark.sql import Window

    if seq_len < 1:
        raise ValueError(f"seq_len must be ≥ 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be ≥ 1, got {n_shards}")
    rank_key = seeded_md5(F.col(key_col), salt)
    shard = md5_prefix_bucket(rank_key, n_shards)
    n_tok = F.col(token_count_col).cast("bigint")
    staged = (
        df.filter(n_tok > 0)
        .select(
            F.col(key_col),
            n_tok.alias("n_tokens"),
            shard.alias("shard"),
            rank_key.alias("_rk"),
        )
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_rk", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        staged.withColumn("_cum", cum)
        .select(
            key_col,
            "shard",
            "n_tokens",
            (F.col("_cum") - F.col("n_tokens")).alias("token_offset"),
            F.expr(f"(_cum - n_tokens) DIV {seq_len}").alias("first_seq"),
            F.expr(f"(_cum - 1) DIV {seq_len}").alias("last_seq"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    salt: str = "",
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

    # the module's ONE seeding spelling (see split_bucket's composition
    # hazard): pass a salt when composing with deterministic_sample /
    # hash_split on the same key so the rank order decorrelates
    rank_key = seeded_md5(F.col(key_col), salt)
    w = Window.partitionBy(stratum_col).orderBy(rank_key, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _es_identity(
    key_col: str, extra_cols: "list[str] | None"
) -> Column:
    """The row-identity expression the A-ES samplers hash: the key column
    alone, or ``concat_ws('|', key, *extra_cols)`` when the key does not
    uniquely identify rows (DuckDB spelling:
    ``md5(key || '|' || extra || ...)`` — concat_ws skips NULLs
    identically in both engines, so keep the identity columns
    non-null)."""
    if not extra_cols:
        return F.col(key_col)
    return F.concat_ws(
        "|", F.col(key_col).cast("string"),
        *[F.col(c).cast("string") for c in extra_cols],
    )


def _check_identity_unique(
    df: DataFrame, key_col: str, extra_cols: "list[str] | None"
) -> None:
    """One aggregation job proving (key [+ extras]) is row-unique —
    the guard behind ``validate_unique`` (the scd2 delta-dup shape:
    NULL-safe via groupBy, max group size vs 1)."""
    cols = [key_col, *(extra_cols or [])]
    row = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("_n"))
        .agg(F.max("_n").alias("mx"), F.sum("_n").alias("n"))
        .first()
    )
    if row["mx"] is not None and row["mx"] > 1:
        raise ValueError(
            f"sampling identity {cols} does not uniquely identify rows "
            f"({row['n']} rows over fewer identities) — duplicate "
            "identities draw perfectly correlated u values and make the "
            "cutoff nondeterministic; pass extra_cols that complete the "
            "row identity"
        )


def _es_rank(
    weight_col: str,
    key_col: str,
    salt: str,
    round_digits: int,
    extra_cols: "list[str] | None",
) -> "tuple[Column, Column, list[Column]]":
    """The ONE A-ES rank spelling both weighted samplers share (and
    their DuckDB oracles reproduce): ``(weight, rounded ln(u)/w,
    tie-break columns)`` with u md5-derived from the row identity —
    u in (0,1) as a 32-bit md5 prefix + 0.5 over 2^32, never exactly
    0/1. Any change here diverges the global and stratified samplers
    from each other AND from the shared oracle spelling — change all
    three together or not at all."""
    w = F.col(weight_col).cast("double")
    ident = _es_identity(key_col, extra_cols)
    u = (
        md5_prefix_bucket(seeded_md5(ident, salt), 1 << 32)
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    es_key = F.round(F.log(u) / w, round_digits)
    tie = [F.col(key_col), *[F.col(c) for c in (extra_cols or [])]]
    return w, es_key, tie


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    salt: str = "",
    round_digits: int = 6,
    extra_cols: "list[str] | None" = None,
    validate_unique: bool = False,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, one pass —
    Efraimidis–Spirakis A-ES (2006): rank every row by
    ``ln(u) / w`` (u uniform in (0,1), w the row's weight) and keep the
    top ``k``; the selection distribution is exactly sequential
    weighted draws without replacement. This is the distributed-sampling
    primitive (Spark's own ``sampleBy`` is per-stratum Bernoulli WITH
    replacement semantics and RNG-seeded — neither reproducible across
    engines nor without-replacement).

    Determinism: u is md5-derived from the key (this module's ONE
    seeding spelling — salt to decorrelate from other stages), so the
    sample is a pure function of (keys, weights, salt) — re-runs,
    engines, and cluster sizes agree. The rank key is ROUNDED and
    ties break by key, pinning the cutoff cross-engine.

    REQUIREMENT: ``key_col`` (together with ``extra_cols`` when given)
    must uniquely identify rows. Duplicate identities draw the SAME u —
    their inclusion is perfectly correlated, not independent — and tie
    on the (es, key) sort tuple, so which duplicate survives the
    ``limit(k)`` cutoff is nondeterministic (r8 ADVICE #2). When the
    natural key repeats, pass ``extra_cols`` to complete the identity
    (mixed into both the hash and the tie-break); set
    ``validate_unique=True`` to prove uniqueness with one extra
    aggregation job before sampling.

    Rows with NULL, zero, or negative weights are excluded (zero weight
    = never sampled; ES is undefined for w <= 0). 100 TB shape:
    one row-local projection + a global top-k as
    ``TakeOrderedAndProject`` (per-partition heaps of k, no sort, no
    shuffle beyond k·partitions rows).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if validate_unique:
        _check_identity_unique(df, key_col, extra_cols)
    w, es_key, tie = _es_rank(
        weight_col, key_col, salt, round_digits, extra_cols
    )
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_es", es_key)
        .orderBy(F.col("_es").desc(), *tie)
        .limit(k)
        .drop("_es")
    )


def weighted_sample_stratified(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    key_col: str,
    k: int,
    salt: str = "",
    round_digits: int = 6,
    extra_cols: "list[str] | None" = None,
    validate_unique: bool = False,
) -> DataFrame:
    """Weighted sampling without replacement, ``k`` items PER STRATUM —
    :func:`weighted_sample` generalized from one global top-k to an A-ES
    rank within every group (r8 verdict ask #6): real mixture curation
    samples per source/language/domain, not globally, and composes with
    ``token_budget_mixture``'s per-source budgets.

    Same Efraimidis–Spirakis key as the global sampler — ``round(ln(u) /
    w, round_digits)`` with u md5-derived from the row identity (the
    module's ONE seeding spelling; same uniqueness REQUIREMENT and
    ``extra_cols``/``validate_unique`` escape hatches as
    :func:`weighted_sample`) — so within each stratum the selection is
    exactly sequential weighted draws without replacement, and the whole
    sample is a pure function of (strata, keys, weights, salt). Rows
    with NULL/zero/negative weights are excluded. Ties on the rounded
    key break by (key, extras), pinning every stratum's cutoff
    cross-engine.

    100 TB shape: one row-local projection + ONE hash shuffle on the
    stratum + a streaming per-stratum ``row_number`` (rank state is one
    row; a billion-row stratum costs sort-spill, not memory) — the
    :func:`stratified_sample` plan with the ES ordering. Strata are
    assumed numerous relative to executors; for few/huge strata
    pre-thin with :func:`deterministic_sample` first (the same guidance
    as the unweighted ranker).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if validate_unique:
        _check_identity_unique(df, key_col, extra_cols)
    w, es_key, tie = _es_rank(
        weight_col, key_col, salt, round_digits, extra_cols
    )
    win = Window.partitionBy(stratum_col).orderBy(F.desc("_es"), *tie)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("_es", es_key)
        .withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_es", "_rn")
    )
