"""As-of (bracketing) joins — SURVEY §2.3 J1.

The reference's 1-D snap-to-grid (kamodo_dask.py:194-206) and the per-axis
bracket search inside its interpolator (kamodo_dask.py:335-338) are as-of
joins. Implemented with the union + window pattern: one shuffle on the join
key, no range-join explosion, skew handled by AQE — the formulation that
survives 100 TB (a naive ``l.ts >= r.ts`` theta join is a broadcast nested
loop; this is a sort within key partitions).

KEYLESS as-of (``on=None``, the per-axis bracket of kamodo_dask.py:335-338
at large axis cardinality) cannot partition by key — a bare global window
would sort everything in ONE task. Instead the union is range-bucketed on
the time axis: the window runs per bucket (parallel), and rows whose
bracket lies in an earlier bucket are patched from a carry relation — the
last right row of each bucket, ≤ ``time_buckets`` rows computed once and
broadcast back. No single-partition Exchange anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T


def _valid_ts(col: Column, dtype: str) -> Column:
    """A timestamp value that defines a bracket position: non-NULL, and on
    float axes non-NaN too — Spark sorts NaN GREATER than every double, so
    an unguarded NaN would win every forward sort / ``max_by`` carry and
    ghost-fill real matches (pandas ``merge_asof`` refuses NaN keys)."""
    ok = col.isNotNull()
    if dtype in ("double", "float"):
        ok = ok & ~F.isnan(col)
    return ok


def _driver_epoch_micros(v, tz: str = "UTC") -> int:
    """Epoch µs of a driver-side datetime-like (or ISO string): naive
    values are localized in ``tz`` — the SPARK SESSION time zone of the
    caller. These values are compared against ``unix_micros(ts)``, the
    TRUE UTC epoch of stored instants, so naive wall-clock parameters must
    be read in the same zone that relates the data's wall-clock to its
    instants: the session tz (pinned UTC by ``get_spark``). System-local
    ``datetime.timestamp()`` semantics — correct for ``collect()`` output,
    which Spark renders in SYSTEM tz (see
    ``grid/interpolate._driver_epoch_seconds``) — would shift every slot
    by the host's tz offset on a non-UTC driver."""
    import numbers

    import pandas as pd

    if isinstance(v, numbers.Number):
        # pd.Timestamp(1700000000) silently means epoch NANOseconds (≈1970)
        # — a loud failure beats a wrongly-anchored grid. Numeric axes never
        # reach this helper; timestamp axes demand a datetime-like.
        raise TypeError(
            f"timestamp-axis parameter must be a datetime-like or ISO "
            f"string, got {type(v).__name__} {v!r} (for epoch seconds, "
            f"pass pd.Timestamp(v, unit='s', tz='UTC') explicitly)"
        )
    ts = pd.Timestamp(v)
    if ts.tzinfo is None:
        ts = ts.tz_localize(tz)
    return int(ts.value // 1_000)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_matched",
    tolerance=None,
    time_buckets: int = 32,
    time_range=None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward; ``>=`` and earliest for forward),
    optionally within equality groups ``on``.

    Right payload columns are appended (suffixed on collision), plus
    ``{right_ts}{suffix}`` — the matched timestamp. Left rows with no match
    keep NULLs. ``tolerance`` (same units as the ts columns, or an INTERVAL
    expression for timestamps) nulls out matches farther than that from the
    left timestamp — pandas ``merge_asof(tolerance=...)`` semantics.

    ``time_buckets``/``time_range`` apply only to the keyless path
    (``on=None``): the time axis is split into ``time_buckets`` equal-width
    ranges so the sort parallelizes. ``time_range=(lo, hi)`` (values in the
    right ts column's own type) skips the bounds-probe aggregation — pass it
    when the caller already knows the span (the grid model validates time
    bounds anyway). Left rows with a NULL timestamp get no match in EITHER
    direction (explicitly nulled post-fill — forward's DESC NULLS LAST sort
    would otherwise hand them the earliest right row).
    """
    on = [on] if isinstance(on, str) else list(on or [])
    right_ts = right_ts or left_ts
    # a NULL (or, on double axes, NaN — Spark sorts NaN GREATER than every
    # value, so a NaN-ts row would win the carry/slot max_by and ghost-fill
    # real matches) right timestamp defines no bracket position — drop up
    # front
    ts_type = dict(right.dtypes)[right_ts]
    right = right.filter(_valid_ts(F.col(right_ts), ts_type))
    payload = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_ts = right_ts + suffix
    # fail fast on output-name collisions: an opaque duplicate-column
    # AnalysisException deep in the union/struct plan otherwise (e.g. a
    # previous asof output fed back as the new left already has ts_matched)
    taken = set(left.columns)
    produced = []
    for c in payload:
        if out_names[c] in taken or out_names[c] in produced:
            raise ValueError(
                f"as-of output column {out_names[c]!r} collides — rename "
                f"{c!r} on the right side (or the same name on the left)"
            )
        produced.append(out_names[c])
    if matched_ts in taken or matched_ts in produced:
        raise ValueError(
            f"matched-timestamp column {matched_ts!r} collides with an "
            "existing column — rename it or pass a different suffix"
        )

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(out_names[c]) for c in payload],
        F.lit(None).cast(ts_type).alias(matched_ts),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        *[F.col(c).alias(out_names[c]) for c in payload],
        F.col(right_ts).alias(matched_ts),
    ).select(*l_tagged.columns)  # align column order for unionByName safety

    unioned = l_tagged.unionByName(r_tagged)

    # (_ts, _side) alone is not a total order when several RIGHT rows share a
    # timestamp within a group — last(ignorenulls) would then pick whichever
    # tied row the sort happened to place last, nondeterministically across
    # runs. The payload columns break the tie: repeated runs (and oracle
    # comparisons) always match the same right row — the max payload tuple,
    # mirroring DuckDB ASOF's deterministic pick.
    tiebreak = [F.col(out_names[c]).asc_nulls_first() for c in payload]
    if direction == "backward":
        # right rows (side 0) sort before a left row at the same _ts → ties
        # match "at or before"
        order = [F.col("_ts").asc(), F.col("_side").asc(), *tiebreak]
    elif direction == "forward":
        order = [F.col("_ts").desc(), F.col("_side").asc(), *tiebreak]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    fill_cols = [out_names[c] for c in payload] + [matched_ts]
    # Whole-ROW fill: the matched right row travels as ONE struct (NULL for
    # left rows), so a matched row with NULL payload fields is returned
    # verbatim — per-column last(ignorenulls) would stitch those fields
    # from OLDER right rows, a row pandas merge_asof never produces.
    row_struct = F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in fill_cols]))

    if on:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = (
            unioned.withColumn("_row", row_struct)
            .select(
                *[c for c in left.columns],
                F.col("_side"),
                F.last("_row", ignorenulls=True).over(w).alias("_row"),
            )
            .select(
                *[c for c in left.columns],
                "_side",
                *[F.col(f"_row.{c}").alias(c) for c in fill_cols],
            )
        )
    else:
        filled = _keyless_fill(
            unioned,
            right,
            right_ts,
            left_cols=list(left.columns),
            fill_cols=fill_cols,
            order=order,
            direction=direction,
            n_buckets=max(1, time_buckets),
            time_range=time_range,
        )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    # A NULL left timestamp has no defined bracket — match pandas merge_asof
    # and return NULLs. Backward sorts happen to give this for free (NULLS
    # FIRST precedes every right row); forward orders ``_ts`` DESC NULLS
    # LAST, which would otherwise fill NULL-ts rows with the earliest right
    # row of their partition/bucket — guard explicitly for both directions.
    has_ts = _valid_ts(F.col(left_ts), dict(left.dtypes)[left_ts])
    out = out.select(
        *[c for c in left.columns],
        *[F.when(has_ts, F.col(c)).alias(c) for c in fill_cols],
    )
    if tolerance is not None:
        gap = (
            F.col(left_ts) - F.col(matched_ts)
            if direction == "backward"
            else F.col(matched_ts) - F.col(left_ts)
        )
        within = gap <= tolerance
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(out_names[c])).alias(out_names[c])
                for c in payload
            ],
            F.when(within, F.col(matched_ts)).alias(matched_ts),
        )
    return out


def asof_uniform_grid(
    right: DataFrame,
    start,
    step_seconds: float,
    n_slots: int,
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_matched",
    slot_col: str = "slot",
) -> DataFrame:
    """As-of bracket of a data relation against a UNIFORM time grid
    (``slot_i = start + i·step``) — the dense-grid special case of the
    keyless as-of (the reference's per-axis bracket, kamodo_dask.py:335-338,
    where the probe axis is a regular ``date_range``).

    Plan shape: each right row computes the index of the first (backward) /
    last (forward) slot it can serve — pure arithmetic, map-side — and a
    ``max_by`` hash aggregation reduces the data to ≤ ``n_slots`` candidate
    rows with partial combine. The running as-of fill then runs over the
    GRID relation only: an ``n_slots``-row window (bounded by construction,
    broadcast-joined back). The data-sized relation is scanned once, never
    sorted, never shuffled beyond an ``n_slots``-group aggregation — at
    100 TB this is the plan the general union+window formulation cannot
    reach, because it must sort the data side.

    Returns one row per slot: ``slot_col``, each right payload column, and
    ``{right_ts}{suffix}`` (NULL where no right row brackets the slot).
    Ties on the bracket timestamp pick the max payload tuple — same
    contract as :func:`asof_join`.
    """
    ts_type = dict(right.dtypes)[right_ts]
    session_tz = right.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    t0, step, is_ts = _slot_params(start, step_seconds, ts_type, session_tz)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = [c for c in right.columns if c != right_ts]
    matched_ts = right_ts + suffix
    num = _ts_numeric(F.col(right_ts), ts_type)
    # NULL timestamps have no defined bracket; without this filter
    # greatest/least SKIP the NULL index and assign slot 0 / n_slots-1,
    # turning NULL-ts rows into ghost candidates at the grid edges
    right = right.filter(_valid_ts(F.col(right_ts), ts_type))

    if direction == "backward":
        # first slot at-or-after the row: serves slots i ≥ ceil((ts-t0)/step)
        idx = F.ceil((num - F.lit(t0)) / F.lit(step)).cast("long")
        cand = right.withColumn("_i", F.greatest(F.lit(0), idx)).filter(
            F.col("_i") <= n_slots - 1
        )
        ord_key = F.struct(num.alias("_k"), *[F.col(c).alias(f"_o{i}") for i, c in enumerate(payload)])
        w = Window.orderBy(F.col("_i").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    else:
        # last slot at-or-before the row: serves slots i ≤ floor((ts-t0)/step)
        idx = F.floor((num - F.lit(t0)) / F.lit(step)).cast("long")
        cand = right.withColumn("_i", F.least(F.lit(n_slots - 1), idx)).filter(
            F.col("_i") >= 0
        )
        ord_key = F.struct((-num).alias("_k"), *[F.col(c).alias(f"_o{i}") for i, c in enumerate(payload)])
        w = Window.orderBy(F.col("_i").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )

    best = cand.groupBy("_i").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload], F.col(right_ts).alias(matched_ts)),
            ord_key,
        ).alias("_r")
    )

    grid = _slot_grid(right.sparkSession, t0, step, n_slots, is_ts, ts_type, slot_col)

    # the window below is single-partition BY CONSTRUCTION over n_slots rows
    # (the grid, not the data) — bounded state at any corpus size
    return (
        grid.join(F.broadcast(best), "_i", "left")
        .select(slot_col, F.last("_r", ignorenulls=True).over(w).alias("_r"))
        .select(
            slot_col,
            *[F.col(f"_r.{c}").alias(c) for c in payload],
            F.col(f"_r.{matched_ts}").alias(matched_ts),
        )
    )


def asof_uniform_grid_both(
    right: DataFrame,
    start,
    step_seconds: float,
    n_slots: int,
    right_ts: str = "ts",
    suffixes: tuple[str, str] = ("_b", "_f"),
    slot_col: str = "slot",
) -> DataFrame:
    """BACKWARD and FORWARD uniform-grid as-of brackets from ONE scan of the
    data relation — the both-directions form of :func:`asof_uniform_grid`,
    for interpolation pipelines that need the surrounding bracket pair
    (v0 ≤ slot ≤ v1). Running the single-direction operator twice scans and
    aggregates the data relation twice (or forces a persist to share the
    scan); here each row emits its (direction, slot-index) pair via a 2-array
    explode — still map-side arithmetic — and a single ≤ ``2·n_slots``-group
    ``max_by`` aggregation with map-side partial combine reduces the data in
    one shuffle. No persist, no second scan.

    Returns one row per slot: ``slot_col``, then per right payload column
    ``{c}{suffixes[0]}`` / ``{c}{suffixes[1]}`` and the matched timestamps
    ``{right_ts}_matched{suffixes[0]}`` / ``..{suffixes[1]}`` (NULL where no
    right row brackets the slot on that side). Tie handling matches
    :func:`asof_uniform_grid`: max payload tuple at equal timestamps.
    """
    ts_type = dict(right.dtypes)[right_ts]
    session_tz = right.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    t0, step, is_ts = _slot_params(start, step_seconds, ts_type, session_tz)

    payload = [c for c in right.columns if c != right_ts]
    num = _ts_numeric(F.col(right_ts), ts_type)
    # NULL timestamps have no defined bracket (see asof_uniform_grid)
    right = right.filter(_valid_ts(F.col(right_ts), ts_type))

    # backward: first slot at-or-after the row serves slots i ≥ ceil(...)
    idx_b = F.greatest(F.lit(0), F.ceil((num - F.lit(t0)) / F.lit(step)).cast("long"))
    # forward: last slot at-or-before the row serves slots i ≤ floor(...)
    idx_f = F.least(
        F.lit(n_slots - 1), F.floor((num - F.lit(t0)) / F.lit(step)).cast("long")
    )
    cand = (
        right.select(
            *[F.col(c) for c in right.columns],
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("_dir"), idx_b.alias("_i")),
                    F.struct(F.lit(1).alias("_dir"), idx_f.alias("_i")),
                )
            ).alias("_e"),
        )
        .select(*right.columns, F.col("_e._dir").alias("_dir"), F.col("_e._i").alias("_i"))
        .filter(
            ((F.col("_dir") == 0) & (F.col("_i") <= n_slots - 1))
            | ((F.col("_dir") == 1) & (F.col("_i") >= 0))
        )
    )
    # window-order key per direction: backward = latest ts wins, forward =
    # earliest ts wins; payload breaks timestamp ties (catalog convention)
    ord_key = F.struct(
        F.when(F.col("_dir") == 0, num).otherwise(-num).alias("_k"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(payload)],
    )
    row_struct = F.struct(
        *[F.col(c) for c in payload], F.col(right_ts).alias("_mts")
    )
    best = cand.groupBy("_i", "_dir").agg(F.max_by(row_struct, ord_key).alias("_r"))
    # pivot the two directions into one row per slot index (max over a
    # single non-null struct per group — the other direction's rows are null)
    merged = best.groupBy("_i").agg(
        F.max(F.when(F.col("_dir") == 0, F.col("_r"))).alias("_rb"),
        F.max(F.when(F.col("_dir") == 1, F.col("_r"))).alias("_rf"),
    )

    grid = _slot_grid(right.sparkSession, t0, step, n_slots, is_ts, ts_type, slot_col)

    # both windows below are single-partition BY CONSTRUCTION over n_slots
    # rows (the grid, not the data) — bounded state at any corpus size
    w_b = Window.orderBy(F.col("_i").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_f = Window.orderBy(F.col("_i").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sb, sf_ = suffixes
    return (
        grid.join(F.broadcast(merged), "_i", "left")
        .select(
            slot_col,
            F.last("_rb", ignorenulls=True).over(w_b).alias("_rb"),
            F.last("_rf", ignorenulls=True).over(w_f).alias("_rf"),
        )
        .select(
            slot_col,
            *[F.col(f"_rb.{c}").alias(f"{c}{sb}") for c in payload],
            F.col("_rb._mts").alias(f"{right_ts}_matched{sb}"),
            *[F.col(f"_rf.{c}").alias(f"{c}{sf_}") for c in payload],
            F.col("_rf._mts").alias(f"{right_ts}_matched{sf_}"),
        )
    )


def _ts_numeric(col, dtype: str):
    """Monotone numeric image of a time-ish column, for range bucketing."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("double")


def _slot_params(start, step_seconds: float, ts_type: str, tz: str = "UTC"):
    """(t0, step, is_ts) in the axis's numeric image — µs integers for
    timestamp axes, doubles otherwise. Shared by the single- and
    dual-direction uniform-grid forms so slot arithmetic stays in lockstep.
    ``tz`` is the session time zone, used to localize naive ``start``."""
    if ts_type.startswith("timestamp"):
        return (
            _driver_epoch_micros(start, tz),
            int(round(step_seconds * 1_000_000)),
            True,
        )
    return float(start), float(step_seconds), False


def _slot_grid(spark, t0, step, n_slots: int, is_ts: bool, ts_type: str, slot_col: str):
    """The n_slots-row grid relation (``_i``, slot value) both uniform-grid
    forms join their candidates back onto."""
    if is_ts:
        slot_expr = F.expr(f"timestamp_micros({t0} + id * {step})")
    else:
        slot_expr = (F.lit(t0) + F.col("id") * F.lit(step)).cast(ts_type)
    return spark.range(n_slots).select(F.col("id").alias("_i"), slot_expr.alias(slot_col))


def _keyless_fill(
    unioned: DataFrame,
    right: DataFrame,
    right_ts: str,
    left_cols: list[str],
    fill_cols: list[str],
    order,
    direction: str,
    n_buckets: int,
    time_range,
) -> DataFrame:
    """Range-bucketed window fill for the keyless as-of.

    1. Bucket bounds come from ``time_range`` or one (min, max) aggregation
       over the RIGHT timestamps only — left rows outside the right span
       clamp to the edge buckets, which preserves semantics (below-min rows
       precede every right row in bucket 0 → NULL; above-max rows land after
       every right row in the last bucket → match the global last).
    2. The as-of window runs per bucket — ``n_buckets``-way parallel sort
       instead of one global task.
    3. A left row whose bracket lies in an EARLIER bucket (its own bucket
       has no right row on the required side) is patched from the carry
       relation: the per-bucket last right row in window order, computed as
       a ``max_by`` hash aggregation (map-side partial combine — no second
       sort of the right side), ≤ ``n_buckets`` rows collected to the
       driver, cumulated in plain Python, and broadcast back. Both the
       carry patch AND the in-bucket fill apply the WHOLE matched row as a
       struct (pandas ``merge_asof`` semantics — NULL payload fields of the
       matched row are returned verbatim, never stitched from older rows).

    The plan contains no single-partition Exchange: the only wide exchange
    hashes on ``_bkt``, and the carry join is a broadcast of metadata-sized
    rows.
    """
    spark = unioned.sparkSession
    ts_type = dict(right.dtypes)[right_ts]
    num = _ts_numeric(F.col("_ts"), ts_type)

    if time_range is not None:
        if ts_type.startswith("timestamp"):
            tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
            lo, hi = (_driver_epoch_micros(v, tz) for v in time_range)
        else:
            lo, hi = (float(v) for v in time_range)
    else:
        row = right.agg(
            F.min(_ts_numeric(F.col(right_ts), ts_type)).alias("lo"),
            F.max(_ts_numeric(F.col(right_ts), ts_type)).alias("hi"),
        ).first()
        lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or hi <= lo:
        n_buckets, lo, width = 1, 0, 1.0
    else:
        width = (hi - lo) / n_buckets

    bkt = F.floor((num - F.lit(lo)) / F.lit(width))
    bkt = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), bkt)).cast("int")
    b = unioned.withColumn("_bkt", F.coalesce(bkt, F.lit(0)))

    w = (
        Window.partitionBy("_bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # whole-row struct fill — same rationale as the keyed path: the matched
    # right row is returned verbatim, NULL payload fields included
    row_struct = F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in fill_cols]))
    filled = (
        b.withColumn("_row", row_struct)
        .select(
            *left_cols,
            F.col("_side"),
            F.col("_bkt"),
            F.last("_row", ignorenulls=True).over(w).alias("_row"),
        )
        .select(
            *left_cols,
            "_side",
            "_bkt",
            *[F.col(f"_row.{c}").alias(c) for c in fill_cols],
        )
    )

    # carry: per-bucket last right row in window order, computed as a hash
    # aggregation (max_by over the order key — map-side partial combine, a
    # ≤ n_buckets-row shuffle) rather than a window + row_number pass, which
    # would re-sort every right row. The order key mirrors the window sort:
    # backward = max (ts, payload...), forward = min ts / max payload at
    # ties — expressed as max over (-ts, payload...) via the numeric image.
    key = num if direction == "backward" else -num
    ord_key = F.struct(
        key.alias("_k"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(fill_cols[:-1])],
    )
    rlast = (
        b.filter(F.col("_side") == 0)
        .groupBy("_bkt")
        .agg(F.max_by(F.struct(*fill_cols), ord_key).alias("_r"))
        .select("_bkt", "_r.*")
        .collect()
    )
    by_bucket = {r["_bkt"]: r for r in rlast}
    seq = range(n_buckets) if direction == "backward" else range(n_buckets - 1, -1, -1)
    carry_rows, prev = [], None
    for bb in seq:
        if prev is not None:
            carry_rows.append((bb, *[prev[c] for c in fill_cols]))
        if bb in by_bucket:
            prev = by_bucket[bb]

    ufields = {f.name: f for f in b.schema.fields}
    carry_schema = T.StructType(
        [T.StructField("_bkt", T.IntegerType(), False)]
        + [T.StructField("_carry_" + c, ufields[c].dataType, True) for c in fill_cols]
    )
    carry = spark.createDataFrame(carry_rows, carry_schema)

    matched_ts = fill_cols[-1]
    use_carry = F.col(matched_ts).isNull()
    return (
        filled.join(F.broadcast(carry), "_bkt", "left")
        .select(
            *left_cols,
            F.col("_side"),
            *[
                F.when(use_carry, F.col("_carry_" + c)).otherwise(F.col(c)).alias(c)
                for c in fill_cols
            ],
        )
    )
