"""As-of (bracketing) joins — SURVEY §2.3 J1.

The reference's 1-D snap-to-grid (kamodo_dask.py:194-206) and the per-axis
bracket search inside its interpolator (kamodo_dask.py:335-338) are as-of
joins. Implemented with the union + window pattern: one shuffle on the join
key, no range-join explosion, skew handled by AQE — the formulation that
survives 100 TB (a naive ``l.ts >= r.ts`` theta join is a broadcast nested
loop; this is a sort within key partitions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    suffix: str = "_matched",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward; ``>=`` and earliest for forward),
    optionally within equality groups ``on``.

    Right payload columns are appended (suffixed on collision), plus
    ``{right_ts}{suffix}`` — the matched timestamp. Left rows with no match
    keep NULLs. ``tolerance`` (same units as the ts columns, or an INTERVAL
    expression for timestamps) nulls out matches farther than that from the
    left timestamp — pandas ``merge_asof(tolerance=...)`` semantics.
    """
    on = [on] if isinstance(on, str) else list(on or [])
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in on and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in payload}
    matched_ts = right_ts + suffix

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(out_names[c]) for c in payload],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(matched_ts),
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
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc(), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc(), *tiebreak)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    filled = unioned.select(
        *[c for c in left.columns],
        F.col("_side"),
        *[
            F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c])
            for c in payload
        ],
        F.last(matched_ts, ignorenulls=True).over(w).alias(matched_ts),
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
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
