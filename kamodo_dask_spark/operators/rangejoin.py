"""Interval (range) joins without nested-loop plans.

``point BETWEEN start AND end`` as a raw theta join plans as a broadcast
nested loop — O(N·M), dead at scale. The bucketed formulation turns it into
an equi-join: bucket points by ``floor(x/width)``, explode each interval to
every bucket it overlaps, equi-join on (keys…, bucket), then refine with the
exact predicate. Each point lives in exactly one bucket and an interval
covers a bucket at most once, so no dedup is needed. Bucket width should be
on the order of the typical interval length (wider → more refine work,
narrower → more interval replication).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | str | None = None,
    bucket_width: float | int = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (and equal ``on`` keys), via bucketed equi-join.

    ``point_col``/``start_col``/``end_col`` must be numeric (for timestamps
    pass ``unix_micros`` values — integer µs keeps boundary comparisons
    exact). Output: point columns + interval columns (caller ensures
    disjoint names).

    ``how``: ``inner`` (default) or ``left`` (points matching no interval
    survive with NULL interval columns). Right/full outer are rejected —
    the exact-predicate refine runs AFTER the bucketed join, so an outer
    join there would silently degrade to inner (NULL-extended rows fail
    the BETWEEN); ``left`` is reconstructed explicitly instead.
    """
    if bucket_width is None:
        raise ValueError("bucket_width is required (≈ typical interval length)")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on or [])

    p = points.withColumn("_b", F.floor(F.col(point_col) / F.lit(bucket_width)))
    i = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor(F.col(end_col) / F.lit(bucket_width)),
            )
        ),
    )
    joined = p.join(i, on=on + ["_b"], how="inner")
    inner = joined.filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    ).drop("_b")
    if how == "inner":
        return inner
    # left: re-attach points with no surviving match (either no bucket hit
    # or every bucket hit failed the refine) with NULL interval columns.
    # The anti-join must be NULL-SAFE: plain equality would fail to
    # recognize a matched row containing a NULL point column and re-emit
    # it as a spurious unmatched copy. Renamed right side avoids the
    # ambiguous-self-join trap (matched descends from points).
    matched = inner.select(
        *[F.col(c).alias(f"_m_{c}") for c in points.columns]
    ).distinct()
    cond = None
    for c in points.columns:
        eq = F.col(c).eqNullSafe(F.col(f"_m_{c}"))
        cond = eq if cond is None else cond & eq
    missing = points.join(matched, on=cond, how="left_anti")
    # NULL-extend only the interval-side columns: the shared ``on`` keys
    # belong to the point row and must keep their values
    for c, t in intervals.dtypes:
        if c in on:
            continue
        missing = missing.withColumn(c, F.lit(None).cast(t))
    return inner.unionByName(missing)
