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
    """
    if bucket_width is None:
        raise ValueError("bucket_width is required (≈ typical interval length)")
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
    joined = p.join(i, on=on + ["_b"], how=how)
    refined = joined.filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    return refined.drop("_b")
