"""Dataset maintenance operators: incremental snapshot refresh.

The reference recomputes its whole working set per run (sliding wall-clock
window, docs/interpolator.md:25-31); a 100 TB corpus can't — it applies a
small delta to a large snapshot. Vanilla Spark has no MERGE INTO without a
table format (Delta/Iceberg), but SCD-1 upsert is expressible as pure
DataFrame algebra, and that is the form that scales: one anti-join on the
key plus a union, no full rewrite of unmatched data paths when combined
with partition-scoped writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def upsert_snapshot(
    snapshot: DataFrame,
    updates: DataFrame,
    key: str,
    broadcast_updates: bool = False,
    validate_unique: bool = True,
) -> DataFrame:
    """SCD-1 merge: rows from ``updates`` win on key collision, unmatched
    ``snapshot`` rows survive — ``updates ∪ (snapshot ⟕̸ updates)``.

    Scale shape: the only wide operation is the LEFT ANTI join on ``key``
    (uniform hash shuffle). The common case — a delta that is orders of
    magnitude smaller than the snapshot — should pass
    ``broadcast_updates=True`` so the anti-join is a map-side hash probe
    and the snapshot never shuffles at all; AQE also picks this up when
    the delta's size is known to be under the broadcast threshold.

    ``validate_unique`` (default on) raises when ``updates`` carries the
    same key twice — the Delta/Iceberg MERGE INTO multiple-source-matches
    error. Without it both versions of the row would land in the merged
    snapshot silently, and every later upsert would preserve the
    duplicates. The check is one aggregation over the DELTA only (the
    small side by assumption); pass ``validate_unique=False`` when the
    caller has already deduplicated the batch.

    Both inputs must share a schema (column order is aligned by name).
    """
    cols = snapshot.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: snapshot {sorted(cols)} vs updates "
            f"{sorted(updates.columns)}"
        )
    if validate_unique:
        row = updates.agg(
            F.count("*").alias("n"),
            # count(col) skips NULLs; NULL is a legal upsert key here
            # (eqNullSafe below), so count it as its own key value
            (
                F.count_distinct(F.col(key))
                # max() over an EMPTY delta is NULL — coalesce so an empty
                # updates relation validates as 0 == 0, not 0 != NULL
                + F.coalesce(
                    F.max(F.when(F.col(key).isNull(), 1).otherwise(0)), F.lit(0)
                )
            ).alias("k"),
        ).first()
        if row["n"] != row["k"]:
            raise ValueError(
                f"updates carry duplicate {key!r} values ({row['n']} rows, "
                f"{row['k']} distinct keys) — MERGE semantics forbid "
                "multiple source matches; deduplicate the delta first"
            )
    keys = updates.select(F.col(key).alias("_upsert_key"))
    if broadcast_updates:
        keys = F.broadcast(keys)
    # null-SAFE equality: with plain `=`, a NULL key in updates matches
    # nothing, so a NULL-keyed snapshot row would survive ALONGSIDE the
    # NULL-keyed update — both versions in the output. <=> makes NULL a
    # key value like any other: the update wins there too.
    survivors = snapshot.join(
        keys, on=snapshot[key].eqNullSafe(keys["_upsert_key"]), how="left_anti"
    )
    return updates.select(*cols).unionByName(survivors.select(*cols))
