"""Single-pass dataset profiling.

The first step on any new 100 TB corpus is a per-column profile: row
count, null count, distinct cardinality, min/max. The reference has no
profiling surface (its ingest assumes a known dense grid —
``kamodo_dask.py``'s hard-coded column handling); a general engine needs
one, and it must be ONE scan, not one job per column.

Design (scale notes):

- The frame is melted to ``(column_name, value)`` long form with a
  row-local ``stack`` projection — zero shuffle, and Catalyst prunes the
  scan to exactly the profiled columns.
- ``exact=True`` aggregates the long form twice-grouped:
  ``(column_name, value)`` partial first, then ``column_name`` — the
  standard two-stage exact-distinct plan. Shuffle volume is bounded by
  the number of DISTINCT values per column (the first stage map-side
  combines duplicates), not the row count; profiling a near-unique key
  column over 100 TB degrades to a full-key shuffle, which is what exact
  cardinality costs on any engine.
- ``exact=False`` swaps the distinct count for ``approx_count_distinct``
  (HyperLogLog++): one pass, one sketch per column per task, shuffle
  volume = n_columns × sketch size. That is the default recommendation
  at corpus scale; it has no cross-engine oracle (sketch internals
  differ), so the catalog entry pins the exact path and a pytest bounds
  the approximate one against it.

Values are compared/min-maxed as STRINGS (binary UTF-8 ordering, on
which Spark and DuckDB agree) so one schema serves every input type;
numeric min/max belongs to the existing bounds/stats operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile in ONE scan: ``(column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value)``, one output row per profiled
    column, ordered by ``column_name``.

    ``columns`` defaults to every column. Complex types (arrays, maps,
    structs) are profiled via their JSON rendering so the melt stays a
    row-local projection.
    """
    cols = list(df.columns) if columns is None else list(columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    if not cols:
        raise ValueError("profile_columns: no columns to profile")

    dtypes = dict(df.dtypes)

    def _as_string(c: str) -> F.Column:
        t = dtypes[c]
        if t.startswith(("array", "map", "struct")):
            return F.to_json(F.col(c))
        return F.col(c).cast("string")

    # melt: one row per (column, value) — row-local, no shuffle, and the
    # projection keeps only the profiled columns so the scan is pruned
    pairs = []
    for c in cols:
        pairs.append(F.lit(c))
        pairs.append(_as_string(c))
    long = df.select(F.stack(F.lit(len(cols)), *pairs).alias("column_name", "_v"))

    distinct_agg = (
        F.count_distinct(F.col("_v")) if exact else F.approx_count_distinct("_v")
    )
    return (
        long.groupBy("column_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("_v")).alias("n_nulls"),
            distinct_agg.alias("n_distinct"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
        )
        .orderBy("column_name")
    )
