"""Bucketed table layout — pre-shuffled storage for repeated joins/aggs.

The reference re-reads and re-groups the same time-partitioned files on every
query (kamodo_dask/kamodo_dask.py:127,227 — dask re-partitions per run). At
100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem) or a
repeated group-by is the shuffle. Bucketing amortizes it: write the table
hash-partitioned (and optionally sorted) by the join/agg key ONCE, and every
subsequent equi-join or aggregation on that key reads the co-located buckets
with **zero Exchange** in the plan — Spark's `ClusteredDistribution` is
satisfied straight off the scan.

Rules of thumb encoded here:
- both join sides must have the SAME bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) on the SAME keys;
- bucket count is a storage-time decision ≈ cluster parallelism at read time
  (one task per bucket), so size buckets like shuffle partitions: target
  100–200 MB per bucket at the expected table size;
- ``sortBy`` the bucket key so the sort-merge join also skips the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) Parquet table.

    Bucketing metadata lives in the catalog, so this goes through
    ``saveAsTable`` (a plain ``.parquet(path)`` write cannot record bucket
    spec). ``path`` makes it an external table at that location.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort_cols = (
        [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or bucket_cols)
    )
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket spec applies automatically)."""
    return spark.table(table)


def is_bucketed(spark: SparkSession, table: str) -> bool:
    """True if the catalog records a bucket spec for ``table``."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(r.col_name == "Num Buckets" for r in rows)
