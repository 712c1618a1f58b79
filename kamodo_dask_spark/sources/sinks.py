"""Materialization sinks.

The reference never writes (its ``get_parquet_buffer`` is dead code with a
missing import — kamodo_dask.py:90-94 [REF-BUG]). The engine adds first-class
sinks, and at scale the important one is the **time-partitioned grid layout**:
``.../ts_date=YYYY-MM-DD/ts_hour=HH/`` turns the reference's filename-manifest
discovery (kamodo_dask.py:63-86) into Catalyst partition pruning — a time
filter prunes directories at planning time, no manifest probing at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_partitioned_grid(
    df: DataFrame,
    path: str,
    time_col: str = "time",
    mode: str = "overwrite",
) -> None:
    """Write a grid DataFrame partitioned by derived (date, hour) columns.

    Hive-style layout; one directory per hour keeps partitions file-count
    friendly at 10-minute cadence (6 files/partition), and AQE-advised file
    sizes apply within each.
    """
    (
        df.withColumn("ts_date", F.to_date(F.col(time_col)))
        .withColumn("ts_hour", F.hour(F.col(time_col)))
        .write.partitionBy("ts_date", "ts_hour")
        .mode(mode)
        .parquet(path)
    )


def read_partitioned_grid(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned grid written by :func:`write_partitioned_grid`,
    dropping the partitioning helper columns (``time`` itself was stored)."""
    return spark.read.parquet(path).drop("ts_date", "ts_hour")


def write_grid_with_units(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a grid restoring the reference's ``name[units]`` column spelling
    from StructField metadata (round-trip fidelity with kamodo-dask datasets,
    kamodo_dask.py:329-332)."""
    cols = []
    for field in df.schema.fields:
        units = (field.metadata or {}).get("units")
        if units:
            cols.append(F.col(field.name).alias(f"{field.name}[{units}]"))
        else:
            cols.append(F.col(field.name))
    df.select(*cols).write.mode(mode).parquet(path)


def time_range_scan(
    spark: SparkSession, path: str, start, end
) -> DataFrame:
    """Time-range query against the partitioned layout.

    The date/hour predicates are derived from [start, end] and prune whole
    directories (PartitionFilters); the exact time BETWEEN refines within.
    """
    df = spark.read.parquet(path)
    return df.filter(
        (F.col("ts_date") >= F.to_date(F.lit(str(start))))
        & (F.col("ts_date") <= F.to_date(F.lit(str(end))))
        & F.col("time").between(str(start), str(end))
    ).drop("ts_date", "ts_hour")


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-files compaction — the maintenance pass every long-running
    100 TB ingest needs: streaming/micro-batch writers and per-task commits
    leave thousands of KB-sized parquet files whose open/footer overhead
    eventually dominates scan time and the driver's file-listing memory.

    Rewrites ``path`` into ``out_path`` with files sized ~``target_file_bytes``
    by measuring the ACTUAL on-disk bytes (Hadoop FS content summary — no
    data scan) and repartitioning to ``ceil(bytes / target)``. With
    ``partition_cols`` the repartition hashes on those columns so the write
    produces at most one file per (task, partition-dir) instead of every
    task writing into every directory. Returns the file count written.

    Compaction is a full rewrite by design (parquet files are immutable);
    run it per partition-directory in production so only cold partitions
    rewrite, and swap directories atomically at the catalog/manifest layer.
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    if partition_cols:
        # Hashing on the partition columns ALONE would put every row of one
        # partition value in a single task — one giant output file for any
        # partition larger than the target (exactly the skewed layout
        # compaction exists to fix). A content-hash spread key splits each
        # partition value across ~ceil(n_files / n_partition_values) tasks
        # while still bounding files per directory. The distinct count is
        # one column-pruned scan — acceptable for a maintenance pass.
        n_parts = df.select(*partition_cols).distinct().count()
        spread_k = max(1, n_files // max(1, n_parts))
        spread = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(spread_k)
        )
        writer = (
            df.repartition(
                n_files, *[F.col(c) for c in partition_cols], spread
            )
            .write.partitionBy(*partition_cols)
        )
    else:
        writer = df.repartition(n_files).write
    writer.mode("overwrite").parquet(out_path)

    out_hpath = jvm.org.apache.hadoop.fs.Path(out_path)
    # the OUTPUT path's filesystem — input and output may live on
    # different schemes (s3a -> local, s3a -> hdfs); listing the out path
    # through the input FS raises Wrong-FS after the rewrite completed
    out_fs = out_hpath.getFileSystem(jsc.hadoopConfiguration())
    it = out_fs.listFiles(out_hpath, True)
    written = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            written += 1
    return written
