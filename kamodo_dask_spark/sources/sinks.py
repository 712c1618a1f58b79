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
