"""Parquet sources.

Reference parity:
- multi-file lazy scan  — ``kamodo_dask/kamodo_dask.py:108-132`` (``parquet_to_ddf``)
  → ``spark.read.parquet(*paths)`` (implicit UNION ALL, schema from footers,
  vectorized reader, predicate pushdown).
- per-file timestamp    — ``kamodo_dask/kamodo_dask.py:97-105`` derives a
  timestamp from each filename and stamps it onto rows *positionally*
  (``np.repeat``, ``kamodo_dask.py:174,280`` — order-dependent, [REF-BUG]).
  We derive it from ``input_file_name()`` instead, which is row-order
  independent and survives shuffles.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F

_NANOS_KEY = "spark.sql.legacy.parquet.nanosAsLong"


@contextmanager
def nanos_as_long(spark: SparkSession):
    """Scoped ``nanosAsLong``: set for the duration of the block, restore the
    prior value after. Only safe when execution COMPLETES inside the block —
    a lazy DataFrame returned out of the scope would fail at action time,
    because the parquet scan re-reads the session conf during physical
    planning. ``read_events`` therefore cannot use this (it returns a lazy
    frame) and must leave the conf set; callers of completed-execution paths
    (e.g. the streaming catalog entry) should."""
    try:
        prev = spark.conf.get(_NANOS_KEY, "false")
    except Exception:
        prev = None
    try:
        spark.conf.set(_NANOS_KEY, "true")
    except Exception:
        pass
    try:
        yield
    finally:
        if prev is not None:
            try:
                spark.conf.set(_NANOS_KEY, prev)
            except Exception:
                pass

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# ISO timestamp embedded in a grid filename: {prefix}YYYY-MM-DDTHH:MM:SS{postfix}
# (reference filename scheme, kamodo_dask.py:63-67). The time separator may be
# ':' (object stores) or '-' (Hadoop-safe local/HDFS layouts).
_TS_PATTERN = r"(\d{4}-\d{2}-\d{2})T(\d{2})[:\-](\d{2})[:\-](\d{2})"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic benchmark table; events get timestamp normalization."""
    if name == "events":
        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its nanosecond timestamps to Spark µs.

    The events fixture stores ``ts`` as Parquet INT64 TIMESTAMP(NANOS), which
    Spark's reader rejects outright. With ``nanosAsLong`` the column surfaces
    as raw nanoseconds; truncating division to micros matches how µs-native
    engines (DuckDB, Spark itself) downcast nanosecond timestamps.

    NB: the conf deliberately stays set on the session — the returned frame
    is lazy, and the scan re-reads the conf at action time, so a scoped
    restore (:func:`nanos_as_long`) would break execution after return.
    """
    path = f"{sf_dir}/events.parquet"
    try:
        spark.conf.set(_NANOS_KEY, "true")
    except Exception:
        pass
    try:
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    except Exception:
        # Conf not settable in this deployment: read through pyarrow and
        # downcast on the driver. Only used as a last resort on small inputs.
        import pyarrow.parquet as pq

        tbl = pq.read_table(path)
        pdf = tbl.to_pandas()
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        return spark.createDataFrame(pdf)


def scan_grid_files(spark: SparkSession, paths: list[str], *, with_timestamp: bool = True) -> DataFrame:
    """Scan N single-timestamp grid Parquet files into one DataFrame.

    Equivalent of ``parquet_to_ddf`` (kamodo_dask.py:108-132): one logical
    UNION ALL over the file list. With ``with_timestamp`` the per-file
    timestamp is recovered from the filename (see module docstring).
    """
    df = spark.read.parquet(*paths)
    if with_timestamp:
        df = with_file_timestamp(df)
    return df


def with_file_timestamp(df: DataFrame, column: str = "time") -> DataFrame:
    """Derive a timestamp column from each row's source filename.

    Spark-side replacement for ``extract_timestamp_from_filename`` +
    positional stamping (kamodo_dask.py:97-105,174,278-287): order-independent
    and executed JVM-side within the scan stage.
    """
    name = F.input_file_name()
    stamp = F.concat_ws(
        " ",
        F.regexp_extract(name, _TS_PATTERN, 1),
        F.concat_ws(
            ":",
            F.regexp_extract(name, _TS_PATTERN, 2),
            F.regexp_extract(name, _TS_PATTERN, 3),
            F.regexp_extract(name, _TS_PATTERN, 4),
        ),
    )
    return df.withColumn(column, F.to_timestamp(stamp, "yyyy-MM-dd HH:mm:ss"))
