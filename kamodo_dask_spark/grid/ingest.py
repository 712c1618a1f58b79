"""Grid ingestion lifecycle — the reference's ``df_from_dask`` re-expressed.

``df_from_dask`` (kamodo_dask/kamodo_dask.py:185-298) pipeline: align the
time window to file frequency → snap the h-range outward to grid values →
discover files → validate bounds → lazy scan → repartition → filter →
persist → gather, with manual retry plumbing. In Spark: discovery is a
metadata glob, repartitioning/retries/caching are engine-level (AQE,
task retry, ``persist``), and the result stays a distributed DataFrame —
nothing is gathered to the driver.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession

from kamodo_dask_spark.functions.time import floor_datetime, ceil_datetime
from kamodo_dask_spark.grid.model import (
    normalize_measure_columns,
    range_filter,
    snap_range,
)
from kamodo_dask_spark.sources.discovery import (
    DEFAULT_FREQ,
    SAFE_TS_FORMAT,
    TS_FORMAT,
    fetch_file_range,
)
from kamodo_dask_spark.sources.parquet import scan_grid_files, with_file_timestamp


def load_grid_range(
    spark: SparkSession,
    prefix: str,
    start: datetime,
    end: datetime,
    h_range: tuple[float, float] | None = None,
    h_values: list[float] | None = None,
    freq: timedelta = DEFAULT_FREQ,
    postfix: str = ".parquet",
    fmt: str | None = None,
    persist: bool = False,
) -> DataFrame:
    """Load a time range of grid files as one DataFrame, h-slab filtered.

    Mirrors ``df_from_dask`` semantics:
    - window aligned outward to file frequency (floor start / ceil end,
      kamodo_dask.py:191-192);
    - missing files tolerated with a warning (kamodo_dask.py:72-76), none
      found → ``IOError`` (kamodo_dask.py:210-211);
    - found timestamps must bracket the query window → ``IOError`` otherwise
      (kamodo_dask.py:217-224);
    - h-range snapped *outward* to grid values so interpolation over the
      slab never extrapolates (kamodo_dask.py:194-206): against caller-known
      ``h_values`` when given (driver-side, no job) else one conditional-
      extrema aggregation over the scan;
    - the slab filter is a plain BETWEEN → Catalyst pushes it to Parquet
      row-group stats.
    """
    start_al = floor_datetime(start, freq)
    end_al = ceil_datetime(end, freq)

    # Colon-free filenames for filesystems whose Path rejects ':' (local/HDFS);
    # the reference's colon format for object stores.
    if fmt is None:
        fmt = TS_FORMAT if prefix.startswith("s3") else SAFE_TS_FORMAT
    paths, stamps = fetch_file_range(
        start_al, end_al, prefix, postfix, freq, spark=spark, fmt=fmt
    )
    if not paths:
        raise IOError(f"no grid files found in [{start_al}, {end_al}] under {prefix!r}")
    if not (min(stamps) <= start and end <= max(stamps)):
        raise IOError(
            f"query window [{start}, {end}] not bracketed by found files "
            f"[{min(stamps)}, {max(stamps)}] — time interpolation would extrapolate"
        )

    # Filter FIRST, over the bare scan: input_file_name() (the time column) is
    # a non-deterministic expression, and a projection containing it blocks
    # Catalyst from pushing the slab predicate down into the Parquet scan.
    df = scan_grid_files(spark, paths, with_timestamp=False)

    if h_range is not None:
        lo, hi = h_range
        if h_values is not None:
            lo, hi = _snap_known(sorted(float(v) for v in h_values), lo, hi)
        else:
            lo, hi = snap_range(df, "h", lo, hi)
        df = range_filter(df, "h", lo, hi)

    df = with_file_timestamp(df)
    df = normalize_measure_columns(df)

    if persist:
        df = df.persist()
    return df


def _snap_known(values: list[float], lo: float, hi: float) -> tuple[float, float]:
    """Driver-side snap when the grid values are already known
    (kamodo_dask.py:194-206 operates on caller-supplied ``h_values``)."""
    below = [v for v in values if v <= lo]
    above = [v for v in values if v >= hi]
    if not below:
        raise ValueError(f"no grid h value <= {lo}; cannot bracket query range")
    if not above:
        raise ValueError(f"no grid h value >= {hi}; cannot bracket query range")
    return max(below), min(above)
