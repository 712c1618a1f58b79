"""Drop-in compatibility layer: the reference's public API on the Spark engine.

A kamodo-dask user can switch imports
(``from kamodo_dask_spark.compat import df_from_dask, KamodoDask``) and run
the workflows from the reference's smoke scripts and notebook unchanged
(``test/test_parquet_load.py``, ``test/test_parquet_prod.py``,
``docs/interpolator.md``): same function names, arguments, return shapes
(driver-side pandas DataFrames with the ``(time, lon, lat, h)`` MultiIndex
and ``name[units]`` columns), and error contracts.

Differences from the reference (all bug fixes, flagged in SURVEY.md):
- per-row timestamps derive from source filenames, not positional
  ``np.repeat`` (kamodo_dask.py:278-287 silently corrupts times when files
  differ in size or arrive out of order) — identical output whenever the
  reference's assumptions hold;
- ``df_from_parquet``'s ``filter_function`` is honored (in the reference the
  result is overwritten by the query-string branch, kamodo_dask.py:156-163);
- each registered interpolator is bound to its own measure (the reference's
  loop captures the last ``rgi`` by late binding, kamodo_dask.py:328-351);
- no dask client argument: pass a SparkSession (or None to build one) where
  the reference takes ``client``.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from kamodo_dask_spark.grid.interpolate import nlinear_interp
from kamodo_dask_spark.grid.model import UNITS_RE
from kamodo_dask_spark.session import get_spark
from kamodo_dask_spark.sources import discovery as _disc
from kamodo_dask_spark.sources.parquet import scan_grid_files

TS_FORMAT = "%Y-%m-%dT%H:%M:%S"

_SIZE_UNITS = {"": 1, "b": 1, "kb": 10**3, "mb": 10**6, "gb": 10**9,
               "kib": 2**10, "mib": 2**20, "gib": 2**30}


def _parse_partition_size(size) -> int:
    """dask-style partition size → bytes: int passes through; strings accept
    '128MB', '100 MiB', '1e8', case-insensitive."""
    if isinstance(size, (int, float)):
        return int(size)
    s = str(size).strip().lower().replace(" ", "")
    for unit in sorted(_SIZE_UNITS, key=len, reverse=True):
        if unit and s.endswith(unit):
            return int(float(s[: -len(unit)]) * _SIZE_UNITS[unit])
    return int(float(s))


def _session(client) -> SparkSession:
    if isinstance(client, SparkSession):
        return client
    return get_spark("kamodo_dask_compat")


def check_existence(path: str, spark: SparkSession | None = None) -> bool:
    """File-existence probe (reference ``check_existence(bucket, key)``,
    kamodo_dask.py:23-29, generalized to any Hadoop-visible path)."""
    return _disc._hadoop_exists(_session(spark), [path])[0]


def check_file_existence(
    filenames: list[str], prefix: str, postfix: str, spark: SparkSession | None = None
) -> list[tuple[str, pd.Timestamp]]:
    """(filename, timestamp) for each existing file, preserving order
    (kamodo_dask.py:31-60). Existence checks go through the Hadoop
    FileSystem client (s3a/hdfs/file) instead of a 20-thread boto pool."""
    spark = _session(spark)
    exists = _disc._hadoop_exists(spark, filenames)
    out = []
    for name, ok in zip(filenames, exists):
        if not ok:
            continue
        stamp = name.replace(prefix, "").replace(postfix, "")
        try:
            out.append((name, pd.to_datetime(stamp.replace("T", " "))))
        except ValueError as e:  # pragma: no cover - parity with reference
            print(f"Error parsing {stamp}: {e}")
    return out


def fetch_file_range(
    start,
    end,
    parquet_endpoint: str,
    postfix: str = ".parquet",
    freq: str = "10min",
    spark: SparkSession | None = None,
    fmt: str = TS_FORMAT,
) -> tuple[list[str], pd.DatetimeIndex]:
    """Candidate filenames for every ``freq`` step in [start, end]; keep the
    existing ones and return them with their DatetimeIndex
    (kamodo_dask.py:63-86). ``fmt`` extends the reference for filesystems
    that reject ':' in names."""
    spark = _session(spark)
    rng = pd.date_range(pd.Timestamp(start), pd.Timestamp(end), freq=freq)
    names = [f"{parquet_endpoint}{ts.strftime(fmt)}{postfix}" for ts in rng]
    exists = _disc._hadoop_exists(spark, names)
    found = [(n, t) for n, t, ok in zip(names, rng, exists) if ok]
    if len(found) < len(names):
        print(f"warning: found {len(found)} of {len(names)} requested files")
    filenames = [n for n, _ in found]
    date_range = pd.DatetimeIndex([t for _, t in found], tz=getattr(rng, "tz", None))
    return filenames, date_range


def extract_timestamp_from_filename(filename: str, prefix: str, postfix: str) -> pd.Timestamp:
    """kamodo_dask.py:97-101."""
    return pd.to_datetime(
        filename.replace(prefix, "").replace(postfix, ""), format=TS_FORMAT
    )


def add_timestamp_to_partition(df: pd.DataFrame, timestamp) -> pd.DataFrame:
    """kamodo_dask.py:103-105."""
    df["timestamp"] = timestamp
    return df


def parquet_to_ddf(
    filenames: list[str],
    storage_options=None,
    engine=None,
    verbose: bool = False,
    spark: SparkSession | None = None,
) -> DataFrame:
    """Lazy multi-file scan (kamodo_dask.py:108-132). Returns a Spark
    DataFrame — the lazy-frame role dask's ddf plays; ``storage_options`` /
    ``engine`` are accepted for signature parity (S3 credentials belong in
    ``fs.s3a.*`` conf)."""
    spark = _session(spark)
    if verbose:
        print(f"scanning {len(filenames)} parquet files")
    return scan_grid_files(spark, filenames, with_timestamp=False)


def filter_partition(df: pd.DataFrame, h_range: tuple[float, float]) -> pd.DataFrame:
    """Per-partition h-slab filter (kamodo_dask.py:134-147).

    Accepts BOTH partition shapes: the reference's MultiIndex frames (``h``
    as an index level) and this engine's column-shaped Arrow batches — so it
    can be passed directly as ``df_from_parquet(filter_function=...)``, the
    reference's ``test_parquet_load.py:67-68`` pattern."""
    try:
        h = pd.to_numeric(df.index.get_level_values("h"), errors="coerce")
    except KeyError:
        h = pd.to_numeric(df["h"], errors="coerce")
    h_min, h_max = h_range
    return df[(np.asarray(h) >= h_min) & (np.asarray(h) <= h_max)]


def _collect_multiindex(sdf: DataFrame) -> pd.DataFrame:
    """Collect a grid DataFrame (with per-file `time`) to the reference's
    driver-side shape: MultiIndex (time, lon, lat, h), measure columns with
    their original ``name[units]`` spelling, sorted C-order."""
    pdf = sdf.toPandas()
    pdf = pdf.set_index(["time", "lon", "lat", "h"]).sort_index()
    return pdf


def df_from_parquet(
    client,
    parquet_endpoint: str,
    storage_options=None,
    engine=None,
    start=None,
    end=None,
    h_start: float = None,
    h_end: float = None,
    filter_function=None,
    fmt: str = TS_FORMAT,
) -> pd.DataFrame:
    """Reference entry point 2 (kamodo_dask.py:149-183): discover, scan,
    h-filter, gather to a pandas MultiIndex frame.

    ``filter_function`` (if given) is applied per Arrow batch — and actually
    honored, unlike the reference where the query branch overwrites it.
    Each batch is presented with the reference's partition shape — a
    ``(lon, lat, h)`` MultiIndex (kamodo_dask.py:178) — so filter functions
    written against the reference (including :func:`filter_partition`
    itself, test_parquet_load.py:67-68) port without modification; the
    index is reset before the rows continue through the engine.
    """
    spark = _session(client)
    # h bounds: both-or-neither. A silent between(NULL, NULL) would filter
    # out EVERY row (NULL predicate) — worse than the reference, which at
    # least crashes on 'h >= None'. No bounds → no h filter.
    if (h_start is None) != (h_end is None):
        raise ValueError(
            f"h_start and h_end must be given together (got h_start={h_start!r}, "
            f"h_end={h_end!r})"
        )
    filenames, date_range = fetch_file_range(
        start, end, parquet_endpoint, ".parquet", spark=spark, fmt=fmt
    )
    if not filenames:
        raise IOError(f"No files found matching query\n start: {start}\n end: {end}")
    sdf = parquet_to_ddf(filenames, spark=spark)
    if filter_function is not None:
        schema = sdf.schema
        col_order = sdf.columns
        idx_cols = [c for c in ("lon", "lat", "h") if c in col_order]

        def batches(it):
            for pdf in it:
                out = filter_function(pdf.set_index(idx_cols), h_range=(h_start, h_end))
                yield out.reset_index()[col_order]

        sdf = sdf.mapInPandas(batches, schema)
    elif h_start is not None:
        sdf = sdf.filter(F.col("h").between(h_start, h_end))
    from kamodo_dask_spark.sources.parquet import with_file_timestamp

    return _collect_multiindex(with_file_timestamp(sdf))


def df_from_dask(
    client,
    endpoint: str,
    storage_options=None,
    start=None,
    end=None,
    h_start: float = None,
    h_end: float = None,
    h_values: np.ndarray = None,
    round_time: str = "10min",
    suffix: str = ".parquet",
    npartitions: int | None = None,
    partition_size=None,
    verbose: bool = False,
    fmt: str = TS_FORMAT,
) -> pd.DataFrame:
    """Reference entry point 1 (kamodo_dask.py:185-298), same contract:
    align the window, snap [h_start, h_end] outward to ``h_values``
    (ValueError if unbracketable), discover files (IOError if none), strict
    time-bounds assertions (IOError), scan + filter + gather.

    Persist/retry/rebalance plumbing maps to Spark's scheduler; npartitions /
    partition_size map to repartition / AQE advisory sizing.
    """
    spark = _session(client)
    start, end = pd.Timestamp(start), pd.Timestamp(end)
    start_rounded = start.floor(round_time)
    end_rounded = end.ceil(round_time)

    if h_values is None:
        raise ValueError(
            "h_values is required: pass the grid's h axis values so "
            "[h_start, h_end] can be snapped outward to grid nodes"
        )
    h_values = np.asarray(h_values)
    if h_values[h_values <= h_start].size > 0:
        closest_h_start = h_values[h_values <= h_start].max()
    else:
        raise ValueError("No values in h_values are <= h_start. Check the input ranges.")
    if h_values[h_values >= h_end].size > 0:
        closest_h_end = h_values[h_values >= h_end].min()
    else:
        raise ValueError("No values in h_values are >= h_end. Check the input ranges.")

    filenames, date_range = fetch_file_range(
        start_rounded, end_rounded, endpoint, suffix, freq=round_time, spark=spark, fmt=fmt
    )
    if not filenames:
        raise IOError(f"No files found matching query\n start: {start}\n end: {end}")
    # STRICT bounds (> and <, not >=/<=) replicate the reference verbatim
    # (kamodo_dask.py:218-224): the window must be strictly bracketed by
    # file timestamps, so a start/end landing exactly on a file boundary is
    # rejected. Deliberate drop-in parity — widen the request by one
    # round_time step if the boundary case matters.
    if not start > date_range.min():
        raise IOError(f"start time out of bounds: {start} !> {date_range.min()}")
    if not end < date_range.max():
        raise IOError(f"end time out of bounds: {end} !< {date_range.max()}")

    sdf = parquet_to_ddf(filenames, spark=spark, verbose=verbose)
    if npartitions is not None:
        sdf = sdf.repartition(npartitions)
    elif partition_size is not None:
        # dask repartition(partition_size=...) → Spark's split/coalesce
        # sizing knobs (kamodo_dask.py:239-244): scans split at
        # maxPartitionBytes, AQE coalesces shuffles toward the advisory size.
        nbytes = _parse_partition_size(partition_size)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(nbytes))
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", str(nbytes))
        if verbose:
            print(f"partition size target set to {nbytes} bytes")
    sdf = sdf.filter(F.col("h").between(float(closest_h_start), float(closest_h_end)))

    from kamodo_dask_spark.sources.parquet import with_file_timestamp

    return _collect_multiindex(with_file_timestamp(sdf))


class KamodoDask(dict):
    """Driver-side interpolator registry over a MultiIndex pandas frame —
    the reference's ``KamodoDask`` (kamodo_dask.py:301-357) without the
    kamodo-core dependency: a dict of callables with ``.units`` attributes.

    ``kd['rho'](xvec)`` evaluates N-linear interpolation at an (n, 4) array
    of ``(time_s, lon, lat, h)`` points; ``kd['rho_ijkl'](time=…, lat=…)``
    evaluates the gridded form (unspecified axes default to the full grid,
    singleton dims squeezed — @gridify semantics, kamodo_dask.py:343-348).
    """

    def __init__(self, df: pd.DataFrame, fill_value: float = 0, **kwargs):
        super().__init__()
        self.df = df.sort_index()
        self.fill_value = fill_value
        # time level → epoch seconds (reference v.value/1e9, kamodo_dask.py:309)
        self.time = np.array([v.value / 1e9 for v in self.df.index.levels[0]])
        self.levels = {"time": self.time}
        for level in self.df.index.levels[1:]:
            self.levels[level.name] = np.asarray(level.values, dtype=np.float64)
        self.units = {}
        self.initialize_interpolators()

    def initialize_interpolators(self):
        var_shape = tuple(len(v) for v in self.levels.values())
        axes = list(self.levels.values())
        expected = int(np.prod(var_shape))
        if len(self.df) != expected:
            raise ValueError(
                f"grid is not dense: {len(self.df)} rows != {expected} "
                f"(= {' * '.join(map(str, var_shape))})"
            )
        for var_str in self.df.columns:
            match = UNITS_RE.search(var_str)
            variable_name = match.group(1) if match else var_str
            units = match.group(2) if match else ""
            var_data = (
                self.df[var_str].fillna(self.fill_value).to_numpy().reshape(var_shape)
            )

            # bind per-variable state NOW — the reference's closures all
            # capture the final loop iteration's rgi (late-binding [REF-BUG])
            def interpolator(xvec, _axes=axes, _data=var_data):
                pts = np.atleast_2d(np.asarray(xvec, dtype=np.float64))
                return nlinear_interp(_axes, _data, pts, self.fill_value)

            def interpolator_ijkl(
                _axes=axes, _data=var_data, _levels=self.levels, **coords
            ):
                grids = [
                    np.atleast_1d(np.asarray(coords.get(name, default), dtype=np.float64))
                    for name, default in _levels.items()
                ]
                mesh = np.meshgrid(*grids, indexing="ij")
                pts = np.column_stack([m.ravel() for m in mesh])
                out = nlinear_interp(_axes, _data, pts, self.fill_value)
                return np.squeeze(out.reshape([len(g) for g in grids]))

            interpolator.units = units
            interpolator_ijkl.units = units
            self.units[variable_name] = units
            self[variable_name] = interpolator
            self[variable_name + "_ijkl"] = interpolator_ijkl

    def get_bounds(self):
        """kamodo_dask.py:353-354."""
        return {k: (v.min(), v.max()) for k, v in self.levels.items()}

    def get_midpoint(self):
        """kamodo_dask.py:356-357."""
        return {k: v.mean() for k, v in self.levels.items()}
