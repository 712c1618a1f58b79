"""Shared fixtures: one local SparkSession and the F1 grid-file fixture.

The grid fixture implements FIXTURES.md §F1: 13 ten-minute timestamps
(2h window, one file deliberately missing mid-range), each file one dense
(lon 17 × lat 10 × h 7) spatial snapshot with measures ``rho[kg/m^3]`` and
``T[K]`` (~1% NaN), filename ``YYYY-MM-DDTHH:MM:SS.parquet``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kamodo_dask_spark.session import get_spark

GRID_START = datetime(2024, 3, 1, 0, 0, 0)
N_FILES = 13
MISSING_INDEX = 5  # one timestamp mid-range has no file (kamodo_dask.py:72-76)
LON = np.linspace(0.0, 360.0, 17)
LAT = np.linspace(-90.0, 90.0, 10)
H = np.arange(227500.0, 422500.0 + 1, 32500.0)  # 7 values, brackets 292500-357500


def rho_fn(t_s, lon, lat, h):
    """Deterministic smooth field (no transcendental divergence concerns —
    only used as ground data, oracles recompute from the same stored values)."""
    return (
        1e-9
        + 1e-12 * np.sin(lon * np.pi / 180.0)
        + 1e-12 * np.cos(lat * np.pi / 180.0)
        + 1e-15 * (h - 227500.0) / 1000.0
        + 1e-13 * ((t_s % 86400) / 86400.0)
    )


def temp_fn(t_s, lon, lat, h):
    return 800.0 + 0.1 * lat + 1e-4 * (h - 300000.0) / 100.0 + 5.0 * np.sin(lon / 57.3)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kamodo-dask-spark-tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def grid_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("grid_files")
    rng = np.random.default_rng(42)
    lon, lat, h = [a.ravel() for a in np.meshgrid(LON, LAT, H, indexing="ij")]
    for i in range(N_FILES):
        if i == MISSING_INDEX:
            continue
        ts = GRID_START + timedelta(minutes=10 * i)
        t_s = ts.timestamp()
        rho = rho_fn(t_s, lon, lat, h)
        temp = temp_fn(t_s, lon, lat, h)
        nan_mask = rng.random(len(rho)) < 0.01
        rho = rho.copy()
        rho[nan_mask] = np.nan
        tbl = pa.table(
            {
                "lon": lon,
                "lat": lat,
                "h": h,
                "rho[kg/m^3]": rho,
                "T[K]": temp,
            }
        )
        pq.write_table(tbl, root / f"{ts.strftime('%Y-%m-%dT%H-%M-%S')}.parquet")
    return str(root)
