"""Compat layer: the reference's smoke-script workflows, with assertions.

Mirrors test/test_parquet_load.py and docs/interpolator.md flows from the
reference (which print and eyeball) — here every step is asserted.
"""

from __future__ import annotations

from datetime import timedelta

import numpy as np
import pandas as pd
import pytest

from kamodo_dask_spark import compat

from tests.conftest import GRID_START, MISSING_INDEX, N_FILES, LON, LAT, H, rho_fn, temp_fn

FMT = "%Y-%m-%dT%H-%M-%S"  # colon-free (local FS); reference format is the default


@pytest.fixture(scope="module")
def mi_df(spark, grid_dir):
    """The reference's canonical 2h workflow: df_from_dask → MultiIndex frame."""
    start = GRID_START + timedelta(minutes=5)
    end = GRID_START + timedelta(minutes=115)
    return compat.df_from_dask(
        spark,
        f"{grid_dir}/",
        start=start,
        end=end,
        h_start=292500.0,
        h_end=357500.0,
        h_values=H,
        fmt=FMT,
    )


def test_fetch_file_range_finds_existing(spark, grid_dir):
    names, rng = compat.fetch_file_range(
        GRID_START,
        GRID_START + timedelta(minutes=10 * (N_FILES - 1)),
        f"{grid_dir}/",
        spark=spark,
        fmt=FMT,
    )
    assert len(names) == N_FILES - 1  # one missing mid-range
    assert len(rng) == N_FILES - 1
    assert isinstance(rng, pd.DatetimeIndex)


def test_df_from_dask_shape_and_index(mi_df):
    # MultiIndex (time, lon, lat, h), original name[units] columns
    assert list(mi_df.index.names) == ["time", "lon", "lat", "h"]
    assert set(mi_df.columns) == {"rho[kg/m^3]", "T[K]"}
    # h slab snapped to [292500, 357500] = 3 grid values
    assert sorted(set(mi_df.index.get_level_values("h"))) == [292500.0, 325000.0, 357500.0]
    # dense: times × lon × lat × h
    n_times = len(set(mi_df.index.get_level_values("time")))
    assert len(mi_df) == n_times * len(LON) * len(LAT) * 3


def test_df_from_dask_error_contracts(spark, grid_dir):
    start = GRID_START + timedelta(minutes=5)
    end = GRID_START + timedelta(minutes=65)
    with pytest.raises(ValueError, match="h_values are <= h_start"):
        compat.df_from_dask(spark, f"{grid_dir}/", start=start, end=end,
                            h_start=1.0, h_end=300000.0, h_values=H, fmt=FMT)
    with pytest.raises(IOError, match="No files found"):
        compat.df_from_dask(spark, f"{grid_dir}/", start=pd.Timestamp("2030-01-01"),
                            end=pd.Timestamp("2030-01-01 02:00"),
                            h_start=292500.0, h_end=357500.0, h_values=H, fmt=FMT)
    # strict containment: start exactly on the first file boundary fails
    with pytest.raises(IOError, match="out of bounds"):
        compat.df_from_dask(spark, f"{grid_dir}/", start=GRID_START,
                            end=GRID_START + timedelta(minutes=65),
                            h_start=292500.0, h_end=357500.0, h_values=H, fmt=FMT)


def test_df_from_parquet_with_filter_function(spark, grid_dir):
    """The reference's test_parquet_load.py variant: filter_function is the
    user-supplied per-partition filter — honored here ([REF-BUG] fix), and
    each batch carries the reference's (lon, lat, h) MultiIndex shape so
    index-based reference filters port unmodified."""
    # df_from_parquet does NOT align the window (only df_from_dask floors/
    # ceils — kamodo_dask.py:191-192), so start/end sit on file boundaries
    start = GRID_START
    end = GRID_START + timedelta(minutes=20)

    def custom_filter(pdf, h_range):
        # reference-style: h comes from the MultiIndex, and the function may
        # add/drop scratch columns (kamodo_dask.py:134-147 does exactly this)
        lo, hi = h_range
        pdf = pdf.copy()
        pdf["h_temp"] = pd.to_numeric(pdf.index.get_level_values("h"), errors="coerce")
        out = pdf[pdf["h_temp"].between(lo, hi, inclusive="both")]
        return out.drop(columns=["h_temp"])

    out = compat.df_from_parquet(
        spark, f"{grid_dir}/", start=start, end=end,
        h_start=292500.0, h_end=357500.0, filter_function=custom_filter, fmt=FMT,
    )
    assert sorted(set(out.index.get_level_values("h"))) == [292500.0, 325000.0, 357500.0]


def test_df_from_parquet_accepts_library_filter_partition(spark, grid_dir):
    """compat.filter_partition itself works as filter_function — the exact
    pattern of the reference's test_parquet_load.py:67-68 — and returns the
    same rows as the relational BETWEEN path."""
    start = GRID_START
    end = GRID_START + timedelta(minutes=20)
    via_filter_fn = compat.df_from_parquet(
        spark, f"{grid_dir}/", start=start, end=end,
        h_start=292500.0, h_end=357500.0,
        filter_function=compat.filter_partition, fmt=FMT,
    )
    via_between = compat.df_from_parquet(
        spark, f"{grid_dir}/", start=start, end=end,
        h_start=292500.0, h_end=357500.0, fmt=FMT,
    )
    pd.testing.assert_frame_equal(via_filter_fn, via_between)


def test_filter_partition_both_shapes():
    """Shape tolerance: MultiIndex frames (reference) and column frames."""
    base = pd.DataFrame({"lon": [0.0, 1.0], "lat": [0.0, 0.0],
                         "h": [100.0, 200.0], "v": [1.0, 2.0]})
    by_col = compat.filter_partition(base, h_range=(150.0, 250.0))
    assert by_col["v"].tolist() == [2.0]
    by_idx = compat.filter_partition(
        base.set_index(["lon", "lat", "h"]), h_range=(150.0, 250.0)
    )
    assert by_idx["v"].tolist() == [2.0]


def test_df_from_dask_requires_h_values(spark, grid_dir):
    with pytest.raises(ValueError, match="h_values is required"):
        compat.df_from_dask(
            spark, f"{grid_dir}/",
            start=GRID_START + timedelta(minutes=5),
            end=GRID_START + timedelta(minutes=65),
            h_start=292500.0, h_end=357500.0, fmt=FMT,
        )


def test_df_from_dask_partition_size_sets_split_confs(spark, grid_dir):
    """partition_size (reference kamodo_dask.py:239-244) maps to Spark's
    scan-split and AQE advisory sizing confs instead of a silent no-op."""
    prev_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_adv = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    try:
        compat.df_from_dask(
            spark, f"{grid_dir}/",
            start=GRID_START + timedelta(minutes=5),
            end=GRID_START + timedelta(minutes=65),
            h_start=292500.0, h_end=357500.0, h_values=H,
            partition_size="64MB", fmt=FMT,
        )
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(64 * 10**6)
        assert (
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
            == str(64 * 10**6)
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_max)
        if prev_adv is not None:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_adv)
        else:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_parse_partition_size_forms():
    p = compat._parse_partition_size
    assert p(1024) == 1024
    assert p("128MB") == 128 * 10**6
    assert p("100 MiB") == 100 * 2**20
    assert p("1e8") == 10**8
    assert p("2gb") == 2 * 10**9


def test_kamodo_dask_interpolators(mi_df):
    kd = compat.KamodoDask(mi_df)
    assert kd.units == {"rho": "kg/m^3", "T": "K"}
    assert set(kd.levels) == {"time", "lon", "lat", "h"}

    t_q = (GRID_START + timedelta(minutes=40)).timestamp()
    xvec = np.array([[t_q, 90.0, 0.0, 325000.0]])
    rho_val = kd["rho"](xvec)[0]
    t_val = kd["T"](xvec)[0]
    # independent per-variable interpolators ([REF-BUG] guard)
    assert rho_val < 1e-6 and t_val > 100.0
    assert t_val == pytest.approx(temp_fn(t_q, 90.0, 0.0, 325000.0), rel=1e-6)

    # gridded form: pin time/lat → (lon, h) plane, squeezed
    plane = kd["T_ijkl"](time=t_q, lat=0.0)
    assert plane.shape == (len(LON), 3)
    assert plane[LON.tolist().index(90.0), 1] == pytest.approx(t_val, rel=1e-12)

    # out-of-bounds → fill_value
    assert kd["T"](np.array([[t_q, 90.0, 0.0, 1e9]]))[0] == 0.0

    b = kd.get_bounds()
    assert b["h"] == (292500.0, 357500.0)
    m = kd.get_midpoint()
    assert m["lat"] == pytest.approx(0.0)


def test_kamodo_dask_rejects_sparse_grid(mi_df):
    broken = mi_df.iloc[:-1]  # drop one row → not dense
    with pytest.raises(ValueError, match="not dense"):
        compat.KamodoDask(broken)
