"""Structured Streaming ingestion: file source, windowed stats with
watermark, foreachBatch slab refresh. Uses Trigger.AvailableNow + memory
sinks so tests are hermetic and fast."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F, types as T

from kamodo_dask_spark.streaming import SlabRefresher, stream_grid_files, stream_windowed_stats

from tests.conftest import GRID_START, MISSING_INDEX, N_FILES, LON, LAT, H, temp_fn

GRID_SCHEMA = T.StructType(
    [
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("h", T.DoubleType()),
        T.StructField("rho[kg/m^3]", T.DoubleType()),
        T.StructField("T[K]", T.DoubleType()),
    ]
)


def test_stream_grid_files_windowed(spark, grid_dir):
    stream = stream_grid_files(spark, grid_dir, GRID_SCHEMA)
    assert stream.isStreaming
    stats = stream_windowed_stats(stream, ts_col="time", window="10 minutes",
                                  watermark="20 minutes", measures=["T[K]"])
    q = (
        stats.writeStream.format("memory")
        .queryName("grid_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM grid_stats").collect()
    # Append mode emits only FINALIZED windows: watermark = max event time
    # (02:00) − 20 min = 01:40, so windows ending ≤ 01:40 flush (starts
    # 00:00..01:30 → 10) and the trailing 3 stay open as in-flight state.
    # One mid-range file is missing → 9 emitted windows.
    finalized = [
        GRID_START + timedelta(minutes=10 * i)
        for i in range(N_FILES - 3)
        if i != MISSING_INDEX
    ]
    by_start = {r["window_start"]: r for r in out}
    assert sorted(by_start) == finalized
    missing_ts = GRID_START + timedelta(minutes=10 * MISSING_INDEX)
    assert missing_ts not in by_start
    # every emitted window holds exactly one dense spatial snapshot
    for r in out:
        assert r["n_rows"] == len(LON) * len(LAT) * len(H)
        assert r["min_T[K]"] is not None


def test_slab_refresher_foreachbatch(spark, grid_dir, tmp_path):
    """End-to-end streaming interpolator refresh: stream files → slab store →
    rebuilt registry answers the flagship query with correct values."""
    from kamodo_dask_spark.grid.model import normalize_measure_columns

    stream = stream_grid_files(spark, grid_dir, GRID_SCHEMA)
    refresher = SlabRefresher(str(tmp_path / "slab_store"))
    q = (
        stream.transform(normalize_measure_columns)
        .writeStream.foreachBatch(refresher)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    reg = refresher.current()
    assert reg is not None
    assert refresher.batches_seen >= 1
    assert set(reg.measures) == {"rho", "T"}
    # 12 timestamps ingested (one file missing)
    assert reg.shape[0] == N_FILES - 1

    t_query = (GRID_START + timedelta(minutes=40)).timestamp()
    pts = spark.createDataFrame(
        [(0, t_query, 90.0, 0.0, 325000.0)],
        "point_id long, time double, lon double, lat double, h double",
    )
    got = reg["T"](pts).collect()[0]["T"]
    assert got == pytest.approx(temp_fn(t_query, 90.0, 0.0, 325000.0), rel=1e-6)
