"""Stateful streaming sessionization vs the batch-window oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamodo_dask_spark.sources.parquet import read_events
from kamodo_dask_spark.streaming.sessions import sessionize, sessionize_batch


@pytest.fixture(scope="module")
def events_us(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("events_us_sessions"))
    read_events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(src)
    return src


def _key(r):
    return (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
            round(r["sum_value"], 6))


def test_batch_sessionize_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),   # same session (gap 600 <= 1800)
        (1, "2024-01-01 02:00:00", 3.0),   # new session
        (2, "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = sessionize_batch(df, gap_seconds=1800)
    got = sorted((r["user_id"], r["n_events"], r["sum_value"]) for r in out.collect())
    assert got == [(1, 1, 3.0), (1, 2, 3.0), (2, 1, 5.0)]


def test_carried_state_bridges_in_batch_gap(spark, tmp_path):
    """Regression: a carried session whose end bridges an in-batch gap must
    coalesce with the next in-batch session, matching the batch oracle.

    Batch 1 builds carried state [0s, 100s]; batch 2 delivers [95s, 108s].
    In-batch alone, 95→108 exceeds the 10s gap — but the carried end (100)
    bridges it, so the whole thing is ONE session [0, 108]. The old one-shot
    merge emitted a wrong closed [0, 100] plus a spurious [108, 108].
    Sentinel batches advance the watermark and fire timeouts so every real
    session flushes; the flushed set must equal the oracle exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000 * 1_000_000  # arbitrary epoch anchor

    def write_batch(name, mtime, secs, user=1):
        t = pa.table(
            {
                "user_id": pa.array([user] * len(secs), pa.int64()),
                "ts": pa.array(
                    np.array([base_us + s * 1_000_000 for s in secs], dtype="int64")
                ).cast(pa.timestamp("us")),
                "value": pa.array([1.0] * len(secs), pa.float64()),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(t, p)
        import os

        os.utime(p, (mtime, mtime))
        return p

    batch1 = list(range(0, 101, 10))  # chained 10s steps → one session [0,100]
    batch2 = [95, 108]
    write_batch("00_b1.parquet", 1_000, batch1)
    write_batch("01_b2.parquet", 2_000, batch2)
    # two far-future sentinel batches: advance watermark, then fire timeouts
    write_batch("02_s1.parquet", 3_000, [10 * 86_400], user=-1)
    write_batch("03_s2.parquet", 4_000, [20 * 86_400], user=-1)

    ev_schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    sess = sessionize(stream, gap_seconds=10, watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("bridge_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(
        _key(r)
        for r in spark.sql("SELECT * FROM bridge_out WHERE user_id >= 0").collect()
    )

    all_events = [(1, s) for s in batch1 + batch2]
    df = spark.createDataFrame(
        [(u, (base_us + s * 1_000_000), 1.0) for u, s in all_events],
        "user_id long, ts_us long, value double",
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "value")
    oracle = sorted(_key(r) for r in sessionize_batch(df, gap_seconds=10).collect())
    assert streamed == oracle
    assert len(streamed) == 1 and streamed[0][3] == len(batch1) + len(batch2)


def test_carried_state_no_merge_before_start(spark, tmp_path):
    """Regression: a late event EARLIER than the carried session's start must
    compare against the carried START (not its end). Carried [100, 200],
    batch [85], gap 10 → two sessions; the old end-based check merged them."""
    import numpy as np
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000 * 1_000_000

    def write_batch(name, mtime, secs, user=1):
        t = pa.table(
            {
                "user_id": pa.array([user] * len(secs), pa.int64()),
                "ts": pa.array(
                    np.array([base_us + s * 1_000_000 for s in secs], dtype="int64")
                ).cast(pa.timestamp("us")),
                "value": pa.array([1.0] * len(secs), pa.float64()),
            }
        )
        p = str(tmp_path / name)
        pq.write_table(t, p)
        os.utime(p, (mtime, mtime))

    batch1 = list(range(100, 201, 10))  # carried [100, 200]
    batch2 = [85]  # 100 - 85 = 15 > gap → must NOT merge
    write_batch("00_b1.parquet", 1_000, batch1)
    write_batch("01_b2.parquet", 2_000, batch2)
    write_batch("02_s1.parquet", 3_000, [10 * 86_400], user=-1)
    write_batch("03_s2.parquet", 4_000, [20 * 86_400], user=-1)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    sess = sessionize(stream, gap_seconds=10, watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("nomerge_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = sorted(
        _key(r)
        for r in spark.sql("SELECT * FROM nomerge_out WHERE user_id >= 0").collect()
    )

    df = spark.createDataFrame(
        [(1, base_us + s * 1_000_000, 1.0) for s in batch1 + batch2],
        "user_id long, ts_us long, value double",
    ).select("user_id", F.timestamp_micros("ts_us").alias("ts"), "value")
    oracle = sorted(_key(r) for r in sessionize_batch(df, gap_seconds=10).collect())
    assert streamed == oracle
    assert len(streamed) == 2  # [85,85] and [100,200]


def test_streaming_sessions_match_batch(spark, events_us):
    """applyInPandasWithState over the events stream emits exactly the closed
    sessions the batch-window oracle computes (open tail sessions — held in
    state at the watermark — are the expected difference)."""
    ev = spark.read.parquet(events_us)
    batch = {_key(r) for r in sessionize_batch(ev, gap_seconds=3600).collect()}

    stream = spark.readStream.schema(ev.schema).parquet(events_us)
    sess = sessionize(stream, gap_seconds=3600, watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {_key(r) for r in spark.sql("SELECT * FROM sessions_out").collect()}

    # every emitted (closed) session is a real batch session
    assert streamed <= batch
    # and the stream closed nearly all of them (only per-user tail sessions
    # near the end of data can stay open)
    assert len(streamed) >= 0.8 * len(batch)
    assert len(streamed) > 50
