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
