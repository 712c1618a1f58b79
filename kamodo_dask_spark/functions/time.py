"""Time scalar functions (SURVEY §2.6, C4-C9).

Reference usages: ``Timestamp.floor/ceil('10T')`` for window alignment
(kamodo_dask.py:191-192), ``pd.date_range(freq='10T')`` for slot generation
(kamodo_dask.py:63-67,82), ns-epoch→seconds for the time axis
(kamodo_dask.py:309). All Spark equivalents here are built-in expressions —
JVM-side, codegen'd, pushdown-friendly.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def floor_timestamp(col, seconds: int = 600) -> Column:
    """Floor a timestamp column to a fixed bucket (default 10 min)."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / seconds) * seconds)


def ceil_timestamp(col, seconds: int = 600) -> Column:
    """Ceil a timestamp column to a fixed bucket (default 10 min).

    Works at µs precision: ``unix_timestamp`` TRUNCATES to whole seconds,
    which would floor a fractional timestamp sitting just past an exact
    bucket boundary (00:10:00.5 → 00:10:00 instead of 00:20:00)."""
    c = col if isinstance(col, Column) else F.col(col)
    us = seconds * 1_000_000
    return F.timestamp_micros(-F.floor(-F.unix_micros(c) / us).cast("long") * us)


def epoch_seconds(col) -> Column:
    """Timestamp → float64 epoch seconds (reference ``v.value/1e9``,
    kamodo_dask.py:309; Spark timestamps are µs so this is µs/1e6)."""
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("double")


def floor_datetime(ts: datetime, freq: timedelta) -> datetime:
    """Driver-side floor of a datetime to a frequency boundary (epoch-anchored,
    timezone-safe for both naive and aware datetimes)."""
    anchor = datetime(1970, 1, 1, tzinfo=ts.tzinfo)
    sec = freq.total_seconds()
    e = (ts - anchor).total_seconds()
    return anchor + timedelta(seconds=(e // sec) * sec)


def ceil_datetime(ts: datetime, freq: timedelta) -> datetime:
    anchor = datetime(1970, 1, 1, tzinfo=ts.tzinfo)
    sec = freq.total_seconds()
    q, r = divmod((ts - anchor).total_seconds(), sec)
    return anchor + timedelta(seconds=(q + (1 if r else 0)) * sec)


def time_slots(
    spark: SparkSession, start: str | datetime, end: str | datetime, minutes: int = 10
) -> DataFrame:
    """Dense timestamp axis: one row per ``minutes``-step in [start, end]
    (C7; ``pd.date_range``, kamodo_dask.py:65,82). ``sequence`` + ``explode``
    — generated distributed, no driver loop."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {minutes} MINUTES"),
            )
        ).alias("slot")
    )
