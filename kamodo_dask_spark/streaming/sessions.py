"""Custom stateful streaming operator: event sessionization.

The reference has no stateful streaming at all (SURVEY §2.9) — this is the
engine's demonstration of the Spark-native custom-operator path the grid
pipeline doesn't need: ``applyInPandasWithState`` with per-key timeout-driven
state. Sessions close when a key sees no events for ``gap`` seconds; each
emitted row is one completed session.

State per user is O(1) (count/sum/bounds), watermark-advanced timeouts evict
idle keys — bounded memory on an unbounded stream at any key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows with an inactivity gap over a streaming DataFrame.

    Emits one row per CLOSED session (sessions still open at the watermark
    stay in state). Batch DataFrames work too (all sessions flush at end).
    """
    import pandas as pd

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return

        rows = []
        cur = state.get if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for ts, val in zip(
                pdf[ts_col].astype("datetime64[us]").astype("int64"), pdf[value_col]
            ):
                if cur is None:
                    cur = [ts, ts, 0, 0.0]
                elif ts - cur[1] > gap_us:
                    rows.append(cur)
                    cur = [ts, ts, 0, 0.0]
                cur[1] = max(cur[1], ts)
                cur[2] += 1
                cur[3] += float(val)
        out = pd.DataFrame(
            {
                "user_id": user_id,
                "session_start": [pd.Timestamp(r[0], unit="us") for r in rows],
                "session_end": [pd.Timestamp(r[1], unit="us") for r in rows],
                "n_events": [r[2] for r in rows],
                "sum_value": [r[3] for r in rows],
            }
        )
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        if len(out):
            yield out

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization — same semantics, pure DataFrame ops: a session
    break is a gap > gap_seconds between consecutive events per key; the
    session id is a running count of breaks. Two window passes, one shuffle.
    Serves as the oracle for the streaming operator (and is SQL-expressible).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_break = (prev.isNull() | ((us - prev) > gap_seconds * 1_000_000)).cast("long")
    with_sess = events.withColumn(
        "_sess", F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sess.groupBy(key_col, "_sess").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(value_col).alias("sum_value"),
    ).drop("_sess")
