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

def session_schema(key_field: T.StructField) -> T.StructType:
    """Output schema parameterized on the grouping key — the key keeps its
    input name and type (a hardcoded LongType 'user_id' would break Arrow
    conversion for any other key column)."""
    return T.StructType(
        [
            key_field,
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value", T.DoubleType()),
        ]
    )


#: Fixed-shape variant for the catalog's (user_id long) events relation.
SESSION_SCHEMA = session_schema(T.StructField("user_id", T.LongType()))

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
    """Session windows with an inactivity gap over a STREAMING DataFrame.

    Emits one row per CLOSED session (sessions still open at the watermark
    stay in state). Batch DataFrames must use :func:`sessionize_batch`
    instead: in a batch query event-time timeouts never fire and state is
    discarded at the end, so every key's final open session would silently
    vanish — this function raises rather than drop data.
    """
    import pandas as pd

    if not events.isStreaming:
        raise ValueError(
            "sessionize() requires a streaming DataFrame — batch queries "
            "never fire event-time timeouts, silently dropping each key's "
            "final session; use sessionize_batch() for batch relations"
        )

    gap_us = gap_seconds * 1_000_000
    # Arrow hands the UDF NAIVE timestamps in the SESSION timezone, but
    # GroupState.setTimeoutTimestamp compares against the UTC-epoch
    # watermark — localize before converting, or every timeout shifts by
    # the tz offset (west-of-UTC sessions would crash with 'timeout earlier
    # than watermark'). The session tz is captured at plan build.
    tz = events.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")

    def _epoch_ms(local_us: int) -> int:
        stamp = pd.Timestamp(local_us, unit="us").tz_localize(
            tz, ambiguous=True, nonexistent="shift_forward"
        )
        return int(stamp.value // 1_000_000)

    key_field = events.schema[key_col]
    out_schema = session_schema(key_field)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, sv = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )
            return

        # vectorized session assignment: sort once, boundaries where the
        # inter-event gap exceeds the threshold, per-session aggregates via
        # reduceat — no per-row Python (the per-KEY call is the API's cost)
        import numpy as np

        chunks = [
            (
                pdf[ts_col].astype("datetime64[us]").astype("int64").to_numpy(),
                pdf[value_col].to_numpy(dtype="float64"),
            )
            for pdf in pdfs
            if len(pdf)
        ]
        if not chunks:
            if state.exists:
                cur = list(state.get)
                state.update(tuple(cur))
                state.setTimeoutTimestamp(_epoch_ms(cur[1]) + gap_seconds * 1000)
            return
        ts = np.concatenate([c[0] for c in chunks])
        vals = np.concatenate([c[1] for c in chunks])
        order = np.argsort(ts, kind="stable")
        ts, vals = ts[order], vals[order]

        starts = np.concatenate(([0], np.nonzero(np.diff(ts) > gap_us)[0] + 1))
        s_start = ts[starts]
        s_end = ts[np.concatenate((starts[1:] - 1, [len(ts) - 1]))]
        s_n = np.diff(np.concatenate((starts, [len(ts)])))
        s_sum = np.add.reduceat(vals, starts)

        sessions = list(zip(s_start.tolist(), s_end.tolist(), s_n.tolist(), s_sum.tolist()))
        if state.exists:
            # Treat the carried session as one more [start, end, n, sum]
            # interval and coalesce generically below. A one-shot "merge
            # carried into the first in-batch session" is wrong twice over:
            # (a) the extended end can bridge an in-batch gap (carried
            # [0,100], gap 10, batch [95,108] → ONE session [0,108], not a
            # closed [0,100] plus [108,108]); (b) a late event EARLIER than
            # the carried start must compare against the carried START, not
            # its end (carried [100,200], batch [85], gap 10 → two
            # sessions). Sorting by start and chaining neighbor checks
            # handles both, including multi-session cascades.
            sessions.append(tuple(state.get))
            sessions.sort(key=lambda r: (r[0], r[1]))
        coalesced: list[tuple] = []
        for s in sessions:
            if coalesced and s[0] - coalesced[-1][1] <= gap_us:
                p = coalesced[-1]
                coalesced[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                coalesced.append(tuple(s))
        *closed, cur = coalesced
        if closed:
            yield pd.DataFrame(
                {
                    key_col: user_id,
                    "session_start": [pd.Timestamp(r[0], unit="us") for r in closed],
                    "session_end": [pd.Timestamp(r[1], unit="us") for r in closed],
                    "n_events": [int(r[2]) for r in closed],
                    "sum_value": [float(r[3]) for r in closed],
                }
            )
        state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
        state.setTimeoutTimestamp(_epoch_ms(int(cur[1])) + gap_seconds * 1000)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
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
