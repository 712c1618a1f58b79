"""Sequential-pattern (funnel) analysis over event streams.

The query class product analytics calls a FUNNEL and SQL:2016 calls
``MATCH_RECOGNIZE``: per entity, did an ordered chain of event types occur,
and when? Neither Spark SQL nor the reference has the primitive; this
expresses the standard greedy-earliest semantics as plain relational
algebra, one aggregation per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    steps: "list[str]",
    window_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy-earliest funnel: per ``user_col``, ``t_1`` is the earliest
    ``steps[0]`` event, and each ``t_{i+1}`` is the earliest ``steps[i+1]``
    event STRICTLY after ``t_i``; the user CONVERTED iff the chain
    completes with ``t_k − t_1 ≤ window_us``. Greedy-earliest is the
    deterministic, engine-portable semantics most funnel tools implement
    (an exists-any-chain variant would need per-user backtracking); the
    strict ``>`` makes simultaneous events non-chainable, documented
    rather than accidental.

    Returns one row per user who reached step 1:
    ``(user_col, t1..tk bigint µs — NULL once the chain breaks,
    converted boolean)``.

    100 TB shape: the (user, µs, type) projection is checkpointed once
    (events scanned ONCE however many steps follow); each step is then one
    hash join on the user key against the previous step's per-user
    aggregate (both sides keyed on the user — AQE broadcasts the
    aggregate side when small) plus a partial-combined min. k−1 joins of
    strictly shrinking relations, no windows, no per-user event arrays
    (a skewed power-user costs nothing beyond their event count in the
    filters). Timestamps compare as exact integer microseconds.
    """
    if len(steps) < 2:
        raise ValueError(f"need at least 2 steps, got {len(steps)}")
    if window_us <= 0:
        raise ValueError(f"window_us must be positive, got {window_us}")
    e = events.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_ts"),
        F.col(type_col).alias("_ty"),
    ).localCheckpoint(eager=True)
    cur = (
        e.filter(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        nxt = (
            e.filter(F.col("_ty") == step)
            .join(cur.select("_u", F.col(prev).alias("_prev")), "_u")
            .filter(F.col("_ts") > F.col("_prev"))
            .groupBy("_u")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        cur = cur.join(nxt, "_u", "left")
    last = f"t{len(steps)}"
    return cur.select(
        F.col("_u").alias(user_col),
        *[f"t{i}" for i in range(1, len(steps) + 1)],
        F.coalesce(
            F.col(last) - F.col("t1") <= F.lit(int(window_us)), F.lit(False)
        ).alias("converted"),
    )
