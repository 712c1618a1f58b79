"""Touched-components probe for cc_incremental (judge r10 ask #4's
"work proportional to touched components" criterion).

A stored view of V vertices in V/2 two-vertex components absorbs a
delta that merges T component pairs (touching 2T components). The
incremental path's iterative work runs on the 2T-sized super-edge
graph; the view contributes two scans (endpoint lookup, remap) and
zero shuffles. Expectation: wall is flat-ish in T until the contracted
subgraph dominates; a full-touch delta approaches the cost of the
from-scratch recompute it replaces.

Run AFTER a quiet-host check; results go to SCALE.md round 11.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F  # noqa: E402

from kamodo_dask_spark.operators.dedup import (  # noqa: E402
    cc_incremental,
    connected_components,
)
from kamodo_dask_spark.session import get_spark  # noqa: E402

V = 2_000_000  # vertices in the stored view
spark = get_spark("probe-cc-incr", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")

# stored view: vertex 2i and 2i+1 share component 2i
ids = spark.range(V // 2).select((F.col("id") * 2).alias("v"))
view = (
    ids.select(F.col("v").alias("vertex"), F.col("v").alias("component"))
    .unionByName(
        ids.select((F.col("v") + 1).alias("vertex"), F.col("v").alias("component"))
    )
    .repartition(32)
    .localCheckpoint(eager=True)
)
print("view rows:", view.count())

for touched_pairs in (10, 1_000, 100_000, V // 4):
    # delta edge (4i+1, 4i+2) merges component 4i with 4i+2
    d = (
        spark.range(touched_pairs)
        .select(
            (F.col("id") * 4 + 1).alias("id_a"),
            (F.col("id") * 4 + 2).alias("id_b"),
        )
        .localCheckpoint(eager=True)
    )
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        out = cc_incremental(view, d)
        n = out.count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"touched_pairs={touched_pairs:>8} rows={n} best={best:.2f}s")

# reference point: full recompute over view-implied edges + delta
edges = (
    ids.select(F.col("v").alias("id_a"), (F.col("v") + 1).alias("id_b"))
    .unionByName(
        spark.range(V // 4).select(
            (F.col("id") * 4 + 1).alias("id_a"),
            (F.col("id") * 4 + 2).alias("id_b"),
        )
    )
    .localCheckpoint(eager=True)
)
t0 = time.monotonic()
n = connected_components(edges).count()
print(f"full recompute rows={n} wall={time.monotonic() - t0:.2f}s")
spark.stop()
