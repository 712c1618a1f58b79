"""A/B probe: integer-axis-index cell join keys vs legacy double node-value
keys, same session, same 20M-row slab (SMJ regime on local[32]).

Measures (1) build+persist wall for each relation flavor and (2) per-query
wall for a 1M-point lookup, 3 reps each, so the Sort-elision claim in
`build_cell_relation` is backed by a same-host A/B rather than
cross-session absolute walls (host load drifts 1.4-2x between runs).

Run:  python tools/probe_cell_intkeys.py [dim1 dim2 dim3 dim4]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kamodo_dask_spark.grid import interpolate as interp_mod
from kamodo_dask_spark.grid.interpolate import (
    build_cell_relation,
    interpolate_points_cells,
)
from kamodo_dask_spark.session import get_spark

AXES = ("x1", "x2", "x3", "x4")


def synthetic_slab(spark, dims):
    d2, d3, d4 = dims[1], dims[2], dims[3]
    n = int(np.prod(dims))
    return (
        spark.range(0, n, 1, 32)
        .select(
            ((F.col("id") / (d2 * d3 * d4)).cast("long") % dims[0]).cast("double").alias("x1"),
            ((F.col("id") / (d3 * d4)).cast("long") % d2).cast("double").alias("x2"),
            ((F.col("id") / d4).cast("long") % d3).cast("double").alias("x3"),
            (F.col("id") % d4).cast("double").alias("x4"),
        )
        .withColumn("val", F.col("x1") + 2 * F.col("x2") + 3 * F.col("x3") + 4 * F.col("x4"))
    )


def main():
    dims = tuple(int(a) for a in sys.argv[1:5]) or (100, 100, 50, 40)
    spark = get_spark(
        "cell-ab", master="local[32]", extra_conf={"spark.driver.memory": "64g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    arrays = {ax: np.arange(float(dims[i])) for i, ax in enumerate(AXES)}
    grid = synthetic_slab(spark, dims)
    pts = spark.range(0, 1_000_000, 1, 32).select(
        F.col("id").alias("point_id"),
        ((F.col("id") % 479) * (dims[0] - 1) / 479.0).alias("x1"),
        ((F.col("id") % 467) * (dims[1] - 1) / 467.0).alias("x2"),
        ((F.col("id") % 389) * (dims[2] - 1) / 389.0).alias("x3"),
        ((F.col("id") % 107) * (dims[3] - 1) / 107.0).alias("x4"),
    )

    results = {}
    lit_max = interp_mod._LITERAL_AXIS_MAX
    for flavor in ("intkey", "doublekey"):
        interp_mod._LITERAL_AXIS_MAX = lit_max if flavor == "intkey" else 0
        t0 = time.perf_counter()
        cells = build_cell_relation(grid, AXES, ["val"], axis_arrays=arrays).persist()
        n_cells = cells.count()
        t_build = time.perf_counter() - t0
        interp_mod._LITERAL_AXIS_MAX = lit_max  # points snap JVM-side either way
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            interpolate_points_cells(
                None, pts, AXES, ["val"], axis_arrays=arrays, cells=cells
            ).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 2))
        cells.unpersist(blocking=True)
        results[flavor] = (round(t_build, 1), walls)
        print(
            f"{flavor}: build+persist {t_build:.1f} s ({n_cells:,} cells); "
            f"1M-pt query walls {walls}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
