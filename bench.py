"""Benchmark harness: runs the headline query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (no driver collect — the
timing measures the distributed plan, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kamodo_dask_spark.queries import QUERIES
from kamodo_dask_spark.session import get_spark

#: Queries timed by the benchmark (the full catalog; each forces a full
#: execution of its operator family).
BENCH_QUERIES = list(QUERIES)


def run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kamodo-dask-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on a trivial action (not counted).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "catalog_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }


if __name__ == "__main__":
    print(json.dumps(run()))
