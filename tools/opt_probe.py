"""Per-entry optimization probe (round 14): times a subset of catalog
entries with EXACTLY the bench methodology (noop sink, per-run job group,
statusTracker job count, best-of-N) so an optimization loop can iterate
on one entry without paying a full catalog run. Optionally dumps
``explain("formatted")`` to plans/$PROBE_PLANS_DIR/<entry>_<tag>.txt
(default plans/r15).

Usage:
    python tools/opt_probe.py entry1 entry2 ...
    PROBE_RUNS=4 PROBE_EXPLAIN=before python tools/opt_probe.py entry1
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from kamodo_dask_spark.queries import QUERIES  # noqa: E402
from kamodo_dask_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown entries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROBE_RUNS", "3"))
    explain_tag = os.environ.get("PROBE_EXPLAIN", "")

    spark = get_spark("kamodo-dask-spark-opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM/codegen + the Python worker pool
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import pandas as _pd  # noqa: F401

    def _ident(it):
        for pdf in it:
            yield pdf

    (
        spark.range(0, 10_000, 1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .mapInPandas(_ident, "id long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    tracker = spark.sparkContext.statusTracker()
    out: dict[str, dict] = {}
    import gc

    for name in names:
        fn = QUERIES[name]
        if explain_tag:
            plans_dir = os.environ.get("PROBE_PLANS_DIR", "r15")
            os.makedirs(os.path.join(_REPO, "plans", plans_dir), exist_ok=True)
            df = fn(spark, sf_dir)
            with open(
                os.path.join(
                    _REPO, "plans", plans_dir, f"{name}_{explain_tag}.txt"
                ),
                "w",
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        best, all_runs, jobs = float("inf"), [], 0
        for i in range(runs):
            gid = f"probe:{name}:{i}"
            spark.sparkContext.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            all_runs.append(round(t, 3))
            best = min(best, t)
            jobs = max(jobs, len(tracker.getJobIdsForGroup(gid)))
            gc.collect()
        out[name] = {"best": round(best, 3), "runs": all_runs, "jobs": jobs}
        print(f"{name}: best={best:.3f}s jobs={jobs} runs={all_runs}", flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
