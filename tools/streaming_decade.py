"""Streaming-family scaling decade (judge r13 ask #3): measure PER-COMMIT
wall vs BATCH COUNT at fixed delta size for the five CommittedState-backed
foreachBatch entries. The 100 TB claim under test — "per commit, work
proportional to the delta plus one summary-sized merge" (COVERAGE.md
streaming section) — predicts per-commit cost that is FLAT in the number
of batches already folded: the state is a bounded summary (an agg view, a
slots-keyed HLL relation, k Misra-Gries counters, an O(1/eps) GK summary,
a <=2k-row KMV sketch), so batch #40 must cost what batch #4 cost.

Two configurations per family, same per-batch delta:

- sf0.1 events split into  4 chunks (the entries' own shape), and
- sf1   events split into 40 chunks (10x rows -> 10x batches, per-batch
  rows CONSTANT; fixtures from tools/gen_sf1.py).

The folds are the ENTRIES' folds (bodies mirrored verbatim from
kamodo_dask_spark/queries.py — streaming_view_maintenance:5867,
streaming_dau_sketch:6938, streaming_heavy_hitters:8103,
streaming_quantile_sketch:8218, streaming_theta_sketch:8304 — with a
timing wrapper and the chunk count as a parameter; sources, state DDLs,
triggers, and shuffle-partition conf identical). Reported per family:

- per-batch fold walls for every commit (raw, in the JSON artifact),
- mean per-commit wall EXCLUDING batch 0 (codegen warmup) per config,
- the cross-config per-commit ratio (claim: ~1.0, i.e. slope ~0), and
- within-run growth: mean of the last half of the 40-batch run over the
  mean of its first half (claim: ~1.0 — no growth with history), and
- final state rows (claim: pinned at the summary size, independent of
  batch count).

Usage: python tools/streaming_decade.py [family ...]
       writes /tmp/streaming_decade.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF01_DIR = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SF1_DIR", "/tmp/sf1")
SCRATCH = "/tmp/kds_streaming_decade"

CONFIGS = [("sf0.1_4batches", SF01_DIR, 4), ("sf1_40batches", SF1_DIR, 40)]


def _families():
    """family -> (prep, schema, ddl, scalar_names, fold_factory).

    prep(spark, sf_dir) returns (df_with_event_id_key, cols) — the
    chunk split key is always the entries' coalesce(event_id, 0) (or id
    for theta), applied here so each config splits the SAME relation the
    entry streams.
    """
    from pyspark.sql import functions as F

    from kamodo_dask_spark.operators.maintenance import merge_agg_view
    from kamodo_dask_spark.operators.profile import (
        compress_summary,
        kmv_merge,
        kmv_sketch,
        quantile_summary,
    )
    from kamodo_dask_spark.queries import _THETA_K, _theta_members, read_table

    def prep_ivm(spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        return ev, ["event_type", "day", "cents"]

    def fold_ivm(st, walls):
        def fold(batch_df, batch_id):
            t0 = time.perf_counter()
            view, _ = st.ensure(batch_id)
            st.commit(
                batch_id,
                merge_agg_view(
                    view,
                    batch_df,
                    ["event_type", "day"],
                    counts=["n"],
                    sums={"cents": "cents"},
                    maxs={"max_cents": "cents"},
                ),
            )
            walls.append(round(time.perf_counter() - t0, 3))

        return fold

    def prep_dau(spark, sf_dir):
        ev = (
            read_table(spark, sf_dir, "events")
            .filter(
                (F.col("event_type") == "purchase")
                & F.col("user_id").isNotNull()
                & F.col("ts").isNotNull()
            )
            .select(
                "event_id",
                "user_id",
                F.expr("unix_micros(ts) div 86400000000").alias("day"),
            )
        )
        return ev, ["user_id", "day"]

    def fold_dau(st, walls):
        def fold(batch_df, batch_id):
            t0 = time.perf_counter()
            sk = batch_df.groupBy("day").agg(
                F.hll_sketch_agg("user_id", F.lit(14)).alias("_sk")
            )
            cur, _ = st.ensure(batch_id)
            st.commit(
                batch_id,
                cur.unionByName(sk)
                .groupBy("day")
                .agg(F.hll_union_agg("_sk").alias("_sk")),
            )
            walls.append(round(time.perf_counter() - t0, 3))

        return fold

    def prep_mg(spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").filter(
            F.col("user_id").isNotNull()
        )
        keyed = ev.select(
            "event_id",
            F.when(
                F.col("user_id") % 20 < 8,
                F.concat(F.lit("h"), (F.col("user_id") % 3).cast("string")),
            )
            .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
            .alias("key"),
        )
        return keyed, ["key"]

    def fold_mg(st, walls):
        K_COUNTERS = 64

        def fold(batch_df, batch_id):
            t0 = time.perf_counter()
            bc = batch_df.groupBy("key").agg(
                F.count("*").cast("bigint").alias("est")
            )
            cur, scalars = st.ensure(batch_id)
            merged = (
                cur.unionByName(bc)
                .groupBy("key")
                .agg(F.sum("est").cast("bigint").alias("est"))
                .localCheckpoint(eager=True)
            )
            d_total = int(scalars["d"])
            top = merged.orderBy(F.col("est").desc(), "key").limit(
                K_COUNTERS + 1
            ).collect()
            if len(top) > K_COUNTERS:
                m = int(top[-1]["est"])
                d_total += m
                merged = merged.filter(F.col("est") > m).select(
                    "key", (F.col("est") - m).alias("est")
                )
            st.commit(batch_id, merged, d=d_total)
            walls.append(round(time.perf_counter() - t0, 3))

        return fold

    def prep_gk(spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").filter(
            F.col("value").isNotNull()
        )
        cents = ev.select(
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("c"),
        )
        return cents, ["c"]

    def fold_gk(st, walls):
        def fold(batch_df, batch_id):
            t0 = time.perf_counter()
            bs = quantile_summary(batch_df, "c", eps=0.01)
            if batch_id == 0:
                st.commit(batch_id, bs)
            else:
                cur, _ = st.ensure(batch_id)
                st.commit(
                    batch_id,
                    compress_summary(cur.unionByName(bs), "c", eps=0.005),
                )
            walls.append(round(time.perf_counter() - t0, 3))

        return fold

    def prep_theta(spark, sf_dir):
        ev = read_table(spark, sf_dir, "events").filter(
            F.col("event_id").isNotNull()
        )
        members = _theta_members(ev).withColumnRenamed("id", "event_id")
        return members, ["event_id", "seg"]

    def fold_theta(st, walls):
        def fold(batch_df, batch_id):
            t0 = time.perf_counter()
            bs = kmv_sketch(
                batch_df.withColumnRenamed("event_id", "id"),
                "id",
                k=_THETA_K,
                by=["seg"],
            )
            if batch_id == 0:
                st.commit(batch_id, bs)
            else:
                cur, _ = st.ensure(batch_id)
                st.commit(
                    batch_id,
                    kmv_merge(cur.unionByName(bs), _THETA_K, ["seg"]),
                )
            walls.append(round(time.perf_counter() - t0, 3))

        return fold

    return {
        "streaming_view_maintenance": (
            prep_ivm,
            "event_type string, day long, cents long",
            "event_type string, day long, n long, cents long, max_cents long",
            (),
            fold_ivm,
        ),
        "streaming_dau_sketch": (
            prep_dau,
            "user_id long, day long",
            "day long, _sk binary",
            (),
            fold_dau,
        ),
        "streaming_heavy_hitters": (
            prep_mg,
            "key string",
            "key string, est long",
            ("d",),
            fold_mg,
        ),
        "streaming_quantile_sketch": (
            prep_gk,
            "c bigint",
            "c bigint, _w long, _err long, _n long",
            (),
            fold_gk,
        ),
        "streaming_theta_sketch": (
            prep_theta,
            "event_id bigint, seg string",
            "seg string, _h bigint",
            (),
            fold_theta,
        ),
    }


def main() -> None:
    from pyspark.sql import functions as F

    from kamodo_dask_spark.queries import (
        STREAM_STATE_PARTITIONS,
        _ephemeral_checkpoint,
        _write_stream_chunks,
    )
    from kamodo_dask_spark.session import get_spark, scoped_conf
    from kamodo_dask_spark.streaming.state import CommittedState

    fams = _families()
    names = sys.argv[1:] or list(fams)
    spark = get_spark(
        "streaming-decade",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: "dict[str, dict]" = {}
    for name in names:
        prep, schema, ddl, scalar_names, fold_factory = fams[name]
        fam: "dict[str, dict]" = {}
        for label, sf_dir, n_chunks in CONFIGS:
            scratch = f"{SCRATCH}/{name}/{label}"
            shutil.rmtree(scratch, ignore_errors=True)
            df, cols = prep(spark, sf_dir)
            key = cols[0] if "event_id" not in df.columns else "event_id"
            chunk = F.pmod(
                F.coalesce(F.col(key), F.lit(0)), F.lit(n_chunks)
            )
            src_glob = _write_stream_chunks(
                df, chunk, f"{scratch}/chunks", cols=cols
            )
            st = CommittedState(
                spark, f"{scratch}/state", ddl, scalar_names=scalar_names
            )
            st.reset()
            walls: "list[float]" = []
            fold = fold_factory(st, walls)
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src_glob)
            )
            t0 = time.perf_counter()
            with scoped_conf(
                spark,
                **{"spark.sql.shuffle.partitions": STREAM_STATE_PARTITIONS},
            ):
                with _ephemeral_checkpoint() as ckpt:
                    q = (
                        stream.writeStream.foreachBatch(fold)
                        .queryName(f"decade_{name}_{label}")
                        .option("checkpointLocation", ckpt)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
            total = round(time.perf_counter() - t0, 2)
            state_rows = st.state()[0].count()
            warm = walls[1:] or walls
            half = len(walls) // 2
            fam[label] = {
                "n_batches": len(walls),
                "per_batch_walls": walls,
                "mean_per_commit_warm": round(sum(warm) / len(warm), 3),
                "late_over_early_half": (
                    round(
                        (sum(walls[half:]) / max(1, len(walls[half:])))
                        / (sum(walls[:half]) / max(1, len(walls[:half]))),
                        2,
                    )
                    if half
                    else None
                ),
                "total_wall": total,
                "state_rows": state_rows,
            }
            print(
                f"{name:30s} {label:16s} batches={len(walls):3d} "
                f"mean_warm={fam[label]['mean_per_commit_warm']:6.3f}s "
                f"late/early={fam[label]['late_over_early_half']} "
                f"state_rows={state_rows}",
                flush=True,
            )
        r = (
            fam["sf1_40batches"]["mean_per_commit_warm"]
            / fam["sf0.1_4batches"]["mean_per_commit_warm"]
        )
        fam["per_commit_ratio_40_over_4"] = round(r, 2)
        results[name] = fam
        print(f"{name:30s} per-commit ratio (40b/4b) = {r:.2f}", flush=True)

    try:
        results["_loadavg_15m"] = round(os.getloadavg()[2], 1)
    except OSError:
        pass
    with open("/tmp/streaming_decade.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("written /tmp/streaming_decade.json")


if __name__ == "__main__":
    main()
