"""Bucketed layout: the pre-shuffled storage path for repeated fact-fact
joins and aggregations (sources/bucketing.py).

The assertions here are *plan* assertions: the point of bucketing is that the
executed plan contains no Exchange (shuffle) for joins/aggs on the bucket
key. Results are cross-checked against the plain (shuffling) formulation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamodo_dask_spark.plans.checks import executed_plan
from kamodo_dask_spark.sources.bucketing import (
    bucketed_table,
    is_bucketed,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # repartition by the bucket key with numPartitions == numBuckets: Spark's
    # repartition hash == bucket hash (both pmod(murmur3, n)), so each write
    # task holds exactly one bucket -> ONE file per bucket -> the read-side
    # sort order is usable and the SMJ skips its Sort.
    write_bucketed(
        orders.repartition(8, "o_orderkey"),
        "b_orders", "o_orderkey", 8, path=str(root / "orders"),
    )
    write_bucketed(
        lineitem.repartition(8, "l_orderkey"),
        "b_lineitem", "l_orderkey", 8, path=str(root / "lineitem"),
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_spec_recorded(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    assert is_bucketed(spark, t_orders)
    assert is_bucketed(spark, t_lineitem)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables, no_broadcast):
    t_orders, t_lineitem = bucketed_tables
    joined = bucketed_table(spark, t_orders).join(
        bucketed_table(spark, t_lineitem),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    agg = joined.groupBy("o_orderkey").agg(
        F.sum("l_extendedprice").alias("revenue")
    )
    agg.collect()
    plan = executed_plan(agg)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

    # same query over the raw parquet MUST shuffle — proves the assertion has
    # teeth (the no-Exchange result comes from bucketing, not the data size)
    raw = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    raw.collect()
    assert "Exchange" in executed_plan(raw)

    # value parity with the shuffling plan
    got = {r.o_orderkey: round(r.revenue, 2) for r in agg.collect()}
    want = {r.o_orderkey: round(r.revenue, 2) for r in raw.collect()}
    assert got == want


def test_bucketed_sort_skips_sort_in_smj(spark, bucketed_tables, no_broadcast):
    """bucketBy + sortBy on single-file buckets satisfies the SMJ's ordering
    requirement — no Sort operator on the bucketed scans."""
    t_orders, t_lineitem = bucketed_tables
    joined = bucketed_table(spark, t_orders).join(
        bucketed_table(spark, t_lineitem),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    joined.write.format("noop").mode("overwrite").save()
    plan = executed_plan(joined)
    assert "SortMergeJoin" in plan
    # one Sort allowed at most on neither side: both scans report sorted
    # buckets. (Spark still sorts if a bucket has >1 file; the fixture writes
    # each side in one task per bucket so this holds.)
    assert "Exchange" not in plan


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    t_lineitem = bucketed_tables[1]
    agg = (
        bucketed_table(spark, t_lineitem)
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    agg.collect()
    plan = executed_plan(agg)
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Compaction: 64 tiny files -> ~1 right-sized file, identical rows."""
    from kamodo_dask_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000, 1, 64).selectExpr(
        "id", "id * 2 AS v"
    ).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_file_bytes=128 * 1024 * 1024)
    assert n == 1
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_parquet_partitioned_layout(spark, tmp_path):
    """Partition-aware compaction: output keeps the hive layout with at
    most n_files per partition directory."""
    from kamodo_dask_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "frag_part")
    dst = str(tmp_path / "comp_part")
    spark.range(0, 8_000, 1, 32).selectExpr(
        "id", "id % 4 AS part", "id * 3 AS v"
    ).write.partitionBy("part").parquet(src)
    compact_parquet(
        spark, src, dst, target_file_bytes=128 * 1024 * 1024, partition_cols=["part"]
    )
    import glob

    for p in range(4):
        files = glob.glob(f"{dst}/part={p}/*.parquet")
        assert len(files) == 1, files
    a = sorted((r["id"], r["part"]) for r in spark.read.parquet(src).collect())
    b = sorted((r["id"], r["part"]) for r in spark.read.parquet(dst).collect())
    assert a == b
