"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the dominant cost is the scan, and the scan is only cheap when
file-level min/max statistics prune it. A linear sort clusters ONE column;
queries filtering on a second dimension still read every file. Z-ordering
interleaves the bits of several dimensions so that files hold points that
are close in ALL of them — every interleaved dimension gets usable
min/max pruning (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` capability,
expressed as plain DataFrame algebra over plain parquet).

The reference has no layout control at all (it re-reads whole files per
window, kamodo_dask.py:214-260); this module is the write-side half that
makes the read-side predicate pushdown actually skip data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols, bits: int = 16) -> Column:
    """Morton code of ``d`` integer columns: bit ``i`` of column ``j``
    lands at output bit ``i*d + j``. Callers pre-map each column into
    ``[0, 2**bits)`` (modulo, scaling, or rank-bucketing — see
    :func:`kamodo_dask_spark.operators.sampling.curriculum_buckets` for a
    rank path); values outside the range would silently collide, so only
    the low ``bits`` of each column are read.

    Pure row-local JVM bit arithmetic (``d*bits`` shift/mask terms inside
    one whole-stage-codegen projection — no UDF, no shuffle), and the same
    spelling reproduces in any SQL engine with ``<<``/``&``/``|``.
    """
    d = len(cols)
    if d < 1:
        raise ValueError("zorder_key needs at least one column")
    if d * bits > 63:
        raise ValueError(
            f"{d} cols x {bits} bits = {d * bits} output bits; the bigint "
            "Morton code holds at most 63 — lower `bits`"
        )
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        x = (c if isinstance(c, Column) else F.col(c)).cast("bigint")
        # mask to the low `bits` first so an out-of-range value cannot
        # smear sign/overflow bits across other dimensions' positions
        x = x.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zorder_repartition(
    df: DataFrame,
    cols,
    bits: int = 16,
    n_partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Physically cluster ``df`` by the Morton code of ``cols``:
    ``repartitionByRange`` on the z-key (one range shuffle — the same
    price as any global sort-based layout job) plus a within-partition
    sort, so a subsequent parquet write produces files whose min/max
    stats are tight in EVERY interleaved dimension.

    ``n_partitions`` defaults to the session shuffle partitions; pass the
    target file count for a layout job (file size = data / files, the
    knob that matters at 100 TB). ``key_col`` keeps the z-key in the
    output under that name; by default it is dropped (dropping after the
    sort is a projection — the partitioning and order survive).
    """
    z = zorder_key(cols, bits)
    name = key_col or "_zorder_key"
    out = df.withColumn(name, z)
    if n_partitions is None:
        n_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    out = out.repartitionByRange(n_partitions, name).sortWithinPartitions(name)
    return out if key_col else out.drop(name)
