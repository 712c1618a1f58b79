"""asof_join vs pandas merge_asof: property-based cross-validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from kamodo_dask_spark.operators.asof import asof_join
from pyspark.sql import functions as F


@given(seed=st.integers(0, 2**32 - 1), tol=st.sampled_from([None, 5.0, 50.0]))
@settings(max_examples=12, deadline=None)
def test_asof_backward_matches_pandas(spark, seed, tol):
    rng = np.random.default_rng(seed)
    n_left, n_right = rng.integers(1, 40), rng.integers(0, 40)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_left),
            "ts": np.sort(rng.uniform(0, 1000, n_left)),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 3, n_right),
            "ts": rng.uniform(0, 1000, n_right),
            "v": rng.normal(size=n_right),
        }
    )
    # merge_asof requires unique, sorted keys; drop ts duplicates per key
    right = right.drop_duplicates(subset=["k", "ts"]).sort_values("ts")
    left = left.sort_values("ts")

    expected = pd.merge_asof(
        left,
        right.rename(columns={"ts": "ts_matched"}),
        left_on="ts",
        right_on="ts_matched",
        by="k",
        direction="backward",
        tolerance=tol,
    )

    sl = spark.createDataFrame(left, "k long, ts double")
    sr = spark.createDataFrame(right, "k long, ts double, v double")
    got = (
        asof_join(sl, sr, on="k", left_ts="ts", tolerance=tol)
        .toPandas()
        .sort_values(["ts", "k"])
        .reset_index(drop=True)
    )
    expected = expected.sort_values(["ts", "k"]).reset_index(drop=True)

    assert len(got) == len(expected)
    for col in ("v", "ts_matched"):
        g, e = got[col].to_numpy(), expected[col].to_numpy()
        both_nan = pd.isna(g) & pd.isna(e)
        close = np.isclose(
            pd.to_numeric(got[col], errors="coerce"),
            pd.to_numeric(expected[col], errors="coerce"),
            rtol=1e-12,
            equal_nan=False,
        )
        assert (both_nan | close).all(), (
            f"{col} mismatch (seed={seed}, tol={tol}):\n"
            f"{pd.DataFrame({'got': g, 'exp': e})[~(both_nan | close)]}"
        )


def test_duplicate_right_timestamps_deterministic(spark):
    """Several right rows sharing (key, ts): the tie-break makes the pick
    stable across runs — always the max payload tuple among the tied rows."""
    from kamodo_dask_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10.0), (2, 10.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 5.0, 3.0), (1, 5.0, 9.0), (1, 5.0, 7.0), (2, 5.0, 1.0)],
        "k long, ts double, v double",
    )
    results = []
    for _ in range(3):
        out = {
            r["k"]: (r["v"], r["ts_matched"])
            for r in asof_join(
                left, right.repartition(4), on="k", left_ts="ts"
            ).collect()
        }
        results.append(out)
    assert results[0] == results[1] == results[2]
    assert results[0][1] == (9.0, 5.0)  # max payload among the tied rows
    assert results[0][2] == (1.0, 5.0)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_keyless_asof_bucketed_matches_pandas(spark, direction):
    """Keyless as-of (on=None) over right rows spanning many time buckets:
    values must match pandas merge_asof, including left rows whose bracket
    lies in an EARLIER/LATER bucket than their own (the carry path) and
    left rows outside the right span (edge-bucket clamping)."""
    rng = np.random.default_rng(7)
    # right: sparse early region + dense late region → many buckets have no
    # right rows at all, exercising multi-bucket carry hops
    right_ts = np.concatenate(
        [rng.uniform(0, 50, 5), rng.uniform(800, 1000, 400)]
    )
    right = pd.DataFrame({"ts": np.unique(right_ts)})
    right["v"] = rng.normal(size=len(right))
    # left: spread over a wider span than right (clamp test on both ends)
    left = pd.DataFrame({"ts": np.sort(rng.uniform(-100, 1100, 300))})

    expected = pd.merge_asof(
        left,
        right.rename(columns={"ts": "ts_matched"}),
        left_on="ts",
        right_on="ts_matched",
        direction=direction,
    )

    sl = spark.createDataFrame(left, "ts double")
    sr = spark.createDataFrame(right, "ts double, v double").repartition(8)
    got = (
        asof_join(sl, sr, on=None, left_ts="ts", direction=direction, time_buckets=16)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    expected = expected.sort_values("ts").reset_index(drop=True)
    assert len(got) == len(expected)
    for col in ("v", "ts_matched"):
        g = pd.to_numeric(got[col], errors="coerce")
        e = pd.to_numeric(expected[col], errors="coerce")
        both_nan = g.isna() & e.isna()
        assert (both_nan | np.isclose(g, e, rtol=1e-12)).all(), (
            f"{col}:\n{pd.DataFrame({'ts': got['ts'], 'got': g, 'exp': e})[~(both_nan | np.isclose(g, e, rtol=1e-12))]}"
        )


def test_keyless_asof_plan_has_no_single_partition_exchange(spark):
    """The keyless path's fix: the window partitions on the time bucket, so
    the physical plan must not contain Exchange SinglePartition (the old
    formulation sorted the whole relation in ONE task)."""
    left = spark.range(1000).select((F.col("id") * 1.0).alias("ts"))
    right = spark.range(5000).select(
        (F.col("id") * 0.2).alias("ts"), (F.col("id") * 2.0).alias("v")
    ).repartition(8)
    out = asof_join(left, right, on=None, left_ts="ts", time_buckets=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(_bkt" in plan, plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_uniform_grid_matches_pandas(spark, direction):
    """asof_uniform_grid ≡ merge_asof of the grid slots against the data,
    including slots before/after the data span and empty slot intervals."""
    from kamodo_dask_spark.operators.asof import asof_uniform_grid

    rng = np.random.default_rng(11)
    # events clustered mid-range: head and tail slots have no direct events
    ev = pd.DataFrame({"ts": np.sort(rng.uniform(200, 700, 300))}).drop_duplicates("ts")
    ev["v"] = rng.normal(size=len(ev))
    start, step, n = 0.0, 50.0, 21  # slots 0, 50, ..., 1000

    slots = pd.DataFrame({"slot": start + step * np.arange(n)})
    expected = pd.merge_asof(
        slots,
        ev.rename(columns={"ts": "ts_matched"}),
        left_on="slot",
        right_on="ts_matched",
        direction=direction,
    )

    sdf = spark.createDataFrame(ev, "ts double, v double").repartition(8)
    got = (
        asof_uniform_grid(sdf, start, step, n, right_ts="ts", direction=direction)
        .toPandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    assert len(got) == n
    for col in ("v", "ts_matched"):
        g, e = got[col], expected[col]
        both_nan = g.isna() & e.isna()
        assert (both_nan | np.isclose(g, e, rtol=1e-12)).all(), (
            f"{direction} {col}:\n{pd.DataFrame({'slot': got['slot'], 'got': g, 'exp': e})}"
        )


def test_asof_uniform_grid_both_matches_single_direction(spark):
    """The one-scan dual-direction form ≡ two single-direction passes (which
    are themselves merge_asof-verified above), including empty edge slots."""
    from kamodo_dask_spark.operators.asof import (
        asof_uniform_grid,
        asof_uniform_grid_both,
    )

    rng = np.random.default_rng(23)
    ev = pd.DataFrame({"ts": np.sort(rng.uniform(200, 700, 300))}).drop_duplicates("ts")
    ev["v"] = rng.normal(size=len(ev))
    start, step, n = 0.0, 50.0, 21
    sdf = spark.createDataFrame(ev, "ts double, v double").repartition(8)

    both = (
        asof_uniform_grid_both(sdf, start, step, n, right_ts="ts")
        .toPandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    assert len(both) == n
    for direction, sfx in (("backward", "_b"), ("forward", "_f")):
        single = (
            asof_uniform_grid(sdf, start, step, n, right_ts="ts", direction=direction)
            .toPandas()
            .sort_values("slot")
            .reset_index(drop=True)
        )
        for col, bcol in (("v", f"v{sfx}"), ("ts_matched", f"ts_matched{sfx}")):
            g, e = both[bcol], single[col]
            both_nan = g.isna() & e.isna()
            assert (both_nan | np.isclose(g, e, rtol=1e-12)).all(), (direction, col)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("keyed", [True, False])
def test_null_left_timestamp_gets_no_match(spark, direction, keyed):
    """pandas merge_asof semantics: a NULL left timestamp has no bracket.
    Forward mode sorts _ts DESC NULLS LAST, which without the explicit
    guard would hand NULL-ts rows the earliest right row (ADVICE r3)."""
    left = spark.createDataFrame(
        [(1, 50.0), (1, None)], "k long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 10.0, 1.0), (1, 90.0, 2.0)], "k long, ts double, v double"
    )
    on = "k" if keyed else None
    rows = {
        (r["ts"]): (r["v"], r["ts_matched"])
        for r in asof_join(
            left, right, on=on, left_ts="ts", direction=direction, time_buckets=4
        ).collect()
    }
    assert rows[None] == (None, None), rows
    if direction == "backward":
        assert rows[50.0] == (1.0, 10.0)
    else:
        assert rows[50.0] == (2.0, 90.0)


def test_keyless_asof_with_tolerance(spark):
    """tolerance composes with the bucketed keyless path: matches farther
    than the tolerance null out, including carry-patched rows."""
    left = spark.createDataFrame([(10.0,), (200.0,), (205.0,)], "ts double")
    right = spark.createDataFrame([(8.0, 1.0), (100.0, 2.0)], "ts double, v double")
    out = {
        r["ts"]: (r["v"], r["ts_matched"])
        for r in asof_join(
            left, right, on=None, left_ts="ts", tolerance=50.0, time_buckets=4
        ).collect()
    }
    assert out[10.0] == (1.0, 8.0)        # within tolerance
    assert out[200.0] == (None, None)     # bracket (100.0) is 100 away -> nulled
    assert out[205.0] == (None, None)


def test_asof_uniform_grid_both_timestamp_axis(spark):
    """Dual-direction uniform-grid as-of on a TIMESTAMP axis (µs slot
    arithmetic), cross-checked against pandas merge_asof both ways."""
    rng = np.random.default_rng(5)
    base = pd.Timestamp("2024-06-01")
    ev = pd.DataFrame(
        {"ts": (base + pd.to_timedelta(np.sort(rng.uniform(3600, 86000, 200)), unit="s")
                ).floor("us")}  # Spark timestamps are µs — align the oracle
    ).drop_duplicates("ts")
    ev["v"] = rng.normal(size=len(ev))
    from kamodo_dask_spark.operators.asof import asof_uniform_grid_both

    start, step, n = "2024-06-01 00:00:00", 1800.0, 49  # 30-min slots over a day
    sdf = spark.createDataFrame(ev).repartition(4)
    got = (
        asof_uniform_grid_both(sdf, start, step, n, right_ts="ts")
        .toPandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    slots = pd.DataFrame({"slot": pd.Timestamp(start) + pd.to_timedelta(
        1800.0 * np.arange(n), unit="s")})
    for direction, sfx in (("backward", "_b"), ("forward", "_f")):
        exp = pd.merge_asof(
            slots, ev.rename(columns={"ts": "m"}), left_on="slot", right_on="m",
            direction=direction,
        )
        g, e = got[f"v{sfx}"], exp["v"]
        both_nan = g.isna() & e.isna()
        assert (both_nan | np.isclose(g, e, rtol=1e-12)).all(), direction
        gm = pd.to_datetime(got[f"ts_matched{sfx}"])
        both_nat = gm.isna() & exp["m"].isna()
        assert (both_nat | (gm == exp["m"])).all(), direction


def test_uniform_grid_ignores_null_right_timestamps(spark):
    """A right row with a NULL timestamp must not become a ghost candidate:
    greatest/least skip NULLs, which would pin it to slot 0 (backward) /
    the last slot (forward) and then carry it across every empty slot."""
    from kamodo_dask_spark.operators.asof import (
        asof_uniform_grid,
        asof_uniform_grid_both,
    )

    right = spark.createDataFrame(
        [(None, 99.0), (120.0, 1.0)], "ts double, v double"
    )
    for direction in ("backward", "forward"):
        out = {
            r["slot"]: (r["v"], r["ts_matched"])
            for r in asof_uniform_grid(
                right, 0.0, 50.0, 5, right_ts="ts", direction=direction
            ).collect()
        }
        if direction == "backward":
            assert out[0.0] == (None, None) and out[50.0] == (None, None)
            assert out[150.0] == (1.0, 120.0) and out[200.0] == (1.0, 120.0)
        else:
            assert out[200.0] == (None, None) and out[150.0] == (None, None)
            assert out[0.0] == (1.0, 120.0) and out[100.0] == (1.0, 120.0)
    both = {
        r["slot"]: (r["v_b"], r["v_f"])
        for r in asof_uniform_grid_both(right, 0.0, 50.0, 5, right_ts="ts").collect()
    }
    assert both[0.0] == (None, 1.0)
    assert both[200.0] == (1.0, None)


@pytest.mark.parametrize("keyed", [True, False])
def test_null_payload_fields_not_stitched(spark, keyed):
    """merge_asof returns the matched right row VERBATIM — a NULL payload
    field must stay NULL, not be filled from an older right row (the
    per-column fill produced such Frankenstein rows)."""
    left = spark.createDataFrame([(1, 3.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, 1.0, 1.0, 2.0), (1, 2.0, None, 3.0)],
        "k long, ts double, a double, b double",
    )
    on = "k" if keyed else None
    row = asof_join(left, right, on=on, left_ts="ts", time_buckets=4).collect()[0]
    assert row["ts_matched"] == 2.0
    assert row["a"] is None          # matched row's NULL, not 1.0 from ts=1
    assert row["b"] == 3.0


@pytest.mark.parametrize("keyed", [True, False])
def test_null_right_timestamp_never_matches(spark, keyed):
    """A right row with NULL ts has no bracket position: backward's
    NULLS-FIRST sort must not let it ghost-fill left rows that precede
    every valid right row."""
    left = spark.createDataFrame([(1, 5.0), (1, 50.0)], "k long, ts double")
    right = spark.createDataFrame(
        [(1, None, 7.0), (1, 10.0, 2.0)], "k long, ts double, v double"
    )
    on = "k" if keyed else None
    rows = {
        r["ts"]: (r["v"], r["ts_matched"])
        for r in asof_join(left, right, on=on, left_ts="ts", time_buckets=4).collect()
    }
    assert rows[5.0] == (None, None)   # before every REAL right row
    assert rows[50.0] == (2.0, 10.0)


def test_driver_epoch_micros_session_tz_semantics():
    """Naive driver-side start/time_range values localize in the SESSION
    time zone (pinned UTC by get_spark) — not the host system tz — because
    they are compared against unix_micros() instants; tz-aware inputs pass
    through unchanged."""
    import pandas as pd

    from kamodo_dask_spark.operators.asof import _driver_epoch_micros

    utc = _driver_epoch_micros("2024-01-02 00:00:00")
    assert utc == int(pd.Timestamp("2024-01-02", tz="UTC").value // 1000)
    # a non-UTC session tz shifts the naive reading by its offset
    ny = _driver_epoch_micros("2024-01-02 00:00:00", tz="America/New_York")
    assert ny - utc == 5 * 3600 * 1_000_000
    # tz-aware input: the tz argument must not double-apply
    aware = pd.Timestamp("2024-01-02 00:00:00", tz="UTC")
    assert _driver_epoch_micros(aware, tz="America/New_York") == utc


def test_driver_epoch_micros_rejects_bare_numerics():
    """ADVICE r4: pd.Timestamp(1700000000) means epoch NANOseconds — a
    numeric start/time_range against a timestamp axis must fail loudly
    instead of silently anchoring the grid in 1970."""
    import numpy as np
    import pytest

    from kamodo_dask_spark.operators.asof import _driver_epoch_micros

    for bad in (1700000000, 1700000000.5, np.int64(1700000000), True):
        with pytest.raises(TypeError, match="datetime-like"):
            _driver_epoch_micros(bad)
    # datetime-likes still work
    assert _driver_epoch_micros("2024-01-02T00:00:00") == _driver_epoch_micros(
        __import__("pandas").Timestamp("2024-01-02", tz="UTC")
    )
