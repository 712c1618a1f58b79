"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the 4-D corner-join grid
interpolation — the reference's headline capability, kamodo_dask.py:335-341,
re-expressed relationally). ``queries()`` / ``oracle_sql()`` expose the full
operator catalog from ``kamodo_dask_spark.queries`` — every SURVEY §2
operator plus the LLM-pipeline extensions, each with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)
# Executor Python workers fork from the driver's ENV, not its sys.path —
# PYTHONPATH makes the package importable inside pandas-UDF workers when the
# harness runs from an arbitrary cwd.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from kamodo_dask_spark.queries import ORACLES, QUERIES  # noqa: E402
from kamodo_dask_spark.session import ensure_session_conf  # noqa: E402


def _with_session_conf(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """The driver owns its own SparkSession, whose session timezone defaults
    to the HOST zone — every timestamp-sensitive entry (filename→timestamp
    parsing, windowing, unix-micros comparisons against tz-naive DuckDB)
    assumes UTC, and ns-parquet reads assume nanosAsLong. Apply the
    engine's runtime-settable confs before each entry so the catalog
    behaves identically under a foreign session."""

    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_session_conf(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _with_session_conf(QUERIES["interp_4d"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_session_conf(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(ORACLES)
