from kamodo_dask_spark.plans.checks import (
    assert_broadcast_join,
    assert_partition_filters,
    assert_pushed_filters,
    executed_plan,
    has_wholestage_codegen,
)

__all__ = [
    "assert_broadcast_join",
    "assert_partition_filters",
    "assert_pushed_filters",
    "executed_plan",
    "has_wholestage_codegen",
]
