from kamodo_dask_spark.functions.time import (
    ceil_datetime,
    ceil_timestamp,
    epoch_seconds,
    floor_datetime,
    floor_timestamp,
    time_slots,
)

__all__ = [
    "ceil_datetime",
    "ceil_timestamp",
    "epoch_seconds",
    "floor_datetime",
    "floor_timestamp",
    "time_slots",
]
