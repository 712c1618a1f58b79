from kamodo_dask_spark.streaming.files import (
    SlabRefresher,
    stream_grid_files,
    stream_windowed_stats,
)

__all__ = ["SlabRefresher", "stream_grid_files", "stream_windowed_stats"]
