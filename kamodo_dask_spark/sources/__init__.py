from kamodo_dask_spark.sources.parquet import (
    TABLES,
    read_events,
    read_table,
    read_tables,
    scan_grid_files,
    with_file_timestamp,
)
from kamodo_dask_spark.sources.discovery import (
    extract_timestamp_from_filename,
    fetch_file_range,
    filename_for_timestamp,
)

__all__ = [
    "TABLES",
    "read_events",
    "read_table",
    "read_tables",
    "scan_grid_files",
    "with_file_timestamp",
    "extract_timestamp_from_filename",
    "fetch_file_range",
    "filename_for_timestamp",
]
