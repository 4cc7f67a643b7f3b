from .parquet import (
    date_range_paths,
    read_date_range,
    read_events,
    source,
    table,
    year_range_filter,
)

__all__ = [
    "source",
    "table",
    "date_range_paths",
    "read_date_range",
    "read_events",
    "year_range_filter",
]
