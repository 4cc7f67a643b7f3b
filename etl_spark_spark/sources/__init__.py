from .parquet import (
    date_range_paths,
    read_date_range,
    read_events,
    read_evolved,
    source,
    table,
    year_range_filter,
)
from .text_formats import read_csv, read_jsonl

__all__ = [
    "source",
    "table",
    "date_range_paths",
    "read_date_range",
    "read_events",
    "read_evolved",
    "year_range_filter",
    "read_csv",
    "read_jsonl",
]
