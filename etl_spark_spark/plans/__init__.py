from .inspect import explain_str, pushed_filters, scan_schema_columns

__all__ = ["explain_str", "pushed_filters", "scan_schema_columns"]
