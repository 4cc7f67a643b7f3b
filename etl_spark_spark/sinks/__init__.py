from .write import upsert, write, write_bucketed, write_range_sorted

__all__ = ["write", "upsert", "write_bucketed", "write_range_sorted"]
