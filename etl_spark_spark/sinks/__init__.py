from .write import upsert, write, write_bucketed, write_range_sorted, write_zordered

__all__ = ["write", "upsert", "write_bucketed", "write_range_sorted", "write_zordered"]
