from .write import upsert, write, write_bucketed

__all__ = ["write", "upsert", "write_bucketed"]
