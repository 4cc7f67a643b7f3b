from .write import upsert, write

__all__ = ["write", "upsert"]
