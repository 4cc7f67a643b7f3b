from .ressarcimento import allocation_pipeline
from .superdesconto import best_sale_pipeline

__all__ = ["best_sale_pipeline", "allocation_pipeline"]
