"""Vector math over ``array<float>`` embedding columns — built on
higher-order functions (zip_with / aggregate), so everything runs
JVM-side inside codegen; no Python crosses the row boundary.

Determinism contract: components are cast float32→double (exact), the
dot product folds LEFT-TO-RIGHT from 0.0 (``0.0 + x == x`` in IEEE, so
the fold matches a first-element-seeded fold too) — the exact same
sequential reduction an ANSI-SQL ``list_reduce`` oracle performs,
making cosine scores bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(
        _col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))
