"""Schema-driven profiling — the reference's reflection pattern
(transforms parameterized over ``df.schema``, SURVEY.md §1) surfaced as
a data-quality operator.

``profile_columns`` computes per-column null and distinct counts for
every column (or a subset) in ONE pass: a single aggregate emitting
2·|cols| measures, then unpivoted to rows. No per-column jobs, no
collect loops — at 100 TB this is one scan + one 1-row shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame, columns: Sequence[str] | None = None
) -> DataFrame:
    """Per-column (column_name, n_nulls, n_distinct) — exact counts,
    integer-only outputs (engine-portable). One aggregate pass."""
    cols = list(columns) if columns else [f.name for f in df.schema.fields]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__n_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', __n_{c}, __d_{c}" for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (column_name, n_nulls, n_distinct)"
    )
