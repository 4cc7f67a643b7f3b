"""Analytic-window operators.

- ``top_k_per_group`` — the reference's "best discounted sale per barcode"
  pattern (utils_superdesconto.py:91-98): row_number over a partitioned
  ordering, keep rank <= k. One shuffle on the partition keys.
- ``partitioned_sum`` — group total without collapsing rows (the
  ``sum(x) over (partition by g)`` denominator at
  utils_ressarcimento.py:229), accepted as API columns or a SQL string
  via ``F.expr`` (the reference uses both styles).

Scale note: an unbounded window over a hot key concentrates that key's
rows on one task. For top-k with few columns and heavy skew, prefer
aggregating ``max_by``/sorted structs; AQE skew handling does not split
window partitions. ``top_k_per_group`` is fine when the per-key row count
is bounded (true for all reference-shaped workloads).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int = 1,
    rank_col: str = "__rank",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the top-``k`` rows per group under ``order_by``.

    Include a unique tiebreaker in ``order_by`` for deterministic results.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    return out if keep_rank else out.drop(rank_col)


def partitioned_sum(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    value: Column | str,
    alias: str,
) -> DataFrame:
    """Attach the per-group sum of ``value`` to every row (no collapse)."""
    value_col = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*partition_by)
    return df.withColumn(alias, F.sum(value_col).over(w))
