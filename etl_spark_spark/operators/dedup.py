"""Key-based deduplication.

The reference dedups three ways (SURVEY.md §2.4 A6/A7):
``dropDuplicates([key])`` (arbitrary row), window row_number → rank 1
(utils_superdesconto.py:91-98 — correct), and
``orderBy(ts.desc()).dropDuplicates([key])`` (utils_ressarcimento.py:54-55,
145-146) which *intends* keep-newest but is NOT guaranteed by Spark: the
global sort's order is not preserved through the aggregate's shuffle
(SURVEY.md §4 hazard 1). ``dedup_latest`` here is the deterministic
replacement — a ranking window, which also avoids the pointless global sort
(one shuffle on the key instead of a range-exchange + shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_any(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """One arbitrary row per key (hash-aggregate; cheapest dedup).

    Use when any representative row is acceptable. Not deterministic
    across runs — for reproducible results use ``dedup_latest``.
    """
    return df.dropDuplicates(list(keys))


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Deterministic keep-first-under-ordering dedup via row_number.

    ``order_by`` should end with a unique tiebreaker for full determinism
    (e.g. ``[F.col("ts").desc(), "id"]`` = keep-newest, ties by id).
    Single shuffle on ``keys``; no global sort.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
