"""Skew mitigation: salting for hot keys.

AQE's skew-join splitting handles sort-merge joins, but two shapes still
hot-spot at 100 TB: (a) aggregations where one key holds a large share
of all rows, and (b) windows partitioned by a hot key (AQE does not
split window partitions). Salting fans a hot key out over N sub-keys,
aggregates partially per salt, then merges — two small shuffles instead
of one skewed one.

``salted_sum`` is exact for any associative aggregate (sums/counts —
incl. the integer-cents money representation). For top-1-per-group use
``windows.top_one_per_group_agg`` which is already salt-free (max_by
partial aggregation de-skews map-side).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Attach a uniform salt in [0, buckets). Deterministic per row id
    is unnecessary — any distribution works because downstream
    aggregation is associative."""
    return df.withColumn(
        salt_col, (F.rand(seed=42) * buckets).cast("int")
    )


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) partial sums, then
    groupBy(keys) final sums. Exact for associative aggregates; the
    first shuffle spreads a hot key over ``buckets`` reducers."""
    keys = list(keys)
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in sums]
    )
