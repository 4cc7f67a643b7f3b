"""Range / interval joins.

Spark plans a bare inequality join as BroadcastNestedLoopJoin (or a
cartesian product) — quadratic per key. The scalable formulation bins
time into coarse buckets: each left interval explodes to the buckets it
overlaps, each right point maps to its bucket, the join becomes an
EQUI-join on (keys..., bucket) that hash-partitions normally, and the
exact inequality is re-checked afterwards. Cost is |rows| × (interval
span / bin width) instead of |left| × |right| per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    start_us: str,
    end_us: str,
    point_us: str,
    bin_us: int = 600_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join left intervals [start_us, end_us] (microsecond longs) to
    right points: match when ``start <= point <= end`` and keys equal.
    ``bin_us`` should be >= the typical interval span (default 10 min).

    ``how``: 'inner' or 'left'. The bin explosion duplicates each left
    interval across the buckets it spans, so a naive outer flag on the
    equi-join would emit one null-extended row PER BIN and the exact
    refine would then drop them — 'left' is instead built as the inner
    matches unioned with the anti-joined unmatched left rows (right
    columns NULL), which is the correct left-outer semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"point_in_interval_join supports how='inner'|'left', got {how!r}"
        )
    keys = list(keys)
    if how == "left":
        # Stable left-row identity for the anti-join. Recomputation is
        # deterministic for deterministic sources (id = partition index
        # + row offset), which every supported source here is.
        tagged = left.withColumn("__lid", F.monotonically_increasing_id())
        matched = point_in_interval_join(
            tagged, right, keys, start_us, end_us, point_us, bin_us, "inner"
        )
        unmatched = tagged.join(
            matched.select("__lid").distinct(), "__lid", "left_anti"
        )
        return matched.unionByName(unmatched, allowMissingColumns=True).drop(
            "__lid"
        )
    l_binned = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} DIV {bin_us}"),
                F.expr(f"{end_us} DIV {bin_us}"),
            )
        ),
    )
    r_binned = right.withColumn("__bin", F.expr(f"{point_us} DIV {bin_us}"))
    joined = l_binned.join(r_binned, [*keys, "__bin"], "inner")
    exact = joined.filter(
        (F.col(point_us) >= F.col(start_us)) & (F.col(point_us) <= F.col(end_us))
    )
    # a wide interval can meet the same point in multiple bins? no —
    # the point lives in exactly one bin, so pairs are already unique
    return exact.drop("__bin")
