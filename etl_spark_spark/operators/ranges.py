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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_size: int = 600_000_000,
) -> DataFrame:
    """Interval × interval OVERLAP join (the general case of
    :func:`point_in_interval_join`): match when keys are equal and
    ``[l_start, l_end]`` intersects ``[r_start, r_end]`` (closed
    endpoints: ``l_start <= r_end AND r_start <= l_end``). Bounds are
    integer columns (e.g. microsecond longs or day numbers) and each
    interval must satisfy start <= end.

    Spark plans the bare inequality pair as a BroadcastNestedLoopJoin
    — quadratic per key. Here BOTH sides explode to the coarse bins
    they span and the join becomes an equi-join on (keys..., bin)
    that hash-partitions normally; the exact overlap predicate is
    re-checked afterwards.

    The part the point form doesn't need: two overlapping intervals
    co-occupy EVERY bin their intersection spans, so the equi-join
    emits the pair once per shared bin. Rather than a quadratic-risk
    DISTINCT over pair identity, each pair is attributed to ONE
    canonical bin — the bin of ``greatest(l_start, r_start)`` (the
    intersection's first instant, always inside both intervals'
    bin ranges) — and rows from other shared bins are dropped by a
    pure filter. Exactly-once by construction, no dedup shuffle.

    Cost: |rows| × (span / bin_size) exploded rows per side; pick
    ``bin_size`` at or above the typical span. Returns all matching
    pairs with both sides' columns — callers doing a SELF overlap
    join should pre-rename columns and post-filter an ordering
    predicate (a < b) to keep each unordered pair once.
    """
    keys = list(keys)
    l_binned = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} DIV {bin_size}"),
                F.expr(f"{l_end} DIV {bin_size}"),
            )
        ),
    )
    r_binned = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} DIV {bin_size}"),
                F.expr(f"{r_end} DIV {bin_size}"),
            )
        ),
    )
    joined = l_binned.join(r_binned, [*keys, "__bin"], "inner")
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    canonical = F.col("__bin") == F.expr(
        f"greatest({l_start}, {r_start}) DIV {bin_size}"
    )
    return joined.filter(overlap & canonical).drop("__bin")
