"""Incremental aggregate maintenance from CDC deltas.

The 100 TB rollup problem: a derived aggregate table (revenue per
region per day, token counts per source, ...) must track a huge base
table, but recomputing it per refresh rescans everything. With a CDC
delta that carries BOTH sides of every change (``snapshot_diff(...,
include_old=True)``), additive aggregates update from the delta alone:

    new_agg = old_agg + f(new values) - f(old values)

Exactness discipline: only ADDITIVE measures with integer-exact
arithmetic (counts, integer-cents sums) — each is a group-wise abelian
update, so the incremental result is BIT-identical to a full
recompute, whatever order deltas apply in (pinned by test). Non-
additive measures (min/max, distinct) need their own retraction
structures and are deliberately out of scope.

Scale shape per refresh: one pass over the DELTA (map-side
contributions), a hash aggregate on the group keys, and one outer join
against the existing aggregate table — never a scan of the base.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure kinds -> contribution expression builders
_KINDS = ("count", "sum_cents")


def _contribution(col: str | None, kind: str, side: str) -> F.Column:
    """Per-delta-row contribution of one side ('new' uses the payload
    columns, 'old' uses their old_ twins)."""
    if kind == "count":
        present = (
            F.col("change_type") != "delete"
            if side == "new"
            else F.col("change_type") != "insert"
        )
        return F.when(present, F.lit(1).cast("long")).otherwise(F.lit(0))
    name = col if side == "new" else f"old_{col}"
    return F.coalesce(
        F.round(F.col(name) * 100).cast("long"), F.lit(0)
    )


def agg_snapshot(
    df: DataFrame, keys: Sequence[str], measures: dict[str, tuple[str | None, str]]
) -> DataFrame:
    """Full recompute of the rollup — the bootstrap (and the oracle the
    incremental path must match bit-for-bit). ``measures`` maps output
    name -> (source column | None, kind) with kind in ``count`` /
    ``sum_cents``."""
    aggs = []
    for out, (col, kind) in measures.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported measure kind {kind!r}")
        if kind == "count":
            aggs.append(F.count("*").cast("long").alias(out))
        else:
            aggs.append(
                F.sum(F.round(F.col(col) * 100).cast("long")).alias(out)
            )
    return df.groupBy(*keys).agg(*aggs)


def apply_agg_delta(
    agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[str | None, str]],
) -> DataFrame:
    """Update a rollup built by ``agg_snapshot`` with one CDC delta
    (``snapshot_diff(..., include_old=True)`` schema). Groups whose
    count reaches zero disappear, exactly as a recompute would drop
    them.

    The delta contributes TWO streams: additions grouped by the NEW
    group-key values (inserts + the new side of updates) and
    retractions grouped by the OLD group-key values (deletes + the old
    side of updates, read from the ``old_<col>`` twins). Keeping the
    sides separate is what makes group-key-CHANGING updates correct —
    the row leaves one group and joins another."""
    keys = list(keys)
    for out, (_, kind) in measures.items():
        if kind not in _KINDS:
            raise ValueError(f"unsupported measure kind {kind!r}")

    def old_key(k: str) -> F.Column:
        # diff-key columns have no old_ twin (they are equal on both
        # sides by construction); group keys in the payload do
        return (
            F.col(f"old_{k}") if f"old_{k}" in delta.columns else F.col(k)
        )

    new_side = delta.filter(F.col("change_type") != "delete").select(
        *[F.col(k).alias(k) for k in keys],
        *[
            _contribution(col, kind, "new").alias(out)
            for out, (col, kind) in measures.items()
        ],
    )
    old_side = delta.filter(F.col("change_type") != "insert").select(
        *[old_key(k).alias(k) for k in keys],
        *[
            (-_contribution(col, kind, "old")).alias(out)
            for out, (col, kind) in measures.items()
        ],
    )
    adj = (
        new_side.unionByName(old_side)
        .groupBy(*keys)
        .agg(*[F.sum(out).alias(out) for out in measures])
    )
    a = agg.alias("a")
    d = adj.alias("d")
    cond = [F.col(f"a.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    joined = a.join(d, cond, "full_outer")
    out_keys = [
        F.coalesce(F.col(f"a.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    out_measures = [
        (
            F.coalesce(F.col(f"a.{out}"), F.lit(0))
            + F.coalesce(F.col(f"d.{out}"), F.lit(0))
        ).cast("long").alias(out)
        for out in measures
    ]
    updated = joined.select(*out_keys, *out_measures)
    count_cols = [
        out for out, (_, kind) in measures.items() if kind == "count"
    ]
    if count_cols:
        updated = updated.filter(F.col(count_cols[0]) > 0)
    return updated
