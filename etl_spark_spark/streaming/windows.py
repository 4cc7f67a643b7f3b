"""Event-time windowing — batch forms.

The reference has no streaming surface (SURVEY.md §2.9); its closest
analog is the daily-file incremental batch. These operators cover the
gap: tumbling/sliding windows via ``F.window`` and gap-based
sessionization. The same transformations run unchanged on a streaming
DataFrame (see .stream) — that symmetry is the point of Structured
Streaming.

Determinism: window boundaries are pure functions of the timestamp;
sessionization uses an explicit lag/cumsum formulation whose gap rule
(new session iff gap > threshold) is pinned here and mirrored by the
ANSI-SQL gaps-and-islands oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[Column | str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Fixed windows of ``duration``; emits window_start (ISO string)
    as the first column."""
    return (
        df.groupBy(F.window(F.col(ts_col), duration).alias("__w"), *group_by)
        .agg(*aggs)
        .withColumn(
            "window_start",
            F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss"),
        )
        .drop("__w")
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[Column | str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    return (
        df.groupBy(
            F.window(F.col(ts_col), duration, slide).alias("__w"), *group_by
        )
        .agg(*aggs)
        .withColumn(
            "window_start",
            F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss"),
        )
        .drop("__w")
    )


def time_rollup_counts(
    df: DataFrame,
    ts_col: str,
    group_by: Sequence[str],
    value_cents: Column,
) -> DataFrame:
    """Hypertable-style hierarchical rollup: hourly buckets aggregated
    once from raw rows, daily buckets derived FROM the hourly aggregate
    (not from raw) — the continuous-aggregate pattern: at 100 TB the
    raw table is scanned once and each coarser grain reuses the finer
    one (|hours| rows, not |events|).

    Emits one row per (grain, bucket_start, *group_by) with n_events
    and sum_cents. Sums are integer cents so the hierarchy is exact.
    """
    hour = (
        df.groupBy(
            F.date_trunc("hour", F.col(ts_col)).alias("__bucket"), *group_by
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_cents).alias("sum_cents"),
        )
    )
    day = (
        hour.groupBy(
            F.date_trunc("day", F.col("__bucket")).alias("__bucket"), *group_by
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_cents").alias("sum_cents"),
        )
    )
    out_cols = lambda grain: [  # noqa: E731
        F.lit(grain).alias("grain"),
        F.date_format("__bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        *group_by,
        "n_events",
        (F.col("sum_cents") / 100.0).alias("sum_value"),
    ]
    return hour.select(*out_cols("hour")).unionByName(
        day.select(*out_cols("day"))
    )


def sessionize_batch(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap
    from the previous event is >= ``gap_seconds`` — identical to
    ``F.session_window``'s rule (windows are [start, last+gap), so an
    event arriving exactly at last+gap falls outside and opens a new
    session). The streaming sessionizer in .stateful relies on this
    parity.

    Adds ``session_id`` (0-based per key). One shuffle on the key.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col))
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    is_new = (prev.isNull() | (us - prev >= gap_seconds * 1_000_000)).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
