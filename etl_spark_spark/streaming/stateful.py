"""Custom stateful streaming operators.

Two shapes beyond plain windowed aggregation:

- ``stream_session_agg`` — built-in ``F.session_window`` with a
  watermark: Spark manages merge/expiry state; sessions emit once the
  watermark passes their close. Batch parity: ``windows.sessionize_batch``
  implements the identical gap rule, so every emitted streaming session
  matches a batch session exactly.

- ``stream_user_totals`` — ``applyInPandasWithState``: arbitrary
  per-key state (running count/sum per user) carried across
  micro-batches, Arrow-batched on the Python side. This is the template
  for operators Spark lacks natively (custom decay models, cross-event
  pattern state, per-entity accumulators); state size is O(keys), and
  timeouts (ProcessingTime/EventTime) bound retention in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream import read_events_stream


def stream_session_agg(
    spark: SparkSession,
    path: str,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
    glob: str | None = None,
) -> DataFrame:
    """Per-user gap sessions over the event stream; emits closed
    sessions (append mode) once the watermark passes."""
    events = read_events_stream(spark, path, glob=glob)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def stream_purchase_click_join(
    spark: SparkSession,
    path: str,
    within: str = "30 minutes",
    glob: str | None = None,
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's clicks in the preceding ``within`` interval. Watermarks on
    BOTH sides + the time-range condition bound the join state (Spark
    drops buffered rows once the watermark passes the range), which is
    what makes stream-stream joins feasible at all — an unbounded
    condition would accumulate state forever."""
    clicks = (
        read_events_stream(spark, path, glob=glob)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", within)
    )
    purchases = (
        read_events_stream(spark, path, glob=glob)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", within)
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {within}")),
        "inner",
    ).select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )


def stream_user_totals(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Running (count, sum) per user via applyInPandasWithState —
    emits the updated total for each user seen in a micro-batch."""
    events = read_events_stream(spark, path, glob=glob)

    def totals(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        totals,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_purchase_click_left_join(
    spark: SparkSession,
    path: str,
    within: str = "30 minutes",
    glob: str | None = None,
) -> DataFrame:
    """Stream-stream LEFT OUTER join: like the inner form, but
    purchases with no click in the window are emitted null-extended —
    AFTER the watermark passes their join range, because only then can
    the engine prove no matching click can still arrive. The test
    pins exactly that semantics: matched rows equal the inner join's;
    null rows appear only once the range is watermark-closed, so a
    tail-of-stream purchase may legitimately be withheld."""
    clicks = (
        read_events_stream(spark, path, glob=glob)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", within)
    )
    purchases = (
        read_events_stream(spark, path, glob=glob)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value"),
        )
        .withWatermark("purchase_ts", within)
    )
    return purchases.join(
        clicks,
        (purchases.user_id == clicks.user_id)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= purchases.purchase_ts - F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        purchases.user_id,
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "value",
    )
