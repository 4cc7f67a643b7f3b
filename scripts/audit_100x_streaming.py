"""100x-replica audit of the two STATEFUL streaming operators
(VERDICT r5 item 6): streaming MV maintenance (streaming/mv.py) and
the streaming near-dup index (streaming/dedup.py). The batch registry
has a full 100x sweep; these two keep cross-batch state on disk, so
the scale question is different — does the PER-BATCH cost stay flat
as committed history grows, and how does the 100x per-batch wall
compare to the 1x wall?

Protocol: each operator ingests its replica table as three
deterministic id-sliced batches through the SAME replay-idempotent
entry points Structured Streaming's foreachBatch calls
(apply_stream_batch / dedup_batch_once), timing every fold. Run the
same fold at 1x (sf0.1) for the ratio. One Spark session, one
operator at a time (see memory: never two heavy sessions against the
100x replica).

Usage: python scripts/audit_100x_streaming.py [replica_dir] [sf1_dir]
Emits one JSON line per (operator, scale, batch) plus a summary.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from etl_spark_spark.session import get_spark  # noqa: E402


def audit_mv(spark, sf_dir: str, scale: str, results: list) -> None:
    from etl_spark_spark.operators.rollup import agg_snapshot
    from etl_spark_spark.sources import read_events
    from etl_spark_spark.streaming.mv import (
        apply_stream_batch,
        read_stream_rollup,
    )

    keys = ["event_type"]
    measures = {"cents": ("value", "sum_cents"), "n": (None, "count")}
    ev = read_events(spark, sf_dir, with_ts=False).select(
        "event_id", "event_type", "value"
    )
    state = tempfile.mkdtemp(prefix="audit_stream_mv_")
    try:
        for b in range(3):
            batch = ev.filter(F.col("event_id") % 3 == b).drop("event_id")
            t0 = time.perf_counter()
            apply_stream_batch(batch, b, keys, measures, state)
            sec = round(time.perf_counter() - t0, 2)
            results.append(
                {"op": "stream_mv", "scale": scale, "batch": b, "sec": sec}
            )
            print(json.dumps(results[-1]), flush=True)
        # end state must equal the batch recompute (exactly-once proof
        # at this scale, not just at test scale)
        got = {
            r["event_type"]: (r["cents"], r["n"])
            for r in read_stream_rollup(spark, state).collect()
        }
        want = {
            r["event_type"]: (r["cents"], r["n"])
            for r in agg_snapshot(
                ev.drop("event_id"), keys, measures
            ).collect()
        }
        assert got == want, f"MV end state != batch recompute at {scale}"
        print(json.dumps({"op": "stream_mv", "scale": scale,
                          "state_equals_batch_recompute": True}), flush=True)
    finally:
        shutil.rmtree(state, ignore_errors=True)


def audit_dedup(spark, sf_dir: str, scale: str, results: list) -> None:
    from etl_spark_spark.functions.text import tokens, word_shingles
    from etl_spark_spark.streaming.dedup import dedup_batch_once

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    root = tempfile.mkdtemp(prefix="audit_stream_dedup_")
    # neither path may pre-exist: upsert reads kept/ if present, and
    # an empty dir fails schema inference
    kept = f"{root}/kept"
    index = f"{root}/index"
    try:
        hi = docs.agg(F.max("doc_id")).collect()[0][0]
        bounds = [(0, hi // 3), (hi // 3, 2 * hi // 3), (2 * hi // 3, hi + 1)]
        for b, (lo, up) in enumerate(bounds):
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            ).withColumn("t", tokens("text"))
            t0 = time.perf_counter()
            dedup_batch_once(
                batch, b, "doc_id", word_shingles("t", 3), kept, index
            )
            sec = round(time.perf_counter() - t0, 2)
            results.append(
                {"op": "stream_dedup", "scale": scale, "batch": b, "sec": sec}
            )
            print(json.dumps(results[-1]), flush=True)
        n_kept = spark.read.parquet(kept).count()
        results.append(
            {"op": "stream_dedup", "scale": scale, "n_kept": n_kept}
        )
        print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def audit_temporal(spark, sf_dir: str, scale: str, results: list) -> None:
    """Round-7: temporal join-MV folds (views⋈purchases within 1h) as
    SIX time-ordered 5-day windows with eviction between folds and one
    history compaction midway — the full bounded-state maintenance
    loop. Reports per-fold wall, partitions evicted, and validates the
    final view against the one-shot banded join (eviction + compaction
    losslessness at this scale, not just at test scale)."""
    import os

    from etl_spark_spark.sources import read_events
    from etl_spark_spark.streaming.join_mv import (
        apply_join_batch_temporal,
        compact_join_mv_history,
        evict_join_mv_state,
        read_join_view,
    )

    ev = read_events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    state = tempfile.mkdtemp(prefix="audit_tjoin_") + "/state"

    def _parts(side):
        p = f"{state}/{side}"
        if not os.path.isdir(p):
            return 0
        return sum(1 for n in os.listdir(p) if n.startswith("__batch_id="))

    try:
        cuts = [f"2024-01-{d:02d}" for d in (6, 11, 16, 21, 26)]
        windows = list(
            zip([None] + cuts, cuts + [None])
        )
        for b, (lo, hi) in enumerate(windows):
            v, p = views, purch
            if lo:
                v = v.filter(F.col("view_ts") >= F.lit(lo).cast("timestamp"))
                p = p.filter(
                    F.col("purchase_ts") >= F.lit(lo).cast("timestamp")
                )
            if hi:
                v = v.filter(F.col("view_ts") < F.lit(hi).cast("timestamp"))
                p = p.filter(
                    F.col("purchase_ts") < F.lit(hi).cast("timestamp")
                )
            evicted = []
            if b > 0:
                evicted = evict_join_mv_state(
                    state, 3600, committed_below=b
                )
            if b == 3:
                compact_join_mv_history(spark, state, upto_batch_id=b)
            t0 = time.perf_counter()
            apply_join_batch_temporal(
                v, p, b, ["user_id"], "view_ts", "purchase_ts", 3600, state
            )
            sec = round(time.perf_counter() - t0, 2)
            results.append(
                {
                    "op": "temporal_join_mv",
                    "scale": scale,
                    "batch": b,
                    "sec": sec,
                    "evicted": len(evicted),
                    "live_parts": _parts("left") + _parts("right"),
                }
            )
            print(json.dumps(results[-1]), flush=True)
        # exactness: maintained view == one-shot banded join (read
        # through the manifest-aware reader — raw path reads lose the
        # compacted pre-fence history by design)
        got = read_join_view(spark, state).count()
        want = (
            views.join(purch, "user_id")
            .filter(
                F.abs(
                    F.col("view_ts").cast("long")
                    - F.col("purchase_ts").cast("long")
                )
                <= 3600
            )
            .count()
        )
        assert got == want, f"temporal view {got} != recompute {want}"
        results.append(
            {
                "op": "temporal_join_mv",
                "scale": scale,
                "pairs": got,
                "view_equals_recompute": True,
            }
        )
        print(json.dumps(results[-1]), flush=True)
    finally:
        shutil.rmtree(state.rsplit("/", 1)[0], ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("replica_dir", nargs="?", default="/tmp/replica_100x")
    ap.add_argument("sf1_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--op",
        choices=["mv", "dedup", "temporal", "both", "all"],
        default="both",
    )
    ns = ap.parse_args()

    spark = get_spark(app_name="audit-100x-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    results: list = []
    if ns.op in ("mv", "both", "all"):
        audit_mv(spark, ns.sf1_dir, "1x", results)
        audit_mv(spark, ns.replica_dir, "100x", results)
    if ns.op in ("dedup", "both", "all"):
        audit_dedup(spark, ns.sf1_dir, "1x", results)
        audit_dedup(spark, ns.replica_dir, "100x", results)
    if ns.op in ("temporal", "all"):
        audit_temporal(spark, ns.sf1_dir, "1x", results)
        audit_temporal(spark, ns.replica_dir, "100x", results)
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
