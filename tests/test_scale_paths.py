"""Scale-path operators: salted aggregation exactness, Hive-partitioned
write → partition-pruned read, bucketed tables joining without an
exchange, and custom stateful streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_spark.functions.money import money_sum
from etl_spark_spark.operators.skew import salted_sum
from etl_spark_spark.plans import explain_str
from etl_spark_spark.sinks import write, write_bucketed
from etl_spark_spark.sources import read_events, table
from etl_spark_spark.streaming import sessionize_batch
from etl_spark_spark.streaming.stateful import (
    stream_session_agg,
    stream_user_totals,
)
from etl_spark_spark.streaming.stream import run_available_now


def test_salted_sum_exact(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag): (r.s, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(money_sum("l_extendedprice").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    salted = salted_sum(
        li,
        ["l_returnflag"],
        {"s_cents": F.sum(cents), "n": F.count("*")},
        buckets=8,
    )
    got = {
        r.l_returnflag: (r.s_cents / 100.0, r.n) for r in salted.collect()
    }
    assert got == plain


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_part")
    events = read_events(spark, "/root/testdata/sf0.001").withColumn(
        "dt", F.col("ts").cast("date").cast("string")
    )
    write(events, path, partition_by=["dt"])
    back = spark.read.parquet(path).filter(F.col("dt") == "2024-01-05")
    plan = explain_str(back)
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters")[1][:200]
    n_direct = spark.read.parquet(f"{path}/dt=2024-01-05").count()
    assert back.count() == n_direct > 0


def test_bucketed_join_no_exchange(spark, tmp_path):
    # tables land in the session's default warehouse dir (gitignored)
    orders = table(spark, "/root/testdata/sf0.001", "orders")
    customer = table(spark, "/root/testdata/sf0.001", "customer")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(customer, "b_customer", ["c_custkey"], num_buckets=8)
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = explain_str(j)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed tables must join without a shuffle"
        )
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_stream_user_totals_matches_batch(spark, sf_dir):
    rows = run_available_now(
        stream_user_totals(spark, sf_dir, glob="events.parquet"),
        query_name="t_user_totals",
        output_mode="update",
    )
    # update-mode memory sink: last emitted row per user is the total
    finals = {}
    for r in rows:
        finals[r.user_id] = r.n_events
    batch = {
        r.user_id: r.n
        for r in read_events(spark, sf_dir, with_ts=False)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert finals == batch


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream purchase←click interval join equals the same join
    run in batch over the same files."""
    from etl_spark_spark.streaming.stateful import stream_purchase_click_join

    emitted = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in run_available_now(
            stream_purchase_click_join(spark, sf_dir, glob="events.parquet"),
            query_name="t_ssj",
            output_mode="append",
        )
    }
    ev = read_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in purchases.join(
            clicks,
            (purchases.user_id == clicks.user_id)
            & (clicks.click_ts <= purchases.purchase_ts)
            & (
                clicks.click_ts
                >= purchases.purchase_ts - F.expr("INTERVAL 30 minutes")
            ),
        ).collect()
    }
    assert emitted, "stream-stream join should emit matches"
    assert emitted <= batch
    # with availableNow + watermark the stream may retain only the tail;
    # require substantial agreement, not mere overlap
    assert len(emitted) >= len(batch) * 0.5


def test_stream_sessions_subset_of_batch(spark, sf_dir):
    """Sessions emitted by the watermarked stream must match batch
    sessions exactly (the stream may hold back the newest sessions
    still inside the watermark horizon)."""
    emitted = run_available_now(
        stream_session_agg(spark, sf_dir, glob="events.parquet"),
        query_name="t_sessions",
        output_mode="append",
    )
    batch = (
        sessionize_batch(read_events(spark, sf_dir), "ts", ["user_id"], 300)
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros(F.col("ts"))).alias("session_start_us"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    batch_set = {(r.user_id, r.session_start_us, r.n_events) for r in batch}
    assert emitted, "watermark should have closed at least one session"
    for r in emitted:
        assert (r.user_id, r.session_start_us, r.n_events) in batch_set
