"""Plan-shape assertions: the scale properties are pinned, not hoped
for — filters reach the parquet scan, scans read only projected
columns, dimension joins broadcast."""

from __future__ import annotations

import __spark_entry__ as entrymod
from etl_spark_spark.plans import explain_str, pushed_filters, scan_schema_columns


def test_range_filter_pushed_to_scan(spark, sf_dir):
    df = entrymod.q_monthly_orders_1995(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "o_orderdate" in pushed, f"range predicate not pushed: {pushed}"
    assert "GreaterThanOrEqual" in pushed and "LessThan" in pushed


def test_superdesconto_scans_pruned(spark, sf_dir):
    df = entrymod.q_superdesconto(spark, sf_dir)
    scans = scan_schema_columns(df)
    part_scans = [s for s in scans if "p_partkey" in s]
    assert part_scans and all(
        s <= {"p_partkey", "p_name", "p_brand", "p_retailprice"} for s in part_scans
    ), f"part scan reads too much: {part_scans}"
    li_scans = [s for s in scans if "l_partkey" in s]
    assert li_scans and all("l_tax" not in s and "l_quantity" not in s for s in li_scans), (
        f"lineitem scan not pruned: {li_scans}"
    )


def test_superdesconto_joins_broadcast(spark, sf_dir):
    plan = explain_str(entrymod.q_superdesconto(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, "dim joins must broadcast"
    assert "SortMergeJoin" not in plan


def test_equality_filter_pushed(spark, sf_dir):
    df = entrymod.q_events_props_map(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "event_type" in pushed


def test_emb_near_dup_no_driver_materialization(spark, sf_dir, monkeypatch):
    """cosine_near_dup_pairs must be fully distributed: constructing the
    operator may not collect the corpus to the driver (the round-1
    implementation broadcast a driver-side toPandas() — a driver OOM at
    real scale), and the executed plan must be a grouped Arrow task, not
    a broadcast of driver data."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):
        raise AssertionError("driver-side materialization in operator build")

    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    df = entrymod.q_emb_near_dup(spark, sf_dir)  # must stay lazy
    monkeypatch.undo()
    plan = explain_str(df)
    assert "FlatMapGroupsInPandas" in plan
    assert "Broadcast" not in plan
