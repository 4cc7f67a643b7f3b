"""Data-quality expectations: fail-closed NULL semantics, quarantine
routing, referential orphan counting, and the one-pass plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_spark.operators.quality import (
    expectation_metrics,
    fk_violation_count,
    quarantine,
)


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A"),
            (2, -5.0, "A"),     # qty violation
            (3, None, "N"),     # NULL qty -> fail-closed violation
            (4, 20.0, "X"),     # domain violation
            (5, 30.0, None),    # NULL flag -> fail-closed violation
        ],
        "id long, qty double, flag string",
    )


def _rules():
    return {
        "qty_positive": F.col("qty") > 0,
        "flag_domain": F.col("flag").isin("A", "N", "R"),
    }


def test_expectations_fail_closed(spark):
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in expectation_metrics(_dirty(spark), _rules()).collect()
    }
    assert got == {"qty_positive": (5, 2), "flag_domain": (5, 2)}


def test_quarantine_partitions_rows(spark):
    good, bad = quarantine(_dirty(spark), _rules())
    assert sorted(r["id"] for r in good.collect()) == [1]
    failed = {r["id"]: list(r["failed_rules"]) for r in bad.collect()}
    assert failed == {
        2: ["qty_positive"],
        3: ["qty_positive"],
        4: ["flag_domain"],
        5: ["flag_domain"],
    }


def test_fk_orphans_counts_nulls(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 11), (3, None), (4, 99)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (11,)], "pk long")
    n = fk_violation_count(child, "fk", parent, "pk").collect()[0]["n_violations"]
    assert n == 2  # NULL fk and 99 are both orphans


def test_expectations_single_scan(spark, sf_dir):
    """All rules fold into ONE aggregate over ONE scan — no
    rule-per-pass re-reads."""
    import __spark_entry__ as entrymod

    li = entrymod.table(spark, sf_dir, "lineitem")
    plan = expectation_metrics(
        li, {"a": F.col("l_quantity") > 0, "b": F.col("l_discount") >= 0}
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
