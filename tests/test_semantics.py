"""Semantics-pinning unit tests for the hazards in SURVEY.md §4:
keep-latest dedup determinism, the allocation coalesce-cascade (orphan
credit and zero-denominator branches), unionByName null-widening, the
decimal cast policy, and normalization golden strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.functions.normalize import (
    cnpj_normalize,
    etiqueta,
    strip_normalize,
)
from etl_spark_spark.functions.nulls import cast_decimals, fill_nulls_by_type
from etl_spark_spark.operators.dedup import dedup_latest
from etl_spark_spark.operators.reconcile import (
    allocate_proportional,
    reconcile_full_outer,
)
from etl_spark_spark.operators.setops import union_by_name, union_strict


def test_dedup_latest_keeps_newest(spark):
    df = spark.createDataFrame(
        [("a", 1, "old"), ("a", 3, "new"), ("a", 2, "mid"), ("b", 9, "only")],
        ["k", "ts", "v"],
    )
    out = dedup_latest(df, ["k"], [F.col("ts").desc()]).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [("a", "new"), ("b", "only")]


def test_dedup_latest_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 1, 30)], ["k", "ts", "id"]
    )
    out = dedup_latest(df, ["k"], [F.col("ts").desc(), F.col("id")]).collect()
    assert out[0].id == 10


def test_allocation_cascade_branches(spark):
    # (weight, total, amount) -> expected alias value
    rows = [
        (2.0, 8.0, 100.0, 25.0),    # proportional share
        (2.0, 0.0, 100.0, 100.0),   # zero denominator -> whole amount
        (2.0, None, 100.0, 100.0),  # NULL denominator -> whole amount
        (None, 8.0, 100.0, 100.0),  # NULL weight -> whole amount
        (2.0, 8.0, None, 0.0),      # NULL amount -> 0
    ]
    df = spark.createDataFrame(
        [r[:3] for r in rows], schema="w double, t double, a double"
    )
    out = allocate_proportional(df, "w", "t", "a", "alloc").collect()
    assert [r.alloc for r in out] == [r[3] for r in rows]


def test_reconcile_full_outer_equivalence(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], ["k", "lv"])
    right = spark.createDataFrame([(2, "r2"), (3, "r3")], ["k", "rv"])
    a = reconcile_full_outer(left, right, ["k"], style="anti_union")
    b = reconcile_full_outer(left, right, ["k"], style="full_outer")
    rows_a = {(r.k, r.lv, r.rv) for r in a.collect()}
    rows_b = {(r.k, r.lv, r.rv) for r in b.collect()}
    assert rows_a == rows_b == {(1, "l1", None), (2, "l2", "r2"), (3, None, "r3")}


def test_union_by_name_widens(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "only_a"])
    b = spark.createDataFrame([(2, 9.5)], ["k", "only_b"])
    out = union_by_name(a, b).orderBy("k").collect()
    assert out[0].only_b is None and out[1].only_a is None


def test_union_strict_rejects_mismatch(spark):
    a = spark.createDataFrame([(1,)], ["x"])
    b = spark.createDataFrame([(1,)], ["y"])
    with pytest.raises(ValueError, match="column mismatch"):
        union_strict(a, b)


def test_cast_decimals_policy(spark):
    df = spark.createDataFrame(
        [(1,)], schema=T.StructType([T.StructField("k", T.IntegerType())])
    ).select(F.col("k"), F.lit("1.50").cast(T.DecimalType(10, 2)).alias("money"))
    out = cast_decimals(df)
    assert dict(out.dtypes)["money"] == "double"
    out2 = cast_decimals(df, to=T.DecimalType(38, 6))
    assert dict(out2.dtypes)["money"] == "decimal(38,6)"


def test_fill_nulls_by_type(spark):
    df = spark.createDataFrame(
        [(1, None, None)], schema="k int, d double, s string"
    )
    row = fill_nulls_by_type(df).collect()[0]
    assert row.d == 0.0 and row.s is None


def test_normalize_golden_strings(spark):
    df = spark.createDataFrame(
        [("  Açaí  do  Pará ", "12.345.678/0001-95", " 42 ")],
        ["nome", "cnpj", "code"],
    )
    row = df.select(
        strip_normalize("nome").alias("n"),
        cnpj_normalize("cnpj").alias("c"),
        etiqueta("code").alias("e"),
    ).collect()[0]
    assert row.n == "ACAI DO PARA"
    assert row.c == "012345678000195"
    assert row.e == "0" * 28 + "42"


def test_strip_normalize_or_default(spark):
    from etl_spark_spark.functions.normalize import strip_normalize_or_default

    df = spark.createDataFrame([("  açaí ",), (None,)], ["s"])
    rows = df.select(
        strip_normalize_or_default("s", "sem nome prod").alias("n")
    ).collect()
    assert [r.n for r in rows] == ["ACAI", "SEM NOME PROD"]


def test_strip_normalize_covers_reference_charset(spark):
    """The reference's translate map folds Slavic/German diacritics
    (š->s, ž->z, ď->d, ẞ->s, ...); ours must fold every char it folds."""
    df = spark.createDataFrame([("Škoda Plzeň Groß ďábel ůž",)], ["s"])
    row = df.select(strip_normalize("s").alias("n")).collect()[0]
    # translate is 1:1 per char, so ß folds to a single 's' — the same
    # choice the reference's map makes (ẞ->s), not the linguistic 'ss'
    assert row.n == "SKODA PLZEN GROS DABEL UZ"


def test_partitioned_sum_agg_equals_window_form(spark):
    """Round-10 (VERDICT task 7) + round-11 broadcast audit: the
    aggregate group-total form must be value-identical to the window
    form — including NULL group keys (a window treats NULL as a group;
    the join-back is null-safe) — under BOTH join-back strategies.
    broadcast=True (bounded-cardinality contract) must pin the
    BroadcastHashJoin plan; the default leaves the choice to AQE (a
    fact-scale group key makes the totals table fact-scaling, where a
    forced broadcast is an OOM at the design point)."""
    from etl_spark_spark.operators.windows import (
        partitioned_sum,
        partitioned_sum_agg,
    )
    from pyspark.sql import functions as F

    rows = [
        ("g1", 10), ("g1", 5), ("g2", 7), (None, 3), (None, None),
        ("g3", None), ("g1", 2),
    ]
    df = spark.createDataFrame(rows, "k string, v int")
    want = {
        (r["k"], r["v"], r["t"])
        for r in partitioned_sum(df, ["k"], "v", "t").collect()
    }
    for bc in (False, True):
        got_df = partitioned_sum_agg(df, ["k"], "v", "t", broadcast=bc)
        got = {(r["k"], r["v"], r["t"]) for r in got_df.collect()}
        assert got == want, f"broadcast={bc}"
        assert got_df.columns == ["k", "v", "t"]
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        if bc:
            assert "BroadcastHashJoin" in plan
