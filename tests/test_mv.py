"""Materialized-view routing (plans/mv.py): eligibility, coarsest-view
choice, base fallback, bit-identical answers, and no base scan in the
routed plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_spark_spark.plans.inspect import explain_str
from etl_spark_spark.plans.mv import answer, materialize_rollup
from etl_spark_spark.operators.rollup import agg_snapshot

MEASURES = {"cents": ("v", "sum_cents"), "n": (None, "count")}


def _base(spark):
    return spark.range(5_000).select(
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 3).alias("b"),
        (F.col("id") % 2).alias("c"),
        (F.col("id").cast("double") / 17.0).alias("v"),
    )


def test_routes_to_coarsest_eligible_view_and_matches_base(spark, sf_dir):
    base = _base(spark)
    fine = materialize_rollup(base, "abc", ["a", "b", "c"], MEASURES)
    coarse = materialize_rollup(base, "ab", ["a", "b"], MEASURES)
    routed, source = answer(
        [fine, coarse], lambda: _base(spark), ["a"], MEASURES
    )
    assert source == "ab"  # fewest group cols wins
    want = {
        r["a"]: (r["cents"], r["n"])
        for r in agg_snapshot(base, ["a"], MEASURES).collect()
    }
    got = {r["a"]: (r["cents"], r["n"]) for r in routed.collect()}
    assert got == want  # integer partials -> bit-identical
    # the routed plan folds materialized rows; it must NOT rescan base
    plan = explain_str(routed)
    assert "Range" not in plan and "Scan parquet" not in plan


def test_falls_back_to_base_when_no_view_qualifies(spark):
    base = _base(spark)
    view = materialize_rollup(base, "ab", ["a", "b"], MEASURES)
    # group col outside the view's keys
    routed, source = answer([view], lambda: _base(spark), ["c"], MEASURES)
    assert source == "base"
    want = {
        r["c"]: (r["cents"], r["n"])
        for r in agg_snapshot(base, ["c"], MEASURES).collect()
    }
    assert {r["c"]: (r["cents"], r["n"]) for r in routed.collect()} == want
    # measure outside the view's set
    _, source = answer(
        [view], lambda: _base(spark), ["a"], {"other": ("v", "sum_cents")}
    )
    assert source == "base"


def test_name_collision_with_different_definition_is_not_routed(spark):
    """A measure whose OUTPUT name matches a view measure built from a
    different source column (or kind) must not route to the view —
    eligibility is definition equality, not name containment."""
    base = _base(spark).withColumn("w", F.col("v") * 2)
    view = materialize_rollup(base, "ab", ["a", "b"], MEASURES)
    # same out name 'cents', different source column
    routed, source = answer(
        [view], lambda: base, ["a"], {"cents": ("w", "sum_cents")}
    )
    assert source == "base"
    want = {
        r["a"]: r["cents"]
        for r in agg_snapshot(base, ["a"], {"cents": ("w", "sum_cents")}).collect()
    }
    assert {r["a"]: r["cents"] for r in routed.collect()} == want
    # same out name 'n', different kind
    _, source = answer(
        [view], lambda: base, ["a"], {"n": ("v", "sum_cents")}
    )
    assert source == "base"
