"""Semantics pins for operators/sketches.py (count-min sketch)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from etl_spark_spark.operators.sketches import cms_build, cms_estimate


def _occ_df(spark, terms):
    return spark.createDataFrame([(t,) for t in terms], "term string")


def _bucket_py(term: str, row: int, width: int) -> int:
    return (
        int(hashlib.md5(f"cms{row}~{term}".encode()).hexdigest()[:15], 16)
        % width
    )


def test_estimate_matches_python_grid_and_never_underestimates(spark):
    """Grid replayed in pure Python: every cell equal, every estimate
    = min over rows, and est >= exact for every term (the CMS
    guarantee) — on a deliberately tiny grid so collisions happen."""
    w, d = 16, 3
    stream = (
        ["apple"] * 40 + ["banana"] * 25 + ["cherry"] * 10 +
        [f"tail{i}" for i in range(30)]
    )
    exact = Counter(stream)
    grid: Counter = Counter()
    for t in stream:
        for r in range(d):
            grid[(r, _bucket_py(t, r, w))] += 1

    sketch = cms_build(_occ_df(spark, stream), "term", width=w, depth=d)
    got_cells = {
        (r["row"], r["bucket"]): r["cnt"] for r in sketch.collect()
    }
    assert got_cells == dict(grid)

    probes = _occ_df(spark, sorted(exact))
    est = {
        r["term"]: r["est"]
        for r in cms_estimate(
            sketch, probes, "term", width=w, depth=d
        ).collect()
    }
    for t, n in exact.items():
        expect = min(grid[(r, _bucket_py(t, r, w))] for r in range(d))
        assert est[t] == expect
        assert est[t] >= n
    # tiny grid must actually collide somewhere or the pin is vacuous
    assert any(est[t] > n for t, n in exact.items())


def test_grouped_build_merges_to_direct_build(spark):
    """sum-merge of per-group sketches == one-shot sketch (the property
    the registered query's oracle re-proves on real data)."""
    rows = [("a", t) for t in ["x", "y", "x"]] + [
        ("b", t) for t in ["x", "z", "z", "w"]
    ]
    df = spark.createDataFrame(rows, "g string, term string")
    per_g = cms_build(df, "term", width=8, depth=2, group_cols=["g"])
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in per_g.groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(df, "term", width=8, depth=2).collect()
    }
    assert merged == direct


def test_validation(spark):
    with pytest.raises(ValueError):
        cms_build(_occ_df(spark, ["x"]), "term", width=0)
    with pytest.raises(ValueError):
        cms_build(_occ_df(spark, ["x"]), "term", width=8, depth=0)
