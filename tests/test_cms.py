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


def _hll_py_cells(keys):
    import hashlib

    from etl_spark_spark.operators.sketches import (
        HLL_M,
        HLL_RANK_MAX,
        HLL_W_BITS,
    )

    cells = {}
    for key in keys:
        h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
        b, w = h % HLL_M, h // HLL_M
        rank = HLL_RANK_MAX if w == 0 else HLL_W_BITS - w.bit_length() + 1
        cells[b] = max(cells.get(b, 0), rank)
    return cells


def test_hll_cells_match_python_replay(spark):
    from etl_spark_spark.operators.sketches import hll_cells

    keys = [f"key-{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys * 2], "term string")
    got = {
        r["bucket"]: r["m_rank"] for r in hll_cells(df, "term").collect()
    }
    assert got == _hll_py_cells(keys)  # duplicates don't move registers


def test_hll_estimate_within_bound_and_merge(spark):
    from pyspark.sql import functions as F

    from etl_spark_spark.operators.sketches import hll_cells, hll_estimate

    a = [f"a{i}" for i in range(3000)]
    b = [f"b{i}" for i in range(2000)]
    df = spark.createDataFrame(
        [("A", k) for k in a] + [("B", k) for k in b], "g string, term string"
    )
    cells = hll_cells(df, "term", group_cols=["g"])
    est = {
        r["g"]: r["est_milli"] / 1000.0
        for r in hll_estimate(cells, group_cols=["g"]).collect()
    }
    # 1024 registers -> sigma ~3.2%; assert a generous 5-sigma band
    assert abs(est["A"] / 3000 - 1) < 0.16
    assert abs(est["B"] / 2000 - 1) < 0.16
    # merged sketch == one-shot sketch over the union (disjoint keys)
    merged = cells.groupBy("bucket").agg(F.max("m_rank").alias("m_rank"))
    one_shot = hll_cells(df.select("term"), "term")
    assert {
        (r["bucket"], r["m_rank"]) for r in merged.collect()
    } == {(r["bucket"], r["m_rank"]) for r in one_shot.collect()}


def test_quantile_sketch_merge_law_and_determinism(spark, sf_dir):
    """Round-12 quantile leg of the portable-sketch family: disjoint-
    shard sketches merged == whole-data sketch (cell-for-cell), the
    sample is the deterministic md5 subset (rebuilding yields the
    identical sketch), quantile estimates flow through the exact
    weighted-quantile machinery, and NULL values raise loudly like
    the rest of the cumulative-distribution family."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from etl_spark_spark.operators.sketches import (
        quantile_sketch_build,
        quantile_sketch_merge,
        quantile_sketch_quantiles,
    )
    from etl_spark_spark.sources import table

    li = table(
        spark, sf_dir, "lineitem",
        columns=[
            "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice",
        ],
    )
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("#"),
        F.col("l_linenumber").cast("string"),
    )
    whole = quantile_sketch_build(
        li, key, "l_extendedprice", ["l_returnflag"], sample_mod=8
    )
    cells = {tuple(r) for r in whole.collect()}
    assert len(cells) > 50  # non-vacuous sample at sf0.001

    # disjoint shards (orderkey parity) merge to the identical sketch
    s0 = quantile_sketch_build(
        li.filter(F.col("l_orderkey") % 2 == 0),
        key, "l_extendedprice", ["l_returnflag"], sample_mod=8,
    )
    s1 = quantile_sketch_build(
        li.filter(F.col("l_orderkey") % 2 == 1),
        key, "l_extendedprice", ["l_returnflag"], sample_mod=8,
    )
    merged = quantile_sketch_merge(
        s0.unionByName(s1), "l_extendedprice", ["l_returnflag"]
    )
    assert {tuple(r) for r in merged.collect()} == cells

    # deterministic: a rebuild is cell-identical
    again = quantile_sketch_build(
        li, key, "l_extendedprice", ["l_returnflag"], sample_mod=8
    )
    assert {tuple(r) for r in again.collect()} == cells

    # estimates ride exact_weighted_quantiles: sane order statistics
    est = {
        r["l_returnflag"]: (r["wq25"], r["wq50"], r["wq75"])
        for r in quantile_sketch_quantiles(
            whole, ["l_returnflag"], "l_extendedprice"
        ).collect()
    }
    for lo, mid, hi in est.values():
        assert lo <= mid <= hi

    # loud NULL guard, family discipline
    bad = spark.createDataFrame(
        [("k1", "g", None), ("k2", "g", 2.0)], "k string, g string, v double"
    )
    with _pytest.raises(
        Exception, match="quantile_sketch_build: NULL v"
    ):
        quantile_sketch_build(bad, "k", "v", ["g"], sample_mod=1).collect()

    # invalid rate rejected
    with _pytest.raises(ValueError, match="sample_mod"):
        quantile_sketch_build(li, key, "l_extendedprice", sample_mod=0)
