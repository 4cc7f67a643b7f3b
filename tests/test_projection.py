"""Semantics pins for operators/projection.py (JL +-1 projection) and
operators/stats.py:integer_tercile_buckets."""

from __future__ import annotations

import math
import random

import pytest

from etl_spark_spark.operators.projection import (
    jl_project,
    jl_signs,
)


def test_matches_numpy_replay(spark):
    """Projected coordinates equal a pure-Python replay: quantize each
    component, dot with the md5-derived sign rows."""
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = {
        r["vec_id"]: [r[f"p{j}"] for j in range(4)]
        for r in jl_project(df, "vec_id", "v", out_dim=4, dim=8).collect()
    }
    signs = jl_signs(8, 4)

    def q(x):
        # HALF_UP like Spark's BigDecimal round (away from zero)
        return int(math.floor(abs(x) * 10**6 + 0.5)) * (1 if x >= 0 else -1)

    for i, v in rows:
        expect = [sum(s * q(x) for s, x in zip(signs[j], v)) for j in range(4)]
        assert out[i] == expect


def test_distance_preservation_on_average(spark):
    """The JL property (sanity, not a proof): squared projected
    distances, rescaled by 1/k, concentrate near the true squared
    distances — mean ratio within [0.5, 2] for k=16 on random pairs."""
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(16)]
        for r in jl_project(df, "vec_id", "v", out_dim=16, dim=32).collect()
    }
    ratios = []
    for a in range(0, 20, 2):
        b = a + 1
        true = sum(
            (x - y) ** 2 for x, y in zip(rows[a][1], rows[b][1])
        ) * (10**6) ** 2
        got = sum(
            (pa - pb) ** 2 for pa, pb in zip(proj[a], proj[b])
        ) / 16.0
        ratios.append(got / true)
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 2.0, f"JL distance ratio off: {mean}"


def test_jl_validation_and_dim_inference(spark):
    df = spark.createDataFrame([(1, [0.5, -0.5])], "vec_id long, v array<double>")
    with pytest.raises(ValueError):
        jl_project(df, "vec_id", "v", out_dim=0)
    # dim inferred from first row
    r = jl_project(df, "vec_id", "v", out_dim=2).collect()[0]
    signs = jl_signs(2, 2)
    assert [r["p0"], r["p1"]] == [
        signs[0][0] * 500000 - signs[0][1] * 500000,
        signs[1][0] * 500000 - signs[1][1] * 500000,
    ]


def test_integer_tercile_buckets_with_ties(spark):
    from etl_spark_spark.operators.stats import integer_tercile_buckets

    # group g: values 1,1,1,2,3,3 (n=6): e1 = smallest v with cum >=
    # ceil(6/3)=2 -> 1; e2 = cum >= ceil(12/3)=4 -> 2.
    rows = [("g", v) for v in [1, 1, 1, 2, 3, 3]] + [("h", 10)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = integer_tercile_buckets(df, ["g"], "v").collect()
    got = {}
    for r in out:
        got.setdefault((r["g"], r["v"]), set()).add(r["bucket"])
    assert got[("g", 1)] == {"head"}   # all ties share the bucket
    assert got[("g", 2)] == {"middle"}
    assert got[("g", 3)] == {"tail"}
    # single-value group: e1 = e2 = 10, everything head
    assert got[("h", 10)] == {"head"}


def test_psi_drift_matches_python_replay(spark):
    """PSI pinned against a pure-Python replay on a skewed split —
    decile edges from the reference side with integer targets, add-1
    smoothing, milli-rounded."""
    import math
    import random

    from etl_spark_spark.operators.stats import psi_drift

    rng = random.Random(3)
    ref = [int(rng.gauss(500, 100)) for _ in range(400)]
    cur = [int(rng.gauss(560, 120)) for _ in range(300)]  # drifted
    rows = [("g", "A", v) for v in ref] + [("g", "B", v) for v in cur]
    df = spark.createDataFrame(rows, "g string, variant string, v long")
    out = psi_drift(df, ["g"], "v", "variant").collect()[0]

    n = len(ref)
    sref = sorted(ref)
    edges = []
    for i in range(1, 10):
        target = (i * n + 9) // 10
        # smallest value with cum count >= target
        edges.append(sref[target - 1])

    def bin_of(v):
        for i, e in enumerate(edges, 1):
            if v <= e:
                return i
        return 10

    ca = [1] * 10
    cb = [1] * 10
    for v in ref:
        ca[bin_of(v) - 1] += 1
    for v in cur:
        cb[bin_of(v) - 1] += 1
    na, nb = sum(ca), sum(cb)
    psi = sum(
        (a / na - b / nb) * math.log((a * nb) / (b * na))
        for a, b in zip(ca, cb)
    )
    assert out["n_ref"] == n and out["n_cur"] == len(cur)
    assert out["psi_milli"] == round(psi * 1000)
    assert out["psi_milli"] > 200  # the planted drift trips the alarm


def test_did_matches_python_replay(spark, sf_dir):
    """DiD pinned against a pandas replay of the same cohort/period
    split on the fixture events."""
    import hashlib

    import pandas as pd

    import entry_queries.relational as rel

    out = rel.q_did_purchase_uplift(spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[(ev.event_type == "purchase") & ev.value.notna()].copy()
    ev["cohort"] = ev.user_id.map(
        lambda u: "A"
        if hashlib.md5(str(u).encode()).hexdigest()[0] < "8"
        else "B"
    )
    ts = pd.to_datetime(ev.ts)
    if ts.dt.tz is not None:
        ts = ts.dt.tz_localize(None)
    ev["post"] = ts >= pd.Timestamp("2024-01-16")
    ev["cents"] = (ev.value * 100).round().astype("int64")
    g = ev.groupby(["cohort", "post"])["cents"].agg(["count", "sum"])

    def m(c, p):
        return g.loc[(c, p), "sum"] / g.loc[(c, p), "count"]

    did = (m("B", True) - m("B", False)) - (m("A", True) - m("A", False))
    assert out["n_a_pre"] == g.loc[("A", False), "count"]
    assert out["n_b_post"] == g.loc[("B", True), "count"]
    assert abs(out["did_cents"] - did) < 1e-9


def test_jl_malformed_vector_fails_loudly_both_engines(spark):
    """Regression (ADVICE r10): a row whose vector length != dim must
    RAISE in both the Spark operator and the DuckDB mirror — not
    silently emit NULL coordinates (Spark zip_with pads with NULL) or
    a partial sum (DuckDB list_sum skips NULLs)."""
    import duckdb

    from etl_spark_spark.operators.projection import jl_project_sql

    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125]), (2, [0.5, -0.25])],
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception, match="vector length != dim=3"):
        jl_project(df, "vec_id", "v", out_dim=2, dim=3).collect()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT 1::BIGINT vec_id, "
        "[0.5, -0.25, 0.125]::DOUBLE[] v "
        "UNION ALL SELECT 2, [0.5, -0.25]::DOUBLE[]"
    )
    with pytest.raises(Exception, match="vector length != dim=3"):
        con.execute(
            jl_project_sql("t", "vec_id", "v", out_dim=2, dim=3)
        ).fetchall()
    # well-formed rows still project identically in both engines
    good_sql = con.execute(
        jl_project_sql(
            "(SELECT * FROM t WHERE vec_id = 1)", "vec_id", "v", 2, 3
        )
    ).fetchall()
    good_spark = [
        (r["vec_id"], r["p0"], r["p1"])
        for r in jl_project(
            df.filter("vec_id = 1"), "vec_id", "v", out_dim=2, dim=3
        ).collect()
    ]
    assert [tuple(r) for r in good_sql] == good_spark


def test_jl_null_vector_gets_distinct_message_both_engines(spark):
    """Round-11 (ADVICE r10): a NULL vector must raise with its own
    'NULL vector' message, not the misleading length-mismatch one
    (size(NULL) is NULL, so it previously fell into the otherwise
    branch) — an operator debugging the failure sees the real cause."""
    import duckdb

    from etl_spark_spark.operators.projection import jl_project_sql

    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.125]), (2, None)],
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception, match="NULL vector at vec_id=2"):
        jl_project(df, "vec_id", "v", out_dim=2, dim=3).collect()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tn AS SELECT 1::BIGINT vec_id, "
        "[0.5, -0.25, 0.125]::DOUBLE[] v "
        "UNION ALL SELECT 2, NULL"
    )
    with pytest.raises(Exception, match="NULL vector at 2"):
        con.execute(
            jl_project_sql("tn", "vec_id", "v", out_dim=2, dim=3)
        ).fetchall()


def test_psi_drift_surfaces_current_only_groups(spark):
    """Regression (ADVICE r10): a group present only in the CURRENT
    variant (a brand-new event type — the case a drift monitor exists
    to catch) must appear as a sentinel row (n_ref=0, psi_milli=NULL),
    not vanish through the edges inner join."""
    from etl_spark_spark.operators.stats import psi_drift

    rows = [("old", "A", v) for v in range(100)]
    rows += [("old", "B", v + 3) for v in range(80)]
    rows += [("brand_new", "B", v) for v in range(7)]
    df = spark.createDataFrame(rows, "grp string, variant string, v long")
    out = {r["grp"]: r for r in psi_drift(df, ["grp"], "v", "variant").collect()}
    assert set(out) == {"old", "brand_new"}
    nb = out["brand_new"]
    assert nb["n_ref"] == 0 and nb["n_cur"] == 7
    assert nb["psi_milli"] is None
    assert out["old"]["n_ref"] == 100 and out["old"]["n_cur"] == 80
