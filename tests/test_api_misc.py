"""API-completeness tests for library surfaces not exercised by the
oracle queries: parameterized widths/scales, set-op bag semantics,
salting bounds, plan helpers, decimal/timestamp policies."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.functions.money import money_sum
from etl_spark_spark.functions.normalize import cnpj_normalize, etiqueta
from etl_spark_spark.functions.nulls import cast_decimals
from etl_spark_spark.operators.setops import except_all, intersect_all
from etl_spark_spark.operators.skew import with_salt
from etl_spark_spark.plans import explain_str, pushed_filters
from etl_spark_spark.sources import table


def test_etiqueta_custom_width(spark):
    row = (
        spark.range(1)
        .select(etiqueta(F.lit("7"), width=5).alias("e"))
        .collect()[0]
    )
    assert row.e == "00007"


def test_cnpj_width_and_truncation(spark):
    out = (
        spark.createDataFrame([("12.345/6789-0123456",)], ["c"])
        .select(cnpj_normalize("c", width=10).alias("n"))
        .collect()[0]
        .n
    )
    # lpad truncates overlong input to the target width (left-most chars)
    assert len(out) == 10


def test_money_sum_custom_scale(spark):
    df = spark.createDataFrame([(1.2345,), (2.1111,)], ["v"])
    got = df.agg(money_sum("v", scale=4).alias("s")).collect()[0].s
    assert got == 3.3456


def test_intersect_except_bag_semantics(spark):
    a = spark.createDataFrame([(1,), (1,), (2,)], ["x"])
    b = spark.createDataFrame([(1,), (3,)], ["x"])
    assert sorted(r.x for r in intersect_all(a, b).collect()) == [1]
    assert sorted(r.x for r in except_all(a, b).collect()) == [1, 2]


def test_with_salt_bounds(spark):
    df = with_salt(spark.range(1000), buckets=8)
    salts = {r["__salt"] for r in df.select("__salt").distinct().collect()}
    assert salts <= set(range(8)) and len(salts) > 1


def test_cast_decimals_timestamp_ntz(spark):
    df = spark.createDataFrame([("2024-01-01 10:00:00",)], ["s"]).select(
        F.col("s").cast("timestamp").alias("ts"),
        F.lit("9.99").cast(T.DecimalType(5, 2)).alias("d"),
    )
    out = cast_decimals(df, timestamp_ntz=True)
    types = dict(out.dtypes)
    assert types["d"] == "double" and types["ts"] == "timestamp_ntz"


def test_asof_join_semantics(spark):
    from etl_spark_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")], ["k", "lts", "pid"]
    )
    right = spark.createDataFrame(
        [(1, 10, "c_at_10"), (1, 15, "c_at_15"), (3, 1, "other_key")],
        ["k", "rts", "cid"],
    )
    out = {
        r.pid: r.cid
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["cid"], tiebreak="cid"
        ).collect()
    }
    # equal timestamp matches (>=); later left sees latest right; no
    # prior right -> NULL
    assert out == {"p1": "c_at_10", "p2": "c_at_15", "p3": None}


def test_asof_join_nullable_payload_row_coherence(spark):
    """A matched right row whose payload value is NULL must yield NULL
    (not a stale value from an older row), and multi-column payloads
    must all come from the SAME matched row — DuckDB ASOF semantics."""
    from pyspark.sql import types as T2

    from etl_spark_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20, "p1"), (1, 12, "p0")], ["k", "lts", "pid"])
    right = spark.createDataFrame(
        [(1, 10, "old_a", "old_b"), (1, 15, None, "new_b")],
        T2.StructType(
            [
                T2.StructField("k", T2.LongType()),
                T2.StructField("rts", T2.LongType()),
                T2.StructField("a", T2.StringType()),
                T2.StructField("b", T2.StringType()),
            ]
        ),
    )
    out = {
        r.pid: (r.a, r.b)
        for r in asof_join(left, right, ["k"], "lts", "rts", ["a", "b"]).collect()
    }
    # p1 matches rts=15: a is legitimately NULL there, b comes from the
    # same row; p0 matches rts=10
    assert out == {"p1": (None, "new_b"), "p0": ("old_a", "old_b")}


def test_asof_join_non_null_fast_path_equivalent(spark):
    """With the payload_non_null promise, the per-column carry must
    produce exactly the struct carry's result (on data honoring the
    promise), including NULLs for left rows with no prior right row."""
    from etl_spark_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3"), (1, 3, "p4")],
        ["k", "lts", "pid"],
    )
    right = spark.createDataFrame(
        [(1, 10, "a10", 100), (1, 15, "a15", 150), (3, 1, "ax", 1)],
        ["k", "rts", "a", "b"],
    )
    args = (left, right, ["k"], "lts", "rts", ["a", "b"])
    slow = {r.pid: (r.a, r.b) for r in asof_join(*args).collect()}
    fast = {
        r.pid: (r.a, r.b)
        for r in asof_join(*args, payload_non_null=True).collect()
    }
    assert fast == slow
    assert fast["p4"] == (None, None)


def test_point_in_interval_join_left_outer(spark):
    """how='left' keeps unmatched intervals (right cols NULL) and emits
    one row per matched point; unsupported modes raise."""
    import pytest

    from etl_spark_spark.operators.ranges import point_in_interval_join

    left = spark.createDataFrame(
        [(1, 100, 200, "i1"), (1, 900, 950, "i2"), (2, 100, 200, "i3")],
        ["k", "s", "e", "iid"],
    )
    right = spark.createDataFrame(
        [(1, 150, "a"), (1, 160, "b"), (1, 940, "c"), (2, 999, "d")],
        ["k", "p", "pid"],
    )
    rows = point_in_interval_join(
        left, right, ["k"], "s", "e", "p", bin_us=50, how="left"
    ).collect()
    got = sorted((r.iid, r.pid) for r in rows)
    assert got == [("i1", "a"), ("i1", "b"), ("i2", "c"), ("i3", None)]
    with pytest.raises(ValueError):
        point_in_interval_join(left, right, ["k"], "s", "e", "p", how="full")


def test_load_config_layering(tmp_path, monkeypatch):
    from etl_spark_spark.config import load_config

    f = tmp_path / "env"
    f.write_text('A=1\n# comment\nB="two"\nBAD LINE\n')
    monkeypatch.setenv("APP_B", "env-wins")
    monkeypatch.setenv("OTHER_C", "ignored")
    cfg = load_config(f, prefix="APP_", overrides={"D": "4"})
    assert cfg == {"A": "1", "B": "env-wins", "D": "4"}


def test_plan_helpers_roundtrip(spark, sf_dir):
    df = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 7)
    assert "o_orderkey" in " ".join(pushed_filters(df))
    text = explain_str(df, mode="simple")
    assert "Scan parquet" in text


def test_scd2_apply_semantics(spark):
    """SCD2 fold: change closes + reopens, unchanged passes through,
    new key opens, missing key closes only under close_missing; and
    scd2_as_of reconstructs the dimension at any instant."""
    from etl_spark_spark.operators.scd import scd2_apply, scd2_as_of

    snap1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    snap2 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    h1 = scd2_apply(None, snap1, ["k"], "2024-01-01")
    h2 = scd2_apply(h1, snap2, ["k"], "2024-02-01", close_missing=True)
    rows = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in h2.collect()
    }
    assert rows == {
        (1, "a", "2024-01-01", None, True),            # unchanged
        (2, "b", "2024-01-01", "2024-02-01", False),   # closed
        (2, "B", "2024-02-01", None, True),            # reopened
        (3, "c", "2024-01-01", "2024-02-01", False),   # missing -> closed
        (4, "d", "2024-02-01", None, True),            # new
    }
    at_jan = {
        (r.k, r.v) for r in scd2_as_of(h2, "2024-01-15").collect()
    }
    assert at_jan == {(1, "a"), (2, "b"), (3, "c")}
    at_feb = {
        (r.k, r.v) for r in scd2_as_of(h2, "2024-02-15").collect()
    }
    assert at_feb == {(1, "a"), (2, "B"), (4, "d")}
    # a third fold on top of closed history leaves closed rows alone
    h3 = scd2_apply(
        h2,
        spark.createDataFrame([(1, "a2")], "k long, v string"),
        ["k"], "2024-03-01",
    )
    assert h3.filter("k = 2 AND NOT is_current").count() == 1
    assert {
        (r.v, r.is_current) for r in h3.filter("k = 1").collect()
    } == {("a", False), ("a2", True)}


def test_queries_md_in_sync_with_registry():
    """QUERIES.md (the one-line-per-query registry index) must equal a
    fresh regeneration — catches a registry change that forgot
    `python scripts/gen_queries_md.py`."""
    import pathlib
    import sys

    root = pathlib.Path(__file__).parent.parent
    sys.path.insert(0, str(root / "scripts"))
    from gen_queries_md import render

    assert (root / "QUERIES.md").read_text() == render(), (
        "QUERIES.md is stale: run `python scripts/gen_queries_md.py`"
    )


def test_panel_rotation_deterministic_and_covering():
    """Round-12 (VERDICT r11 task 5): the driver-facing panel slice —
    pure in (round_n, size, registry): same round -> same panel;
    anchors always lead; any ceil(rest/slice) CONSECUTIVE rounds union
    to the FULL registry, so adopting rotation costs the driver zero
    bookkeeping."""
    import math

    import pytest

    import __spark_entry__ as e

    all_names = set(e.queries().keys())
    p12 = e.panel(12)
    assert p12 == e.panel(12)
    assert len(p12) == 50 == len(set(p12))
    assert set(p12) <= all_names
    n_anchor = len(e.PANEL_ANCHORS)
    assert p12[:n_anchor] == e.PANEL_ANCHORS
    assert set(e.PANEL_ANCHORS) <= all_names

    k = 50 - n_anchor
    rest = all_names - set(e.PANEL_ANCHORS)
    need = math.ceil(len(rest) / k)
    for start_round in (0, 5, 12):
        seen: set[str] = set()
        for r in range(start_round, start_round + need):
            pr = e.panel(r)
            assert pr[:n_anchor] == e.PANEL_ANCHORS
            seen |= set(pr)
        assert seen == all_names, (
            f"panel rotation from round {start_round} missed "
            f"{sorted(all_names - seen)[:5]}"
        )
    assert set(e.panel(1)) != set(e.panel(2))
    with pytest.raises(ValueError):
        e.panel(1, size=0)


def test_interval_overlap_join_matches_brute_force(spark):
    """Round-12: interval x interval overlap join — bin-exploded
    equi-join with canonical-bin dedup. Pinned against the O(n²)
    brute force on random intervals that deliberately span MANY bins
    (the case where a naive bin join emits duplicates), across bin
    sizes smaller than, comparable to, and larger than the spans."""
    import random

    from pyspark.sql import functions as F

    from etl_spark_spark.operators.ranges import interval_overlap_join

    rng = random.Random(7)
    lrows, rrows = [], []
    for i in range(80):
        k = rng.choice(["a", "b"])
        s = rng.randint(0, 1000)
        lrows.append((k, i, s, s + rng.randint(0, 400)))
    for j in range(80):
        k = rng.choice(["a", "b"])
        s = rng.randint(0, 1000)
        rrows.append((k, j, s, s + rng.randint(0, 400)))
    left = spark.createDataFrame(
        lrows, "k string, lid long, ls long, le long"
    )
    right = spark.createDataFrame(
        rrows, "k string, rid long, rs long, re long"
    )
    want = {
        (lk, lid, rid)
        for (lk, lid, ls, le) in lrows
        for (rk, rid, rs, re) in rrows
        if lk == rk and ls <= re and rs <= le
    }
    for bin_size in (50, 400, 5000):
        got = {
            (r["k"], r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, ["k"], "ls", "le", "rs", "re",
                bin_size=bin_size,
            ).collect()
        }
        assert got == want, f"bin_size={bin_size}"
    assert len(want) > 100  # non-vacuous


def test_privacy_k_anonymity_family(spark):
    """Round-12 privacy audit: classes (incl. NULL quasi values as a
    real class), l-diversity on a sensitive column, the summary
    gates, suppression yielding k-anonymity by construction, and the
    k/min_l validation guards."""
    import pytest as _pytest

    from etl_spark_spark.operators.privacy import (
        anonymity_classes,
        k_anonymity_summary,
        suppress_unsafe_classes,
    )

    rows = (
        [("z1", "a", "flu")] * 5
        + [("z1", "b", "flu"), ("z1", "b", "flu")]  # size-2 class, l=1
        + [("z2", "a", "covid"), ("z2", "a", "flu"), ("z2", "a", "ok")]
        + [(None, "a", "flu")] * 4  # NULL quasi: real class, size 4
    )
    df = spark.createDataFrame(rows, "zip string, sex string, dx string")
    cls = {
        (r["zip"], r["sex"]): (r["class_size"], r["l_diversity"])
        for r in anonymity_classes(df, ["zip", "sex"], "dx").collect()
    }
    assert cls[("z1", "a")] == (5, 1)
    assert cls[("z1", "b")] == (2, 1)
    assert cls[("z2", "a")] == (3, 3)
    assert cls[(None, "a")] == (4, 1)

    summ = k_anonymity_summary(
        anonymity_classes(df, ["zip", "sex"], "dx"), k=4, min_l=2
    ).collect()[0]
    # unsafe: z1/b (size 2), z2/a (l ok but size 3), z1/a (l=1),
    # NULL/a (l=1) -> all four classes trip either gate
    assert summ["n_classes"] == 4
    assert summ["n_unsafe_classes"] == 4
    assert summ["n_exposed_rows"] == 14
    assert summ["min_class_size"] == 2 and summ["min_l_diversity"] == 1

    released = suppress_unsafe_classes(df, ["zip", "sex"], k=4)
    after = k_anonymity_summary(
        anonymity_classes(released, ["zip", "sex"]), k=4
    ).collect()[0]
    assert after["n_unsafe_classes"] == 0
    assert after["min_class_size"] >= 4
    assert released.count() == 9  # 5 + 4 (NULL class kept: size 4 >= k)

    with _pytest.raises(ValueError, match="k must be positive"):
        k_anonymity_summary(anonymity_classes(df, ["zip"]), k=0)
    with _pytest.raises(ValueError, match="sensitive_col"):
        k_anonymity_summary(anonymity_classes(df, ["zip"]), k=2, min_l=2)
