"""Pluggable lakehouse MERGE backend (sinks/catalog.py).

The container has no Delta/Iceberg jars, so the capability probes must
select the versioned-parquet fallback — and the delta/iceberg paths are
covered by (a) golden-string tests of the generated MERGE INTO SQL
(pure function, no jars needed) and (b) a jar-gated end-to-end test
that auto-skips here and runs wherever the jars exist.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_spark_spark.sinks.catalog import (
    DELTA,
    ICEBERG,
    VERSIONED,
    build_merge_sql,
    delta_available,
    detect_backend,
    iceberg_available,
    merge_into,
    read_merged,
)


def test_detect_backend_falls_back_without_jars(spark):
    # this container ships no catalog jars: auto-detect must land on
    # the dependency-free snapshot store, never error
    assert detect_backend(spark) == VERSIONED
    assert detect_backend(spark, prefer=VERSIONED) == VERSIONED


def test_prefer_missing_backend_raises_not_downgrades(spark):
    # silent downgrade from a requested catalog to full-table COW
    # would be an operational surprise — it must raise instead
    if not delta_available(spark):
        with pytest.raises(RuntimeError, match="delta"):
            detect_backend(spark, prefer=DELTA)
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg"):
            detect_backend(spark, prefer=ICEBERG)
    with pytest.raises(ValueError):
        detect_backend(spark, prefer="hive")


def test_build_merge_sql_update_insert():
    sql = build_merge_sql(
        "lake.orders", "src_v", ["etiqueta"], ["etiqueta", "qty", "price"]
    )
    assert sql == (
        "MERGE INTO lake.orders t\n"
        "USING src_v s\n"
        "ON t.`etiqueta` = s.`etiqueta`\n"
        "WHEN MATCHED THEN UPDATE SET t.`etiqueta` = s.`etiqueta`, "
        "t.`qty` = s.`qty`, t.`price` = s.`price`\n"
        "WHEN NOT MATCHED THEN INSERT (`etiqueta`, `qty`, `price`) "
        "VALUES (s.`etiqueta`, s.`qty`, s.`price`)"
    )


def test_build_merge_sql_delete_only_and_compound_key():
    sql = build_merge_sql(
        "t1",
        "s1",
        ["k1", "k2"],
        ["k1", "k2", "v"],
        when_matched="delete",
        insert_unmatched=False,
    )
    assert sql == (
        "MERGE INTO t1 t\nUSING s1 s\n"
        "ON t.`k1` = s.`k1` AND t.`k2` = s.`k2`\n"
        "WHEN MATCHED THEN DELETE"
    )
    assert "INSERT" not in sql


def test_build_merge_sql_validation():
    with pytest.raises(ValueError, match="when_matched"):
        build_merge_sql("t", "s", ["k"], ["k", "v"], when_matched="upsert")
    with pytest.raises(ValueError, match="key"):
        build_merge_sql("t", "s", [], ["v"])
    with pytest.raises(ValueError, match="not in source"):
        build_merge_sql("t", "s", ["k"], ["v"])


def test_merge_into_adapter_versioned_semantics(spark, tmp_path):
    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    )
    used = merge_into(spark, base, target, ["k"])
    assert used == VERSIONED
    src = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k int, name string, v int"
    )
    used = merge_into(spark, src, target, ["k"])
    assert used == VERSIONED
    got = {
        r["k"]: (r["name"], r["v"])
        for r in read_merged(spark, target).collect()
    }
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}

    # delete-matched, no inserts
    gone = spark.createDataFrame([(1, "x", 0)], "k int, name string, v int")
    merge_into(
        spark, gone, target, ["k"], when_matched="delete",
        insert_unmatched=False,
    )
    assert sorted(
        r["k"] for r in read_merged(spark, target).collect()
    ) == [2, 3, 4]


def _parse_plan(spark, sql: str):
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_generated_merge_parses_to_merge_into_table(spark):
    """SQL-conformance evidence for the catalog backends, vendored for
    a container without jars (the fetch was attempted: no network, no
    local ivy/delta jars — see BASELINE.md round-8): Spark's OWN parser
    turns every build_merge_sql variant into a MergeIntoTable logical
    plan with exactly the intended clause structure. Delta and Iceberg
    both consume this parse tree — the jars replace execution, not the
    grammar — so a green parse + analyzer-boundary test (below) is the
    strongest in-container proof the generated text is what a real
    catalog would run."""
    up = _parse_plan(
        spark, build_merge_sql("tgt", "src", ["k1", "k2"], ["k1", "k2", "v"])
    )
    assert up.getClass().getSimpleName() == "MergeIntoTable"
    assert up.matchedActions().size() == 1
    m0 = up.matchedActions().apply(0)
    assert m0.getClass().getSimpleName() == "UpdateAction"
    # whole-row replace: one assignment per source column
    assert m0.assignments().size() == 3
    assert up.notMatchedActions().size() == 1
    assert (
        up.notMatchedActions().apply(0).getClass().getSimpleName()
        == "InsertAction"
    )

    dl = _parse_plan(
        spark,
        build_merge_sql(
            "tgt", "src", ["k"], ["k", "v"],
            when_matched="delete", insert_unmatched=False,
        ),
    )
    assert dl.getClass().getSimpleName() == "MergeIntoTable"
    assert (
        dl.matchedActions().apply(0).getClass().getSimpleName()
        == "DeleteAction"
    )
    assert dl.notMatchedActions().size() == 0


def test_generated_merge_reaches_row_level_capability_boundary(spark):
    """Run the generated MERGE INTO for real against a genuine catalog
    table: parsing AND analysis (table resolution, column resolution,
    assignment typing) succeed, and execution stops at exactly the
    point the catalog jars would take over — the v1 parquet table's
    lack of row-level operations (UNSUPPORTED_FEATURE.TABLE_OPERATION).
    Any defect in the generated text (bad quoting, misnamed column,
    malformed clause) would surface as a ParseException or
    AnalysisException BEFORE this error, so this pins the full
    statement as executable-modulo-backend."""
    tbl = "t_merge_conformance"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    spark.createDataFrame([(1, 10)], "k int, v int").write.mode(
        "overwrite"
    ).saveAsTable(tbl)
    spark.createDataFrame([(2, 20)], "k int, v int").createOrReplaceTempView(
        "src_conformance"
    )
    sql = build_merge_sql(tbl, "src_conformance", ["k"], ["k", "v"])
    try:
        with pytest.raises(Exception) as exc:
            spark.sql(sql)
        msg = str(exc.value)
        assert "MERGE INTO TABLE" in msg
        assert "UNSUPPORTED_FEATURE.TABLE_OPERATION" in msg
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.catalog.dropTempView("src_conformance")


def test_merge_into_delta_backend_when_jars_present(spark, tmp_path):
    """End-to-end catalog MERGE — runs only where Delta jars exist."""
    if not delta_available(spark):
        pytest.skip("Delta Lake jars/extension not on this session")
    tbl = "t_catalog_merge_delta"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    base = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    assert merge_into(spark, base, tbl, ["k"], backend=DELTA) == DELTA
    src = spark.createDataFrame([(2, 200), (3, 30)], "k int, v int")
    assert merge_into(spark, src, tbl, ["k"], backend=DELTA) == DELTA
    got = {r["k"]: r["v"] for r in read_merged(spark, tbl, backend=DELTA).collect()}
    assert got == {1: 10, 2: 200, 3: 30}
