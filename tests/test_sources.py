"""Source operators: multi-file scans, date-range enumeration and the
pushdown-friendly range rewrite."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark_spark.sources import (
    date_range_paths,
    read_date_range,
    source,
    table,
    year_range_filter,
)


def test_multi_file_scan(spark, sf_dir):
    """S1: an explicit list of files scans as one DataFrame."""
    p = f"{sf_dir}/region.parquet"
    single = source(spark, p).count()
    double = source(spark, [p, p]).count()
    assert double == 2 * single > 0


def test_explicit_schema_prunes(spark, sf_dir):
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_quantity", T.DoubleType()),
        ]
    )
    df = table(spark, sf_dir, "lineitem", schema=schema)
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() > 0


def test_date_range_paths_enumeration():
    paths = list(
        date_range_paths(
            "gs://b/feed/{d:%Y/%m/%d}.parquet",
            dt.date(2024, 2, 27),
            dt.date(2024, 3, 2),
        )
    )
    assert paths == [
        "gs://b/feed/2024/02/27.parquet",
        "gs://b/feed/2024/02/28.parquet",
        "gs://b/feed/2024/02/29.parquet",
        "gs://b/feed/2024/03/01.parquet",
        "gs://b/feed/2024/03/02.parquet",
    ]


def test_read_date_range_inclusive(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    got = read_date_range(
        orders, "o_orderdate", dt.date(1995, 3, 1), dt.date(1995, 3, 31)
    )
    n_manual = orders.filter(
        (F.col("o_orderdate") >= "1995-03-01")
        & (F.col("o_orderdate") < "1995-04-01")
    ).count()
    assert got.count() == n_manual > 0


def test_year_range_filter_equals_year_extract(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    assert (
        year_range_filter(orders, "o_orderdate", 1997).count()
        == orders.filter(F.year("o_orderdate") == 1997).count()
        > 0
    )


def test_read_csv_schema_and_corrupt_policy(spark, tmp_path):
    from etl_spark_spark.sources import read_csv

    p = tmp_path / "in.csv"
    p.write_text("k,v\n1,a\n2,b\nnot_an_int,c\n")
    df = read_csv(
        spark,
        str(p),
        "k long, v string, _bad string",
        corrupt_col="_bad",
    )
    rows = {r.k: (r.v, r._bad) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", None)
    # malformed row: typed cols NULL, original line quarantined
    assert rows[None][1] == "not_an_int,c"
    import pytest

    with pytest.raises(Exception):
        read_csv(spark, str(p), "k long, v string", mode="FAILFAST").collect()


def test_read_jsonl_schema_projection(spark, tmp_path):
    from etl_spark_spark.sources import read_jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": 1, "v": "a", "extra": true}\n'
        '{"k": 2}\n'
        "this is not json\n"
    )
    df = read_jsonl(spark, str(p), "k long, v string, _bad string", corrupt_col="_bad")
    rows = {r.k: (r.v, r._bad) for r in df.collect()}
    assert rows[1] == ("a", None)     # unknown field ignored
    assert rows[2] == (None, None)    # missing field -> NULL
    assert rows[None][1].startswith("this is not")


def test_read_evolved_merges_schema_versions(spark, tmp_path):
    """Two directories written at different schema versions read back
    as one table: old files surface the added column as NULL, and the
    target-schema contract fixes order, types, and drops strays."""
    from pyspark.sql import types as T

    from etl_spark_spark.sources import read_evolved

    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v2 = spark.createDataFrame(
        [(3, "c", 1.5, "x")], "id long, name string, score double, extra string"
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)

    merged = read_evolved(spark, [p1, p2])
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 1.5

    contract = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("added_later", T.IntegerType()),
        ]
    )
    shaped = read_evolved(spark, [p1, p2], target_schema=contract)
    assert shaped.columns == ["id", "name", "score", "added_later"]
    assert shaped.schema["added_later"].dataType.simpleString() == "int"
    assert all(r["added_later"] is None for r in shaped.collect())
    assert "extra" not in shaped.columns
