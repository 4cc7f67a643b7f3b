"""Local mirror of the driver's oracle-differential compare:
run the Spark query and the DuckDB oracle SQL on the same parquet tables,
then compare row-count + schema (column names) + order-insensitive values.
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # canonical row order: sort by every column (stringified for mixed/NULL)
    if len(df):
        key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
        df = df.iloc[key.argsort(kind="mergesort").values]
    return df.reset_index(drop=True)


def assert_oracle_match(spark, sf_dir: str, query_fn, sql: str) -> None:
    got = normalize(query_fn(spark, sf_dir).toPandas())
    con = duckdb_conn(sf_dir)
    try:
        want = normalize(con.execute(sql).fetchdf())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"rowcount mismatch: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, check_datetimelike_compat=True
    )
    # representation check: a stringifying value-hash must also agree —
    # catches dtype drift like DuckDB HUGEINT->float64 ("3.0") vs Spark
    # long ("3") that numeric comparison tolerates
    mism = (got.astype(str).values != want.astype(str).values)
    if mism.any():
        import numpy as np

        r, c = map(int, np.argwhere(mism)[0])
        raise AssertionError(
            "stringified mismatch at "
            f"row {r} col {got.columns[c]}: "
            f"spark={got.iat[r, c]!r} oracle={want.iat[r, c]!r}"
        )
