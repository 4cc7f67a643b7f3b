"""Oracle-differential tests: every queries() entry must match its
oracle_sql() on the same fixture tables — the same gate the driver runs
at sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .oracle_utils import assert_oracle_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle(name, spark, sf_dir):
    assert_oracle_match(spark, sf_dir, QUERIES[name], ORACLES[name])


def test_no_rows_only_queries_remain():
    """Every registered query currently carries a full SQL oracle —
    this pins that state explicitly (the old parametrized rows-only
    fallback showed up as an unexplained pytest skip when its
    parameter set was empty). If a genuinely non-SQL-expressible
    query is ever added, replace this with a parametrized
    run-and-schema check over the difference set."""
    assert set(QUERIES) == set(ORACLES), (
        f"queries without an oracle: {sorted(set(QUERIES) - set(ORACLES))}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
