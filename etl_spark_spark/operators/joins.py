"""Join helpers.

The reference's join surface (SURVEY.md §2.3) is all equi-joins: inner,
left, left-anti, USING-style name joins, SQL-string conditions
(``F.expr``), and one explicit broadcast hint (etl_job.py:36). Spark's
DataFrame API already covers every one of these; what the engine adds is
the broadcast policy helper and string-predicate support.

Scale guidance encoded here:
- Broadcast every bounded dimension (``broadcast_join``): turns a
  sort-merge shuffle of the 100 TB fact into a map-side hash join.
- For fact-fact joins, let AQE pick; pre-bucket both sides on the join
  key at write time when the join recurs (see sinks.write bucketing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_expr(
    left: DataFrame,
    right: DataFrame,
    condition: str | Column | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join with a condition given as a SQL string (``'a.x = b.y'``),
    a Column, or a USING column list (reference utils_ressarcimento.py:60
    uses the string form)."""
    if isinstance(condition, str):
        cond: Column | list[str] = F.expr(condition)
    elif isinstance(condition, Column):
        cond = condition
    else:
        cond = list(condition)
    return left.join(right, cond, how)


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    condition: str | Column | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the (small) ``dim`` side broadcast — map-side hash
    join, no shuffle of ``fact`` (reference hints the same at
    etl_job.py:36, though it broadcasts the fact; broadcasting the
    bounded dimension is the choice that survives a 100x fact scale-up).

    CONTRACT: ``dim`` must be bounded-cardinality BY CONSTRUCTION —
    enum-like dimensions (nation, region, calendars, config tables)
    whose size does not grow with the fact data. For a dimension that
    scales with the corpus (customer, supplier, part at TPC-H SF),
    use a plain ``join_expr`` and let AQE pick broadcast only while
    the side is actually under the threshold (round-11 broadcast
    audit, PLANS.md)."""
    return join_expr(fact, F.broadcast(dim), condition, how)
