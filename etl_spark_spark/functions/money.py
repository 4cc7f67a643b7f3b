"""Order-independent money aggregation.

Floating-point summation is order-dependent; on a cluster the reduction
order varies run to run (and differs from any single-threaded oracle). For
money-like measures we make sums exactly reproducible by summing in integer
fixed-point: round each row to cents (deterministic per-row double op),
sum as 64-bit integers (associative — any partial-aggregate/shuffle order
gives the same bits), and scale back once at the end.

This is both a correctness tool (bit-identical vs the DuckDB oracle) and a
scale tool (partial aggregation stays a plain LongType hash aggregate).
A 100 TB sum of cents fits comfortably in int64 (~9.2e18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(c: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a money-like double column."""
    col = F.col(c) if isinstance(c, str) else c
    factor = 10**scale
    return F.sum(F.round(col * factor).cast("long")) / F.lit(float(factor))


def money_sum_sql(expr: str, scale: int = 2) -> str:
    """The ANSI-SQL equivalent (for DuckDB oracles / SQL front-ends)."""
    factor = 10**scale
    return f"sum(cast(round(({expr}) * {factor}) as bigint)) / {factor}.0"
