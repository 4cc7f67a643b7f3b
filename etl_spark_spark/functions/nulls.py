"""Null handling and schema-driven transforms.

The reference's schema-reflection pattern (SURVEY.md §1): transforms
parameterized over ``df.schema`` instead of hard-coded column lists —
cast every Decimal to Double (reference etl_job.py:15-25) and null-fill
every Float/Double column (reference utils_ressarcimento.py:272-278).
Kept as configurable policies here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def coalesce_zero(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col, F.lit(0))


def cast_decimals(
    df: DataFrame,
    to: T.DataType | None = None,
    timestamp_ntz: bool = False,
) -> DataFrame:
    """Cast every DecimalType column to ``to`` (default DoubleType).

    Precision-loss is a deliberate, configurable policy (the reference
    always casts money to double at the sink boundary, etl_job.py:15-25);
    pass ``to=DecimalType(38, 6)`` etc. to keep exact decimals instead.
    """
    to = to or T.DoubleType()
    casts: dict[str, Column] = {}
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            casts[f.name] = F.col(f.name).cast(to)
        elif timestamp_ntz and isinstance(f.dataType, T.TimestampType):
            casts[f.name] = F.col(f.name).cast(T.TimestampNTZType())
    return df.withColumns(casts) if casts else df


def fill_nulls_by_type(
    df: DataFrame,
    types: tuple[type, ...] = (T.DoubleType, T.FloatType),
    value: float = 0.0,
) -> DataFrame:
    """Null-fill every column whose type is in ``types``."""
    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, types)]
    return df.na.fill(value, subset=cols) if cols else df
