"""CSV / JSON-lines sources.

Schema is REQUIRED, not inferred: inference reads the data once before
the real scan — at 100 TB that is a full extra pass (and a silently
nondeterministic one when files disagree). Malformed rows follow an
explicit policy instead of vanishing: PERMISSIVE routes them to a
``_corrupt_record`` column the caller can quarantine, FAILFAST aborts.

CSV/JSONL are ingestion formats here, not analytics formats — the
expected pipeline is read -> validate -> write parquet (columnar,
statistics, pushdown) via ``sinks.write``; nothing downstream should
scan CSV twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """CSV scan with an explicit schema and malformed-row policy.
    ``mode``: PERMISSIVE (bad rows -> nulls, original line in
    ``corrupt_col`` when given), DROPMALFORMED, or FAILFAST."""
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
    )
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.load(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan (one object per line) with explicit schema and
    malformed-row policy. Missing fields are NULL; unknown fields are
    ignored (schema projection happens at parse time, so only declared
    fields are even materialized)."""
    reader = spark.read.format("json").schema(schema).option("mode", mode)
    if corrupt_col:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.load(path)
