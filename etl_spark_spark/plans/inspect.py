"""Physical-plan inspection helpers.

Used by perf tests to *assert* plan shape, not guess: filters reached the
parquet scan (PushedFilters), the scan reads only projected columns
(ReadSchema), broadcast joins stayed broadcast. At 100 TB these are the
difference between minutes and days, so we pin them in tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested in ()/[] — filter reprs like
    ``In(col, [a,b])`` contain commas of their own."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the physical plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(_split_top_level(m.group(1)))
    return out


def scan_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets each scan actually reads (ReadSchema), one per scan."""
    text = explain_str(df)
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        fields = m.group(1)
        cols.append(
            {f.split(":")[0].strip() for f in fields.split(",") if f.strip()}
        )
    return cols
